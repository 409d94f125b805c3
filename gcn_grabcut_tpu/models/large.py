"""Large-graph execution path: run the model zoo on a single 10k+-node
graph using the banded Pallas SpMM instead of a dense adjacency.

The dense (N, N) adjacency used by the default path costs N^2 memory —
fine for superpixel graphs (N ≤ ~1k), prohibitive at the 10k+-superpixel
high-resolution configuration (BASELINE.json configs[4]).  Here the GCN and
SAGE propagations are compiled into two `SpmmPlan`s:

* GCN: Â = D̂^-1/2 (A + I) D̂^-1/2 — the symmetric normalisation is folded
  into per-edge weights, and the self-loop term becomes N extra diagonal
  edges with weight 1/d̂_i (exactly PyG semantics at plan level).
* mean: per-edge weight 1/deg(dst), no self loops.

Because SLIC numbers superpixels in grid scan order, spatial adjacency is
index-banded and almost every edge lands in the Pallas kernel's window.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp

from ..core.graph import GraphBatch
from ..ops.sddmm import GatPlan, gat_plan_device
from ..ops.spmm import SpmmPlan, spmm_plan, spmm_plan_device, banded_spmm


def build_gat_plan_device(edge_src, edge_dst, edge_attr, edge_mask,
                          n_nodes: int, window: int = 512,
                          check_overflow: bool = True) -> GatPlan:
    """GatPlan for one graph's directed edge list (ops/sddmm.py), built on
    device.  Fallback capacity: with the default edge budget
    2·(adjacency + K·n_nonlocal) (graph_build.edge_budget_for) the
    out-of-window population is at most the non-local half plus a handful
    of boundary-irregular adjacency edges — E//2 + 4096 covers it.

    That sizing is an ASSUMPTION about the graph (SLIC scan-order labels,
    default non-local budget); a user-built graph can violate it, and edges
    past the capacity are dropped from the attention softmax — silently
    wrong logits.  So by default the plan's ``fb_overflow`` counter is
    checked here, once per plan build (a single ~30 ms scalar pull over the
    tunnel, amortised across every forward that reuses the plan), and an
    overflowing plan is rebuilt at exact capacity ``fb_capacity=E`` with a
    warning — matching the reference's guard-loudly culture on degenerate
    inputs (/root/reference/src/gcn_grabcut/grabcut.py:127-140).
    ``check_overflow=False`` skips the pull for callers that assert the
    structure themselves (tests read the counter directly)."""
    e_budget = int(edge_src.shape[-1])
    plan = gat_plan_device(edge_src, edge_dst, edge_attr, edge_mask,
                           n_nodes, window=window,
                           fb_capacity=min(e_budget, e_budget // 2 + 4096))
    if check_overflow and int(plan.fb_overflow[0]) > 0:
        import warnings
        warnings.warn(
            f"banded-GAT plan dropped {int(plan.fb_overflow[0])} "
            "out-of-window edges at the default fallback capacity "
            "(non-SLIC-banded graph structure?); rebuilding with exact "
            "capacity — pass a larger `window` to keep the fallback "
            "phase small.", RuntimeWarning, stacklevel=2)
        plan = gat_plan_device(edge_src, edge_dst, edge_attr, edge_mask,
                               n_nodes, window=window, fb_capacity=e_budget)
    return plan


def build_gcn_plans(edge_src: np.ndarray, edge_dst: np.ndarray,
                    edge_mask: np.ndarray, n_nodes: int,
                    block_rows: int = 128, window: int = 512
                    ) -> tuple[SpmmPlan, SpmmPlan]:
    """(gcn_plan, mean_plan) for one graph's directed edge list."""
    edge_src = np.asarray(edge_src, np.int64)
    edge_dst = np.asarray(edge_dst, np.int64)
    keep = np.asarray(edge_mask) > 0
    src, dst = edge_src[keep], edge_dst[keep]

    deg = np.bincount(dst, minlength=n_nodes).astype(np.float64)
    dhat = deg + 1.0
    dis = 1.0 / np.sqrt(dhat)

    # GCN: neighbour edges w = 1/sqrt(dhat_i dhat_j), self loops w = 1/dhat.
    loops = np.arange(n_nodes)
    g_src = np.concatenate([src, loops])
    g_dst = np.concatenate([dst, loops])
    g_w = np.concatenate([dis[src] * dis[dst], 1.0 / dhat]).astype(
        np.float32)
    gcn_plan = spmm_plan(g_src, g_dst, g_w, n_nodes,
                         block_rows=block_rows, window=window)

    m_w = (1.0 / np.maximum(deg, 1.0))[dst].astype(np.float32)
    mean_plan = spmm_plan(src, dst, m_w, n_nodes,
                          block_rows=block_rows, window=window)
    return gcn_plan, mean_plan


@functools.partial(jax.jit, static_argnames=("n_nodes",))
def _gcn_edge_weights_device(src, dst, mask, n_nodes):
    """GCN + mean per-edge weights from a masked device edge list.

    Degree via a dst-sorted segment-sum (sorted scatters compile fast on
    this backend, unsorted ones do not — see ops/spmm.py)."""
    src = jnp.clip(src.astype(jnp.int32), 0, n_nodes - 1)
    dst = jnp.clip(dst.astype(jnp.int32), 0, n_nodes - 1)
    m = mask.astype(jnp.float32)
    order = jnp.argsort(dst)
    deg = jax.ops.segment_sum(m[order], dst[order], num_segments=n_nodes,
                              indices_are_sorted=True)
    dhat = deg + 1.0
    dis = jax.lax.rsqrt(dhat)
    g_w = dis[src] * dis[dst] * m          # neighbour term
    loop_w = 1.0 / dhat                    # self-loop term
    m_w = (1.0 / jnp.maximum(deg, 1.0))[dst] * m
    return src, dst, g_w, loop_w, m_w


def build_gcn_plans_device(edge_src, edge_dst, edge_mask, n_nodes: int,
                           block_rows: int = 128, window: int = 512
                           ) -> tuple[SpmmPlan, SpmmPlan]:
    """`build_gcn_plans` computed entirely on device: no edge-list pull and
    no band upload (ops/spmm.py `spmm_plan_device`).  Masked edges carry
    weight 0 instead of being filtered (static shapes)."""
    src, dst, g_w, loop_w, m_w = _gcn_edge_weights_device(
        jnp.asarray(edge_src), jnp.asarray(edge_dst),
        jnp.asarray(edge_mask), n_nodes)
    loops = jnp.arange(n_nodes, dtype=jnp.int32)
    gcn_plan = spmm_plan_device(
        jnp.concatenate([src, loops]), jnp.concatenate([dst, loops]),
        jnp.concatenate([g_w, loop_w]), n_nodes,
        block_rows=block_rows, window=window)
    mean_plan = spmm_plan_device(src, dst, m_w, n_nodes,
                                 block_rows=block_rows, window=window)
    return gcn_plan, mean_plan


def spmm_aggregators(gcn_plan: SpmmPlan, mean_plan: SpmmPlan,
                     interpret: bool = False):
    """(gcn_propagate, mean_propagate) callables over (1, N, D) batches."""
    def wrap(plan):
        def agg(h):
            # h: (1, N, D) — the kernel works on one graph.
            out = banded_spmm(h[0].astype(jnp.float32), plan,
                              interpret=interpret)
            return out[None].astype(h.dtype)
        return agg
    return wrap(gcn_plan), wrap(mean_plan)


@functools.partial(jax.jit, static_argnames=("model", "precision"))
def _apply_large_gat_jit(model, variables, g, gat_plan, precision):
    """One cached jit for the banded-attention GAT forward (ops/sddmm.py)."""
    return model.apply(variables, g, train=False, gat_plan=gat_plan,
                       gat_precision=precision)


@functools.partial(jax.jit, static_argnames=("model", "interpret"))
def _apply_large_jit(model, variables, g, gcn_plan, mean_plan,
                     interpret: bool):
    """One cached jit for the whole SpMM-backed forward (SpmmPlan is a
    pytree; the flax module is hashable static).  Eager apply paid
    ~0.5-4 ms of tunnel dispatch per primitive — hundreds of primitives
    per forward."""
    aggs = spmm_aggregators(gcn_plan, mean_plan, interpret=interpret)
    return model.apply(variables, g, train=False, aggregators=aggs)


def apply_large(model, variables, g: GraphBatch, interpret: bool = False,
                window: int = 512, plans=None, precision: str = "default"):
    """Forward a single large graph (G=1) through `model` with SpMM
    aggregation.  Plans default to the on-device builder (the graph's edge
    arrays are already device-resident in the pipeline, and the alternative
    — pull the edge list, build the ~25-45 MB band on the host, upload it —
    costs more over the tunnel than the forward it feeds); pass
    `plans=(gcn_plan, mean_plan)` (from `build_gcn_plans` or
    `build_gcn_plans_device`) to amortise plan construction across repeated
    forwards on the same graph.

    `interpret` selects the Pallas interpreter on the SpMM branch (a debug
    mode); `precision` ("default" = bf16 window compute, "highest" = exact
    fp32) controls the banded-attention numerics on the GAT branch — the
    two are independent knobs."""
    assert g.n_graphs == 1, "large-graph path operates on one graph"
    n = g.max_nodes
    if getattr(model, "supports_banded_attention", False):
        # GATv2: attention weights are data-dependent, so the plan holds the
        # graph STRUCTURE (edge attrs in band slots, ops/sddmm.py); scores
        # and softmax are computed per forward, banded.
        if plans is None:
            plans = build_gat_plan_device(
                g.edge_src[0], g.edge_dst[0], g.edge_attr[0],
                g.edge_mask[0], n, window=window)
        return _apply_large_gat_jit(model, variables, g, plans, precision)
    if not getattr(model, "supports_spmm_aggregators", False):
        raise ValueError(
            f"{type(model).__name__} has no large-graph forward; the "
            "banded paths cover ResGCNNet, GCNTrimapNet (SpMM aggregators) "
            "and GATTrimapNet (banded SDDMM attention).")
    if plans is None:
        plans = build_gcn_plans_device(
            g.edge_src[0], g.edge_dst[0], g.edge_mask[0], n, window=window)
    return _apply_large_jit(model, variables, g, plans[0], plans[1],
                            interpret)
