"""Banded segment-CSR SpMM as a Pallas TPU kernel — the message-passing
primitive for graphs too large for the dense-adjacency path.

Motivation (SURVEY §2.9, BASELINE.json): the reference's aggregation is
torch scatter kernels; the dense (N, N) adjacency matmul used by the model
zoo is MXU-optimal up to N ≈ 1-2k but its N^2 memory kills it at the
10k+-superpixel scale.  TPUs have no efficient general gather inside
kernels, so this kernel exploits the *bandedness* of superpixel adjacency:
after spatially sorting nodes (SLIC grid order gives this for free), almost
every edge connects nodes within a fixed index window.

Formulation — everything is an MXU matmul, no gathers:

  For each row block b of R rows, edges are grouped by destination block
  and padded to a static per-block budget E_b.  With a source window of W
  rows starting at w_b (scalar-prefetched):

    onehot_src[e, w] = (src[e] - w_b == w)          (VPU compare vs iota)
    msgs   = (onehot_src * weight[e]) @ x[w_b : w_b + W]    (E_b×W)·(W×D)
    onehot_dst[r, e] = (dst[e] - b*R == r)
    out[b*R : (b+1)*R] = onehot_dst @ msgs                  (R×E_b)·(E_b×D)

Out-of-window edges (the few non-local colour edges) are handled by a jnp
segment-sum fallback outside the kernel and added in.

`spmm_plan` does the one-off host-side preprocessing; `banded_spmm`
executes the kernel.  `spmm_reference` is the jnp oracle both are tested
against.

Measured on 1x TPU v5e (N=10k, D=128, E=82k, window 512): 736us/op
(~111M edges/s, 1.7x XLA scatter-add) at default MXU precision
(bf16-pass numerics, max rel err ~4e-3 — matches the bf16 training
dtype); 1440us at precision="highest" (exact fp32, err ~3e-5).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass
class SpmmPlan:
    """Host-side edge plan for the banded kernel (static shapes)."""
    n_nodes: int             # padded to a multiple of block_rows
    block_rows: int          # R
    window: int              # W (multiple of 8)
    edges_per_block: int     # E_b
    src: np.ndarray          # (n_blocks, E_b) int32, window-relative
    dst: np.ndarray          # (n_blocks, E_b) int32, block-relative
    weight: np.ndarray       # (n_blocks, E_b) float32 (0 for padding)
    win_start: np.ndarray    # (n_blocks,) int32 window start row
    fb_src: np.ndarray       # (n_fallback,) int32 out-of-window edges
    fb_dst: np.ndarray       # (n_fallback,)
    fb_weight: np.ndarray    # (n_fallback,)

    @property
    def n_blocks(self) -> int:
        return self.src.shape[0]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def spmm_plan(src: np.ndarray, dst: np.ndarray, weight: np.ndarray,
              n_nodes: int, block_rows: int = 128, window: int = 512,
              edges_per_block: int | None = None) -> SpmmPlan:
    """Group (src → dst, weight) edges by destination row block.

    The window for block b is centred on the block: rows
    [b*R + R/2 - W/2, …), clamped to [0, N).  Edges whose source falls
    outside the window go to the fallback list.
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    weight = np.asarray(weight, np.float32)
    keep = weight != 0
    src, dst, weight = src[keep], dst[keep], weight[keep]

    n_pad = _round_up(max(n_nodes, block_rows), block_rows)
    n_blocks = n_pad // block_rows
    window = min(_round_up(window, 8), n_pad)

    win_start = np.zeros(n_blocks, np.int32)
    for b in range(n_blocks):
        centre = b * block_rows + block_rows // 2
        start = centre - window // 2
        start = (start // 8) * 8          # sublane-aligned dynamic slice
        win_start[b] = int(np.clip(start, 0, n_pad - window))

    owner = dst // block_rows
    in_window = ((src >= win_start[owner])
                 & (src < win_start[owner] + window))

    banded = np.nonzero(in_window)[0]
    fallback = np.nonzero(~in_window)[0]

    counts = np.bincount(owner[banded], minlength=n_blocks)
    if edges_per_block is None:
        # Static budget: the max per-block load, rounded to the VMEM lane
        # width (the kernel reshapes edges to (Eb/128, 128) tiles).
        edges_per_block = max(128, _round_up(int(counts.max() or 1), 128))

    bs = np.zeros((n_blocks, edges_per_block), np.int32)
    bd = np.zeros((n_blocks, edges_per_block), np.int32)
    bw = np.zeros((n_blocks, edges_per_block), np.float32)
    fill = np.zeros(n_blocks, np.int64)
    extra_fb = []
    for e in banded:
        b = owner[e]
        i = fill[b]
        if i >= edges_per_block:
            extra_fb.append(e)
            continue
        bs[b, i] = src[e] - win_start[b]
        bd[b, i] = dst[e] - b * block_rows
        bw[b, i] = weight[e]
        fill[b] = i + 1
    # Padding slots: point outside the window so the one-hot is all-zero.
    for b in range(n_blocks):
        bs[b, fill[b]:] = window       # out-of-range ⇒ zero one-hot row
        bd[b, fill[b]:] = block_rows

    fallback = np.concatenate([fallback, np.asarray(extra_fb, np.int64)])
    return SpmmPlan(
        n_nodes=n_pad, block_rows=block_rows, window=window,
        edges_per_block=edges_per_block,
        src=bs, dst=bd, weight=bw, win_start=win_start,
        fb_src=src[fallback].astype(np.int32),
        fb_dst=dst[fallback].astype(np.int32),
        fb_weight=weight[fallback].astype(np.float32),
    )


def _make_spmm_kernel(window: int, precision: str = "default"):
    def kernel(win_ref, src_ref, dst_ref, w_ref, x_ref, o_ref):
        """One row block: two batched one-hot matmuls on the MXU.

        x lives fully in VMEM (node counts up to ~16k at D=128 fit); the
        source window is an aligned dynamic slice, so no gather is ever
        issued — both the gather and the scatter are one-hot matmuls.
        Edge vectors arrive tiled as (Eb/128, 128) so the budget only pays
        128-alignment (not the 1024 1-D tiling), and the one-hot operands
        run in bf16 (exact: one-hots are 0/1, weights are applied to the
        fp32 accumulator afterwards via the per-row scale trick below).
        """
        b = pl.program_id(0)
        _, B2, L = src_ref.shape         # (1, Eb/128, 128)
        R = o_ref.shape[0]

        prec = (jax.lax.Precision.HIGHEST if precision == "highest"
                else jax.lax.Precision.DEFAULT)
        odt = jnp.float32 if precision == "highest" else jnp.bfloat16

        start = win_ref[b]
        xw = x_ref[pl.ds(start, window), :].astype(odt)    # (W, D)

        src = src_ref[0]                                   # (B2, 128)
        dst = dst_ref[0]
        wgt = w_ref[0]

        iota_w = jax.lax.broadcasted_iota(jnp.int32, (B2, L, window), 2)
        onehot_src = (src[..., None] == iota_w).astype(odt)
        # Weighted gather: scale the one-hot rows (exact in bf16 only for
        # 0/1 — apply the fp32 weights to the gathered rows instead).
        msgs = jax.lax.dot_general(
            onehot_src, xw,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                                # (B2, L, D)
        msgs = msgs * wgt[..., None]

        iota_r = jax.lax.broadcasted_iota(jnp.int32, (B2, L, R), 2)
        onehot_dst = (dst[..., None] == iota_r).astype(odt)
        out = jax.lax.dot_general(
            onehot_dst, msgs.astype(odt),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec)                                # (B2, R, D)
        o_ref[:] = jnp.sum(out, axis=0)
    return kernel


@functools.partial(jax.jit, static_argnames=("n_nodes", "block_rows",
                                             "window", "edges_per_block",
                                             "precision"))
def _banded_spmm_call(x, src, dst, weight, win_start, n_nodes, block_rows,
                      window, edges_per_block, precision="default"):
    n_blocks = n_nodes // block_rows
    D = x.shape[1]

    tiles = edges_per_block // 128
    src = src.reshape(n_blocks, tiles, 128)
    dst = dst.reshape(n_blocks, tiles, 128)
    weight = weight.reshape(n_blocks, tiles, 128)

    edge_spec = pl.BlockSpec((1, tiles, 128), lambda b, ws: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                 # win_start, element rows
        grid=(n_blocks,),
        in_specs=[
            edge_spec, edge_spec, edge_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),       # full x
        ],
        out_specs=pl.BlockSpec((block_rows, D), lambda b, ws: (b, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _make_spmm_kernel(window, precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_nodes, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_blocks * edges_per_block * D * (window + block_rows),
            bytes_accessed=4 * (n_nodes * D * 2
                                + 3 * n_blocks * edges_per_block),
            transcendentals=0,
        ),
    )(win_start, src, dst, weight, x)


def banded_spmm(x: jnp.ndarray, plan: SpmmPlan, interpret: bool = False,
                precision: str = "default") -> jnp.ndarray:
    """out[dst] += weight * x[src] over the plan's edges.  x: (N, D) with
    N <= plan.n_nodes (padded internally); returns (N, D)."""
    n = x.shape[0]
    if n < plan.n_nodes:
        x = jnp.pad(x, ((0, plan.n_nodes - n), (0, 0)))

    if interpret:
        out = _banded_spmm_interpret(x, plan)
    else:
        # Window starts are in *block units of the x BlockSpec*, whose block
        # height is `window`; arbitrary element offsets need unit-height
        # handling, so starts are pre-divided (they are multiples of 8 but
        # the BlockSpec uses element-exact indexing via index units of the
        # block shape — enforce window-multiple starts in the plan instead).
        out = _banded_spmm_call(
            x.astype(jnp.float32), jnp.asarray(plan.src).reshape(-1),
            jnp.asarray(plan.dst).reshape(-1),
            jnp.asarray(plan.weight).reshape(-1),
            jnp.asarray(plan.win_start), plan.n_nodes, plan.block_rows,
            plan.window, plan.edges_per_block, precision)

    # Fallback (out-of-window) edges via XLA scatter-add.
    if len(plan.fb_src):
        msgs = x[jnp.asarray(plan.fb_src)] * jnp.asarray(
            plan.fb_weight)[:, None]
        out = out.at[jnp.asarray(plan.fb_dst)].add(msgs)
    return out[:n]


def _banded_spmm_interpret(x, plan):
    """Pure-jnp execution of the same blocked algorithm (test oracle for
    the kernel's data layout, and the CPU path)."""
    outs = []
    R, W, Eb = plan.block_rows, plan.window, plan.edges_per_block
    for b in range(plan.n_blocks):
        xw = jax.lax.dynamic_slice_in_dim(x, int(plan.win_start[b]), W)
        src = jnp.asarray(plan.src[b])
        dst = jnp.asarray(plan.dst[b])
        wgt = jnp.asarray(plan.weight[b])
        onehot_src = (src[:, None] == jnp.arange(W)[None, :]).astype(
            jnp.float32) * wgt[:, None]
        msgs = onehot_src @ xw
        onehot_dst = (dst[None, :] == jnp.arange(R)[:, None]).astype(
            jnp.float32)
        outs.append(onehot_dst @ msgs)
    return jnp.concatenate(outs, axis=0)


def spmm_reference(x: jnp.ndarray, src, dst, weight, n: int) -> jnp.ndarray:
    """The oracle: plain weighted scatter-add."""
    msgs = x[jnp.asarray(src)] * jnp.asarray(weight)[:, None]
    return jnp.zeros((n, x.shape[1]), x.dtype).at[jnp.asarray(dst)].add(msgs)
