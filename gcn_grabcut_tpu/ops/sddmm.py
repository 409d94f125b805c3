"""Banded SDDMM attention — GATv2 message passing for graphs too large for
the dense-adjacency path.

Motivation: the reference's GATv2 layer is PyG ``GATv2Conv`` over a COO edge
list (/root/reference/src/gcn_grabcut/model.py:323-414 via torch scatter
kernels).  Our edge-list formulation (models/layers.py GATv2Conv) is exact
but at 10k+ nodes every layer pays per-edge gathers and three segment
reductions — none of which touch the MXU.

Design — the attention analogue of ops/spmm.py's banded-dense SpMM:

  SLIC numbers superpixels in grid scan order, so spatial adjacency is
  *index-banded*.  The graph (edge list + edge attributes) is static across
  layers, so it is compiled ONCE into banded slot storage:

    attr_band[k, d, s] = edge attributes of (src = (d//R + o_k)·R + s → d)
    mask_band[k, d, s] = 1.0 where that slot holds a real edge

  Scores are then computed *densely over the window*: for each destination
  block, z = W_l x_src + W_r x_dst + W_e attr is a (R_dst, R_src, H·F)
  block tensor (built from static shifted views of x — no gathers), the
  LeakyReLU/att reduction gives per-slot scores, and the per-destination
  softmax is a masked reduction over the (k, s) slot axes.  The attention-
  weighted aggregation Σ α·x_src is a batched dense matmul per sub-block —
  MXU work, no scatters.

  Out-of-window edges (non-local colour-space k-NN) keep the edge-list
  formulation over a COMPACTED static-capacity list, and the two softmaxes
  are merged exactly via a shared per-destination peak (log-sum-exp merge),
  together with the dense self-loop term (PyG fill_value="mean" semantics,
  matching models/layers.py GATv2Conv).

Numerics match the edge-list oracle to fp32 tolerance (the softmax is
computed in fp32 regardless of ``dtype``); tests/test_sddmm.py asserts
equality against models/layers.py GATv2Conv on graphs with in-band,
out-of-band, masked and duplicate-free edges.

Note: like the edge-list path, slots hold each directed edge once — the
builder assumes a deduplicated edge list (graph_build guarantees this;
duplicate edges would accumulate their attributes into one slot instead of
occupying two softmax slots).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class GatPlan:
    """Compiled banded slot storage for one graph's attention structure.

    A pytree (array leaves + static layout ints), so it passes straight
    through ``jax.jit`` boundaries like ``ops.spmm.SpmmPlan``."""
    n_nodes: int = struct.field(pytree_node=False)    # padded to ÷block_rows
    block_rows: int = struct.field(pytree_node=False)  # R
    k_blocks: int = struct.field(pytree_node=False)   # K (window = K·R)
    attr_band: jnp.ndarray = None   # (K, Np, R, A) edge attrs per slot
    mask_band: jnp.ndarray = None   # (K, Np, R) 1.0 where a real edge sits
    fb_src: jnp.ndarray = None      # (FB,) int32 out-of-window edges,
    fb_dst: jnp.ndarray = None      # (FB,) dst-sorted
    fb_attr: jnp.ndarray = None     # (FB, A)
    fb_mask: jnp.ndarray = None     # (FB,)
    attr_mean: jnp.ndarray = None   # (A,) mean attrs of real edges (loop fill)
    fb_overflow: jnp.ndarray = None  # (1,) int32 fallback edges dropped

    @property
    def n_blocks(self) -> int:
        return self.n_nodes // self.block_rows

    @property
    def window(self) -> int:
        return self.k_blocks * self.block_rows


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("n_pad", "block_rows",
                                             "k_blocks", "fb_capacity"))
def _gat_plan_arrays(src, dst, attr, mask, n_pad, block_rows, k_blocks,
                     fb_capacity):
    """Device-side band build (one sorted scatter) + fallback compaction."""
    a_dim = attr.shape[-1]
    src = jnp.clip(src.astype(jnp.int32), 0, n_pad - 1)
    dst = jnp.clip(dst.astype(jnp.int32), 0, n_pad - 1)
    m = mask.astype(jnp.float32)
    attr = attr.astype(jnp.float32)

    off0 = -(k_blocks // 2)
    k = src // block_rows - dst // block_rows - off0
    in_w = (k >= 0) & (k < k_blocks) & (m > 0)

    idx = jnp.where(in_w, (k * n_pad + dst) * block_rows
                    + (src % block_rows), 0)
    w_in = jnp.where(in_w, 1.0, 0.0)
    # Sorted scatter: unsorted XLA scatter carries pathological compile
    # times on this backend (see ops/spmm.py).
    order = jnp.argsort(idx)
    idx_s = idx[order]
    flat = jnp.zeros((k_blocks * n_pad * block_rows, a_dim + 1), jnp.float32)
    payload = jnp.concatenate([attr * w_in[:, None], w_in[:, None]],
                              axis=-1)[order]
    flat = flat.at[idx_s].add(payload, indices_are_sorted=True)
    attr_band = flat[:, :a_dim].reshape(k_blocks, n_pad, block_rows, a_dim)
    mask_band = flat[:, a_dim].reshape(k_blocks, n_pad, block_rows)

    # Out-of-window real edges, compacted to static capacity, dst-sorted
    # (fallback-first, then by destination — a single stable key sort).
    is_fb = (m > 0) & ~in_w
    key = jnp.where(is_fb, dst, n_pad + 1 + dst)
    fb_order = jnp.argsort(key)[:fb_capacity]
    fb_mask = is_fb[fb_order].astype(jnp.float32)
    overflow = (jnp.sum(is_fb) - jnp.sum(fb_mask)).astype(jnp.int32)
    # Masked tail entries get dst = n_pad-1 so the compacted list stays
    # globally non-decreasing (the attention op's segment reductions use
    # indices_are_sorted=True).
    fb_dst = jnp.where(fb_mask > 0, dst[fb_order], n_pad - 1)

    tot = jnp.maximum(jnp.sum(m), 1.0)
    attr_mean = jnp.sum(attr * m[:, None], axis=0) / tot

    return (attr_band, mask_band, src[fb_order], fb_dst,
            attr[fb_order] * fb_mask[:, None], fb_mask, attr_mean,
            overflow[None])


def gat_plan_device(src, dst, attr, mask, n_nodes: int,
                    block_rows: int = 128, window: int = 512,
                    fb_capacity: int | None = None) -> GatPlan:
    """Compile a (src → dst, attr, mask) edge list into a :class:`GatPlan`,
    entirely on device (no host pull of the edge list).

    ``fb_capacity`` bounds the out-of-window list (static shape).  Edges
    beyond it are DROPPED — ``fb_overflow`` records how many, so callers /
    tests can assert 0.  The default capacity is the full edge-list length
    (always exact); pass the non-local budget (2·K·n_nonlocal + slack) to
    keep the fallback phase small when the structure is known.
    """
    src = jnp.asarray(src)
    n_edges = src.shape[0]
    n_pad = _round_up(max(n_nodes, block_rows), block_rows)
    k_blocks = max(1, -(-window // block_rows))
    if fb_capacity is None:
        fb_capacity = n_edges
    fb_capacity = max(8, min(int(fb_capacity), n_edges))

    (attr_band, mask_band, fb_src, fb_dst, fb_attr, fb_mask, attr_mean,
     overflow) = _gat_plan_arrays(
        src, jnp.asarray(dst), jnp.asarray(attr), jnp.asarray(mask),
        n_pad, block_rows, k_blocks, fb_capacity)
    return GatPlan(n_nodes=n_pad, block_rows=block_rows, k_blocks=k_blocks,
                   attr_band=attr_band, mask_band=mask_band,
                   fb_src=fb_src, fb_dst=fb_dst, fb_attr=fb_attr,
                   fb_mask=fb_mask, attr_mean=attr_mean,
                   fb_overflow=overflow)


def _shifted_views_flat(x: jnp.ndarray, R: int, K: int) -> jnp.ndarray:
    """(K, nb, R, D) block-shifted views of (N, D) x (ops/spmm.py layout)."""
    n, d = x.shape
    off0 = K // 2
    xp = jnp.pad(x, ((off0 * R, (K - 1 - off0) * R), (0, 0)))
    return jnp.stack([
        jax.lax.slice_in_dim(xp, k * R, k * R + n).reshape(n // R, R, d)
        for k in range(K)])


def banded_gat_attention(xl: jnp.ndarray, xr: jnp.ndarray, plan: GatPlan,
                         project_edge, att: jnp.ndarray,
                         node_mask: jnp.ndarray,
                         negative_slope: float = 0.2,
                         precision: str = "default") -> jnp.ndarray:
    """GATv2 attention aggregation over a banded plan.

    out[i] = Σ_{j∈N(i)} α_ij (W_l x)_j  +  α_ii (W_l x)_i, where the α are
    the per-destination softmax of a_h^T LeakyReLU(W_l x_j + W_r x_i +
    W_e attr_ij) over in-edges ∪ the mean-filled self loop — exactly the
    semantics of models/layers.py GATv2Conv's edge-list path.

    xl, xr     : (N, H, F) projected node features (W_l x, W_r x)
    project_edge: callable (…, A) → (…, H·F); applies W_e (the flax
                  lin_edge module, shared with the edge-list path)
    att        : (H, F) attention vector
    node_mask  : (N,) 1.0 for real nodes
    precision  : "default" computes the dense window scores and messages
                 in bf16 (the z block tensor is the bandwidth cost of this
                 op; softmax statistics stay fp32) — same convention as
                 ops/spmm.py.  "highest" keeps everything fp32 (the exact
                 oracle mode the equality tests use).
    """
    N, H, F = xl.shape
    R, K, Np = plan.block_rows, plan.k_blocks, plan.n_nodes
    nb = Np // R
    if N < Np:
        pad = ((0, Np - N), (0, 0), (0, 0))
        xl = jnp.pad(xl, pad)
        xr = jnp.pad(xr, pad)
        node_mask = jnp.pad(node_mask, ((0, Np - N),))

    cdt = jnp.float32 if precision == "highest" else jnp.bfloat16
    out_dtype = xl.dtype
    xl, xr = xl.astype(cdt), xr.astype(cdt)
    xl_flat = xl.reshape(Np, H * F)
    att32 = att.astype(jnp.float32)
    xs = _shifted_views_flat(xl_flat, R, K)          # (K, nb, R, HF)
    xr_b = xr.reshape(nb, R, 1, H, F)

    # --- band scores: dense over the window, no gathers ------------------
    scores = []
    for k in range(K):
        ea_k = project_edge(plan.attr_band[k]).astype(cdt).reshape(
            nb, R, R, H, F)
        z = (ea_k
             + xs[k].reshape(nb, 1, R, H, F)         # source term, per slot
             + xr_b)                                 # destination term
        z = jax.nn.leaky_relu(z, negative_slope)
        s_k = jnp.einsum("bdshf,hf->bdsh", z, att32.astype(cdt),
                         preferred_element_type=jnp.float32)
        s_k = jnp.where(plan.mask_band[k].reshape(nb, R, R, 1) > 0,
                        s_k, -1e30)
        scores.append(s_k)
    band_peak = functools.reduce(
        jnp.maximum, [s.max(axis=2) for s in scores])  # (nb, R, H)
    band_peak = band_peak.reshape(Np, H)

    # --- fallback scores (compacted out-of-window edge list) -------------
    ea_fb = project_edge(plan.fb_attr).astype(cdt).reshape(-1, H, F)
    z_fb = jax.nn.leaky_relu(xl[plan.fb_src] + xr[plan.fb_dst] + ea_fb,
                             negative_slope)
    s_fb = jnp.einsum("ehf,hf->eh", z_fb, att32.astype(cdt),
                      preferred_element_type=jnp.float32)
    s_fb = jnp.where(plan.fb_mask[:, None] > 0, s_fb, -1e30)
    fb_peak = jax.ops.segment_max(s_fb, plan.fb_dst, num_segments=Np,
                                  indices_are_sorted=True)
    fb_peak = jnp.where(jnp.isfinite(fb_peak), fb_peak, -1e30)

    # --- self loop (dense, PyG fill_value="mean") -------------------------
    ea_loop = project_edge(plan.attr_mean).astype(cdt).reshape(1, H, F)
    z_l = jax.nn.leaky_relu(xl + xr + ea_loop, negative_slope)
    sl = jnp.einsum("nhf,hf->nh", z_l, att32.astype(cdt),
                    preferred_element_type=jnp.float32)
    sl = jnp.where(node_mask[:, None] > 0, sl, -1e30)

    # --- shared peak, exact log-sum-exp merge -----------------------------
    peak = jnp.maximum(jnp.maximum(band_peak, fb_peak), sl)     # (Np, H)
    peak_b = peak.reshape(nb, R, 1, H)

    band_sum = jnp.zeros((nb, R, H), jnp.float32)
    band_msg = jnp.zeros((nb, R, H, F), jnp.float32)
    for k in range(K):
        esc = jnp.exp(scores[k] - peak_b) \
            * plan.mask_band[k].reshape(nb, R, R, 1)            # (nb,Rd,Rs,H)
        band_sum = band_sum + esc.sum(axis=2)     # fp32 softmax denominator
        band_msg = band_msg + jnp.einsum(
            "bdsh,bshf->bdhf", esc.astype(cdt),
            xs[k].reshape(nb, R, H, F),
            preferred_element_type=jnp.float32)
    band_sum = band_sum.reshape(Np, H)
    band_msg = band_msg.reshape(Np, H, F)

    exf = jnp.exp(s_fb - peak[plan.fb_dst]) * plan.fb_mask[:, None]
    fb_sum = jax.ops.segment_sum(exf, plan.fb_dst, num_segments=Np,
                                 indices_are_sorted=True)
    # Flat (FB, H·F) messages: the 3-D (FB, H, F) segment_sum lowers ~6x
    # slower on this backend than the identical reduction with the head
    # axis folded into the minor dim (measured 5.8 -> 0.9 ms at FB=90k).
    fb_msg = jax.ops.segment_sum(
        jnp.repeat(exf.astype(cdt), F, axis=1) * xl_flat[plan.fb_src],
        plan.fb_dst, num_segments=Np, indices_are_sorted=True)
    fb_msg = fb_msg.astype(jnp.float32).reshape(Np, H, F)

    exl = jnp.exp(sl - peak) * node_mask[:, None]               # (Np, H)

    tot = band_sum + fb_sum + exl
    out = (band_msg + fb_msg + exl[:, :, None] * xl.astype(jnp.float32)) \
        / (tot[:, :, None] + 1e-12)
    return out[:N].astype(out_dtype)
