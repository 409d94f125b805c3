"""Banded-dense SpMM — the message-passing primitive for graphs too large
for the full dense-adjacency path.

Motivation (SURVEY §2.9, BASELINE.json): the reference's aggregation is
torch scatter kernels (/root/reference/src/gcn_grabcut/model.py:69-108);
the dense (N, N) adjacency matmul used by the model zoo is MXU-optimal up
to N ≈ 1-2k but its N² memory kills it at the 10k+-superpixel scale.

Design — everything is an MXU matmul, no gathers and no scatters:

  SLIC numbers superpixels in grid scan order, so spatial adjacency is
  *index-banded*: almost every edge (src → dst) has |src - dst| within a
  fixed window.  The graph is static across SpMM calls (a GCN reuses the
  same adjacency every layer, every iteration), so the sparse structure is
  compiled ONCE on the host into banded-dense block storage.  With row
  blocks of R rows and K source sub-blocks at regular offsets
  o_k = k - K//2 (window W = K·R):

    band[k, i, s] = Σ weight  over edges
                    (src = (i//R + o_k)·R + s  →  dst = i)

  and the product is a batched dense contraction over K shifted views of x:

    out.reshape(nb, R, D) = Σ_k band[k].reshape(nb, R, R)
                                @ shift_k(x).reshape(nb, R, R→D)

  where shift_k(x) is a *static* slice of the zero-padded x — XLA sees
  only dense batched matmuls plus cheap slices, every FLOP lands on the
  MXU, and storage is N·W values, independent of edge count.  No scatter
  appears anywhere: on this backend XLA scatter kernels also carry
  pathological compile times (minutes), which this formulation avoids.

Out-of-window edges (non-local colour-space edges) are handled by a
dst-sorted segment-sum fallback outside the kernel and added in.

`spmm_plan` does the one-off host-side compilation; `banded_spmm` executes
it (`backend="xla"` shifted-view einsum, the default, or
`backend="pallas"` — the same schedule as an explicit Pallas kernel with
regular block specs).  `spmm_reference` is the jnp scatter oracle both are
tested against.

Measured on 1x TPU v5e (N=10k, D=128, E=81k lattice + 2k non-local,
slope-timed to cancel this backend's ~450us per-dispatch-quantum noise —
see tools/bench_spmm.py): band-only 8.6us (9.2B edges/s) on the XLA
schedule, 24us on the Pallas variant; +27us for the 1.9k-edge fallback
segment-sum.  The round-1 in-kernel one-hot schedule measured 736us: the
one-hots were being rebuilt on the VPU every call for a product that is a
compile-time constant of the graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@struct.dataclass
class SpmmPlan:
    """Compiled banded-dense adjacency (static shapes).

    A pytree: the band/fallback arrays are leaves, the layout ints static
    aux data — so a plan can be passed straight through `jax.jit`
    boundaries (models/large.py jits the whole SpMM-backed forward with
    the plans as arguments)."""
    n_nodes: int = struct.field(pytree_node=False)   # padded to ÷block_rows
    block_rows: int = struct.field(pytree_node=False)  # R
    k_blocks: int = struct.field(pytree_node=False)  # K sub-blocks (W = K·R)
    band: np.ndarray = None       # (K, n_nodes, R) float32 banded weights
    fb_src: np.ndarray = None     # (n_fallback,) int32 out-of-window edges
    fb_dst: np.ndarray = None     # (n_fallback,)
    fb_weight: np.ndarray = None  # (n_fallback,)

    @property
    def n_blocks(self) -> int:
        return self.n_nodes // self.block_rows

    @property
    def window(self) -> int:
        return self.k_blocks * self.block_rows


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def spmm_plan(src: np.ndarray, dst: np.ndarray, weight: np.ndarray,
              n_nodes: int, block_rows: int = 128,
              window: int = 640) -> SpmmPlan:
    """Compile (src → dst, weight) edges into banded-dense block storage.

    `window` is rounded up to a multiple of `block_rows` (K = W / R source
    sub-blocks, centred on the destination block).  Edges outside the
    window go to the fallback list.  Duplicate edges accumulate, matching
    scatter-add semantics.
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    weight = np.asarray(weight, np.float32)
    keep = weight != 0
    src, dst, weight = src[keep], dst[keep], weight[keep]

    n_pad = _round_up(max(n_nodes, block_rows), block_rows)
    k_blocks = max(1, -(-window // block_rows))

    # Offset of source sub-block k relative to the destination block.
    off0 = -(k_blocks // 2)
    blk = dst // block_rows
    k = src // block_rows - blk - off0
    in_window = (k >= 0) & (k < k_blocks)

    banded = np.nonzero(in_window)[0]
    fallback = np.nonzero(~in_window)[0]
    # Sorted by destination: the fallback runs as a sorted segment-sum,
    # which both executes and *compiles* fast on this backend (unsorted
    # XLA scatter compiles are an order of magnitude slower).
    fallback = fallback[np.argsort(dst[fallback], kind="stable")]

    band = np.zeros((k_blocks, n_pad, block_rows), np.float32)
    np.add.at(band, (k[banded], dst[banded], src[banded] % block_rows),
              weight[banded])

    return SpmmPlan(
        n_nodes=n_pad, block_rows=block_rows, k_blocks=k_blocks, band=band,
        fb_src=src[fallback].astype(np.int32),
        fb_dst=dst[fallback].astype(np.int32),
        fb_weight=weight[fallback].astype(np.float32),
    )


@functools.partial(jax.jit, static_argnames=("n_pad", "block_rows",
                                             "k_blocks"))
def _plan_device_arrays(src, dst, weight, n_pad, block_rows, k_blocks):
    """Device-side band build: one sorted scatter-add into the flattened
    (K, n_pad, R) band + a dst-sorted copy of the out-of-window edges.

    Padded / masked edges must arrive with weight 0 — they contribute
    nothing (static shapes; no boolean filtering on device)."""
    src = jnp.clip(src.astype(jnp.int32), 0, n_pad - 1)
    dst = jnp.clip(dst.astype(jnp.int32), 0, n_pad - 1)
    weight = weight.astype(jnp.float32)

    off0 = -(k_blocks // 2)
    k = src // block_rows - dst // block_rows - off0
    in_w = (k >= 0) & (k < k_blocks)

    idx = jnp.where(in_w, (k * n_pad + dst) * block_rows
                    + (src % block_rows), 0)
    w_in = jnp.where(in_w, weight, 0.0)
    # Sorted scatter: unsorted XLA scatter carries pathological compile
    # times on this backend (module docstring); one argsort fixes it.
    order = jnp.argsort(idx)
    band = jnp.zeros(k_blocks * n_pad * block_rows, jnp.float32)
    band = band.at[idx[order]].add(w_in[order], indices_are_sorted=True)

    w_fb = jnp.where(in_w, 0.0, weight)
    order_fb = jnp.argsort(dst)
    return (band.reshape(k_blocks, n_pad, block_rows),
            src[order_fb], dst[order_fb], w_fb[order_fb])


def spmm_plan_device(src: jnp.ndarray, dst: jnp.ndarray,
                     weight: jnp.ndarray, n_nodes: int,
                     block_rows: int = 128, window: int = 640) -> SpmmPlan:
    """`spmm_plan` built entirely on device — no host pull of the edge list
    and no (N x W)-sized band upload afterwards (the band is ~25-45 MB at
    10k nodes; the tunnel moves host data at ~25-50 MB/s, so the host
    round-trip costs more than the forward it feeds).

    Semantics match `spmm_plan` with two static-shape differences: edges
    with weight 0 (masked / padded) are kept but contribute nothing, and
    the fallback list is all E edges with in-window weights zeroed rather
    than a compacted list (zero-weight messages add nothing)."""
    n_pad = _round_up(max(n_nodes, block_rows), block_rows)
    k_blocks = max(1, -(-window // block_rows))
    band, fb_src, fb_dst, fb_w = _plan_device_arrays(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(weight),
        n_pad, block_rows, k_blocks)
    return SpmmPlan(n_nodes=n_pad, block_rows=block_rows,
                    k_blocks=k_blocks, band=band,
                    fb_src=fb_src, fb_dst=fb_dst, fb_weight=fb_w)


def _shifted_views(x: jnp.ndarray, R: int, K: int) -> jnp.ndarray:
    """(K, nb, R, D) stack of block-shifted views of x ((N, D), N = nb·R)."""
    n, d = x.shape
    off0 = K // 2
    xp = jnp.pad(x, ((off0 * R, (K - 1 - off0) * R), (0, 0)))
    return jnp.stack([
        jax.lax.slice_in_dim(xp, k * R, k * R + n).reshape(n // R, R, d)
        for k in range(K)])


@functools.partial(jax.jit, static_argnames=("block_rows", "k_blocks",
                                             "precision"))
def _banded_spmm_xla(x, band, block_rows, k_blocks, precision="default"):
    """Shifted-view batched contraction — dense XLA ops only."""
    n, d = x.shape
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    dt = jnp.float32 if precision == "highest" else jnp.bfloat16
    xs = _shifted_views(x.astype(dt), block_rows, k_blocks)   # (K,nb,R,D)
    a = band.astype(dt).reshape(k_blocks, n // block_rows,
                                block_rows, block_rows)        # (K,nb,R,R)
    out = jnp.einsum("kbrs,kbsd->brd", a, xs,
                     precision=prec,
                     preferred_element_type=jnp.float32)
    return out.reshape(n, d)


def _make_pallas_kernel(k_blocks: int, precision: str):
    def kernel(a_ref, *rest):
        x_refs, o_ref = rest[:-1], rest[-1]
        prec = (jax.lax.Precision.HIGHEST if precision == "highest"
                else jax.lax.Precision.DEFAULT)
        acc = jax.lax.dot_general(
            a_ref[0, 0], x_refs[0][:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        for k in range(1, k_blocks):
            acc = acc + jax.lax.dot_general(
                a_ref[k, 0], x_refs[k][:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        o_ref[:] = acc
    return kernel


@functools.partial(jax.jit, static_argnames=("block_rows", "k_blocks",
                                             "precision"))
def _banded_spmm_pallas(x, band, block_rows, k_blocks, precision="default"):
    """The same schedule as an explicit Pallas kernel: one grid step per
    destination block, K regular-offset x blocks, all statically mapped
    (full double-buffered pipelining, no dynamic slices)."""
    n, d = x.shape
    R = block_rows
    nb = n // R
    dt = jnp.float32 if precision == "highest" else jnp.bfloat16
    off0 = k_blocks // 2
    xp = jnp.pad(x.astype(dt), ((off0 * R, (k_blocks - 1 - off0) * R),
                                (0, 0)))
    a = band.astype(dt)

    def x_spec(k):
        return pl.BlockSpec((R, d), lambda b, k=k: (b + k, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _make_pallas_kernel(k_blocks, precision),
        grid=(nb,),
        in_specs=[pl.BlockSpec((k_blocks, 1, R, R), lambda b: (0, b, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [x_spec(k) for k in range(k_blocks)],
        out_specs=pl.BlockSpec((R, d), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k_blocks * R * d,
            bytes_accessed=(n * k_blocks * R + n * d) * 2 + n * d * 4,
            transcendentals=0,
        ),
    )(a.reshape(k_blocks, nb, R, R), *([xp] * k_blocks))


def _fallback_segsum(x, fb_src, fb_dst, fb_weight, n):
    """Out-of-window edges: row gather + dst-sorted segment-sum.  The plan
    sorts fallback edges by destination, so `indices_are_sorted` lets XLA
    lower this without the pathological unsorted-scatter compile path.
    Fallback counts are small (non-local colour edges only)."""
    msgs = x[jnp.asarray(fb_src)] * jnp.asarray(fb_weight)[:, None]
    return jax.ops.segment_sum(msgs, jnp.asarray(fb_dst), num_segments=n,
                               indices_are_sorted=True)


def banded_spmm(x: jnp.ndarray, plan: SpmmPlan, interpret: bool = False,
                precision: str = "default",
                backend: str = "xla") -> jnp.ndarray:
    """out[dst] += weight * x[src] over the plan's edges.  x: (N, D) with
    N <= plan.n_nodes (padded internally); returns (N, D).

    `backend="xla"` (default) runs the shifted-view contraction as plain
    XLA; `backend="pallas"` uses the explicit Pallas kernel (TPU only).
    `interpret=True` is the reference/CPU oracle: it forces the XLA path
    in exact fp32 regardless of `precision`."""
    n = x.shape[0]
    if n < plan.n_nodes:
        x = jnp.pad(x, ((0, plan.n_nodes - n), (0, 0)))
    if interpret:
        precision = "highest"

    # The band is the bulk of the plan (N x W values); the default path
    # contracts in bf16 anyway, so cast host-side and upload half the
    # bytes (the tunnel-attached chip moves host data at ~25-50 MB/s).
    band = jnp.asarray(plan.band, jnp.float32 if precision == "highest"
                       else jnp.bfloat16)
    if backend == "pallas" and not interpret:
        out = _banded_spmm_pallas(x.astype(jnp.float32), band,
                                  plan.block_rows, plan.k_blocks, precision)
    else:
        out = _banded_spmm_xla(x.astype(jnp.float32), band,
                               plan.block_rows, plan.k_blocks, precision)

    if len(plan.fb_src):
        out = out + _fallback_segsum(x.astype(out.dtype), plan.fb_src,
                                     plan.fb_dst, plan.fb_weight,
                                     plan.n_nodes)
    return out[:n]


def spmm_reference(x: jnp.ndarray, src, dst, weight, n: int) -> jnp.ndarray:
    """The oracle: plain weighted scatter-add."""
    msgs = x[jnp.asarray(src)] * jnp.asarray(weight)[:, None]
    return jnp.zeros((n, x.shape[1]), x.dtype).at[jnp.asarray(dst)].add(msgs)
