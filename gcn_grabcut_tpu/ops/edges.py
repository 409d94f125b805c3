"""Region-adjacency + non-local edge extraction at static shapes.

The reference derives adjacency edges from shifted label-map comparisons and
deduplicates them with ``np.unique`` over encoded pairs (reference:
src/gcn_grabcut/graph_builder.py:257-307), then adds k-NN colour edges over a
dense N^2 LAB-distance matrix (graph_builder.py:324-350) and 5-d pair
features (graph_builder.py:309-322).

TPU version: every step runs at a static edge budget —
``jnp.unique(..., size=...)`` with a sentinel code gives fixed-shape dedup
under jit, and invalid slots carry an edge mask instead of being absent.
Edge budgets: adjacency ≤ 4K undirected pairs (the RAG of a K-superpixel
tessellation is near-planar), non-local ≤ K * n_nonlocal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def unique_counts_static(codes: jnp.ndarray, size: int, sentinel
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """`jnp.unique(codes, size=size, fill_value=sentinel,
    return_counts=True)`, hand-rolled as sort + sorted segment reductions.

    jnp.unique's compaction path costs ~6x its underlying sort on this
    backend (220 ms vs 36 ms for 8x1M codes).  Even sorted-index segment
    reductions pay ~20 ms per 4.7M-element input here, so the per-rank
    boundaries come from a vectorised binary search instead: `rank` is
    non-decreasing, so `searchsorted(rank, r)` is the first slot of rank
    r — `size+1` log-time probes replace two full-length reductions
    (measured 92 → 17 ms device at 1536²/10k, identical outputs).
    Semantics match jnp.unique: ascending uniques, truncated at `size`,
    empty slots carry `sentinel` with count 0.
    """
    s = jnp.sort(codes.reshape(-1))
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), s[1:] != s[:-1]])
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    n = s.shape[0]
    starts = jnp.searchsorted(rank, jnp.arange(size + 1, dtype=rank.dtype))
    counts = jnp.diff(starts).astype(jnp.int32)
    uniq = s[jnp.minimum(starts[:size], n - 1)]
    uniq = jnp.where(counts > 0, uniq, sentinel)
    return uniq, counts


def adjacency_budget(k: int, connectivity: int = 4) -> int:
    # 4-connected RAGs are planar (< 3K undirected edges); diagonal
    # adjacency can exceed that, so 8-connectivity gets a larger budget.
    return 4 * k if connectivity == 4 else 6 * k


def nonlocal_budget(k: int, n_nonlocal: int) -> int:
    return k * n_nonlocal


@functools.partial(jax.jit, static_argnames=("k", "connectivity"))
def adjacency_pairs(segments: jnp.ndarray, k: int, connectivity: int = 4
                    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Unique undirected adjacent-region pairs + shared boundary lengths.

    Returns (pairs (P, 2) int32, shared (P,) float32 normalised to [0,1],
    mask (P,) float32) with static P = adjacency_budget(k).  The count of
    adjacent pixel pairs *is* the shared boundary length, exactly as in the
    reference (graph_builder.py:261-286).
    """
    sent = k * k  # sentinel code sorts after every real pair code

    shifts = [
        (segments[:, :-1], segments[:, 1:]),
        (segments[:-1, :], segments[1:, :]),
    ]
    if connectivity == 8:
        shifts += [
            (segments[:-1, :-1], segments[1:, 1:]),
            (segments[:-1, 1:], segments[1:, :-1]),
        ]

    codes = []
    for a, b in shifts:
        a = a.reshape(-1).astype(jnp.int32)
        b = b.reshape(-1).astype(jnp.int32)
        lo = jnp.minimum(a, b)
        hi = jnp.maximum(a, b)
        code = jnp.where(a == b, sent, lo * k + hi)
        codes.append(code)
    codes = jnp.concatenate(codes)

    budget = adjacency_budget(k, connectivity)
    uniq, counts = unique_counts_static(codes, budget, sent)
    mask = (uniq != sent).astype(jnp.float32)
    counts = counts.astype(jnp.float32) * mask
    shared = counts / (jnp.max(counts) + 1e-6)
    uniq = jnp.where(uniq == sent, 0, uniq)
    pairs = jnp.stack([uniq // k, uniq % k], axis=1).astype(jnp.int32)
    return pairs, shared, mask


@functools.partial(jax.jit, static_argnames=("k", "n_nonlocal"))
def nonlocal_pairs(adj_pairs: jnp.ndarray, adj_mask: jnp.ndarray,
                   mean_lab: jnp.ndarray, valid: jnp.ndarray, k: int,
                   n_nonlocal: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k-NN colour edges in mean-LAB space, excluding spatial neighbours.

    Mirrors reference `_nonlocal_pairs` (graph_builder.py:324-350): dense
    K x K distances, adjacency and diagonal masked to +inf, per-node top-k,
    dedup.  Empty clusters are masked out on both sides.  The per-node
    neighbour count is clamped to k-1 (the reference guards
    `n_nodes > n_nonlocal + 1`, graph_builder.py:291).
    """
    budget = nonlocal_budget(k, max(n_nonlocal, 1))
    if n_nonlocal <= 0 or k <= 1:
        return (jnp.zeros((budget, 2), jnp.int32),
                jnp.zeros((budget,), jnp.float32))
    n_nonlocal = min(n_nonlocal, k - 1)

    inf = jnp.inf
    d = jnp.linalg.norm(mean_lab[:, None, :] - mean_lab[None, :, :], axis=2)
    eye = jnp.eye(k, dtype=bool)
    adj = jnp.zeros((k, k), bool)
    m = adj_mask > 0
    adj = adj.at[adj_pairs[:, 0], adj_pairs[:, 1]].max(m)
    adj = adj.at[adj_pairs[:, 1], adj_pairs[:, 0]].max(m)
    invalid = (valid[:, None] <= 0) | (valid[None, :] <= 0)
    d = jnp.where(eye | adj | invalid, inf, d)

    # Per-node n_nonlocal nearest neighbours.
    neg_d, nbrs = jax.lax.top_k(-d, n_nonlocal)          # (K, k_nl)
    finite = jnp.isfinite(-neg_d)
    rows = jnp.broadcast_to(jnp.arange(k)[:, None], nbrs.shape)
    lo = jnp.minimum(rows, nbrs)
    hi = jnp.maximum(rows, nbrs)
    sent = k * k
    codes = jnp.where(finite, lo * k + hi, sent).reshape(-1)

    uniq, _ = unique_counts_static(codes, budget, sent)
    mask = (uniq != sent).astype(jnp.float32)
    uniq = jnp.where(uniq == sent, 0, uniq)
    pairs = jnp.stack([uniq // k, uniq % k], axis=1).astype(jnp.int32)
    return pairs, mask


@functools.partial(jax.jit, static_argnames=("k", "n_nonlocal",
                                             "exclude_window", "block"))
def nonlocal_pairs_banded(mean_lab: jnp.ndarray, valid: jnp.ndarray, k: int,
                          n_nonlocal: int, exclude_window: int,
                          block: int = 1024
                          ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Blocked k-NN colour edges for the 10k+-superpixel configuration.

    The reference's dense K x K search (graph_builder.py:324-350) is the
    SURVEY §5.7 scaling limit; here distances stream in row blocks of
    `block` under lax.scan (O(K·block) memory).  Spatial-neighbour
    exclusion uses the SLIC grid ordering: adjacent superpixels differ by
    at most gw+1 in index, so candidates within `exclude_window` index
    distance are skipped (a slightly conservative superset of the dense
    path's exact adjacency exclusion).
    """
    budget = nonlocal_budget(k, max(n_nonlocal, 1))
    if n_nonlocal <= 0 or k <= 1:
        return (jnp.zeros((budget, 2), jnp.int32),
                jnp.zeros((budget,), jnp.float32))
    n_nonlocal = min(n_nonlocal, k - 1)

    kp = ((k + block - 1) // block) * block
    ml = jnp.pad(mean_lab, ((0, kp - k), (0, 0)))
    vl = jnp.pad(valid, (0, kp - k))
    cols = jnp.arange(kp)
    sent = k * k

    def step(_, i0):
        mi = jax.lax.dynamic_slice(ml, (i0, 0), (block, 3))
        vi = jax.lax.dynamic_slice(vl, (i0,), (block,))
        rows = i0 + jnp.arange(block)
        d = jnp.linalg.norm(mi[:, None, :] - ml[None, :, :], axis=2)
        excl = (jnp.abs(rows[:, None] - cols[None, :]) <= exclude_window)
        excl |= (vi[:, None] <= 0) | (vl[None, :] <= 0)
        excl |= (rows[:, None] >= k) | (cols[None, :] >= k)
        d = jnp.where(excl, jnp.inf, d)
        neg_d, nbrs = jax.lax.top_k(-d, n_nonlocal)
        finite = jnp.isfinite(-neg_d)
        lo = jnp.minimum(rows[:, None], nbrs)
        hi = jnp.maximum(rows[:, None], nbrs)
        codes = jnp.where(finite, lo * k + hi, sent)
        return None, codes.reshape(-1)

    _, codes = jax.lax.scan(step, None, jnp.arange(0, kp, block))
    uniq, _ = unique_counts_static(codes.reshape(-1), budget, sent)
    mask = (uniq != sent).astype(jnp.float32)
    uniq = jnp.where(uniq == sent, 0, uniq)
    pairs = jnp.stack([uniq // k, uniq % k], axis=1).astype(jnp.int32)
    return pairs, mask


def pair_features(pairs: jnp.ndarray, mask: jnp.ndarray, st: dict,
                  shared: jnp.ndarray, nonlocal_flag: jnp.ndarray
                  ) -> jnp.ndarray:
    """5-d edge feature vector per undirected pair (graph_builder.py:309-322).

    [0] ΔE LAB (max-normalised over valid edges), [1] centroid distance
    (max-normalised), [2] shared boundary, [3] gradient contrast,
    [4] non-local flag.
    """
    i, j = pairs[:, 0], pairs[:, 1]

    delta_e = jnp.linalg.norm(st["mean_lab"][i] - st["mean_lab"][j], axis=1)
    delta_e = delta_e * mask
    delta_e = delta_e / (jnp.max(delta_e) + 1e-6)

    dxy = jnp.linalg.norm(st["centroids"][i] - st["centroids"][j], axis=1)
    dxy = dxy * mask
    dxy = dxy / (jnp.max(dxy) + 1e-6)

    grad_contrast = jnp.abs(st["mean_grad_n"][i] - st["mean_grad_n"][j])

    attr = jnp.stack([delta_e, dxy, shared, grad_contrast, nonlocal_flag],
                     axis=1)
    return attr * mask[:, None]


def symmetrise(pairs: jnp.ndarray, attr: jnp.ndarray, mask: jnp.ndarray
               ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Undirected pairs → symmetric directed (src, dst, attr, mask) arrays.

    Matches the reference convention of storing both directions
    (graph_builder.py:302-307); padded slots keep src = dst = 0, mask 0.
    """
    src = jnp.concatenate([pairs[:, 0], pairs[:, 1]])
    dst = jnp.concatenate([pairs[:, 1], pairs[:, 0]])
    attr2 = jnp.concatenate([attr, attr], axis=0)
    mask2 = jnp.concatenate([mask, mask])
    src = jnp.where(mask2 > 0, src, 0)
    dst = jnp.where(mask2 > 0, dst, 0)
    return src.astype(jnp.int32), dst.astype(jnp.int32), attr2, mask2
