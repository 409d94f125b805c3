"""Segment / scatter primitives and masked per-graph reductions.

These are the TPU equivalents of the reference's torch scatter helpers
(`_scatter_mean`, `_graph_mean`, `_graph_softmax` — reference:
src/gcn_grabcut/model.py:69-108) and its `np.bincount` region reductions
(graph_builder.py:190-226).

Two families:

* **edge scatter** — grouped reductions over an index vector with a static
  number of segments.  Used for message passing on the edge list and for
  region statistics over pixel label maps.
* **masked axis reductions** — because batches are dense ``(G, N, ...)``
  stacks, per-graph mean/softmax are simple masked reductions over axis 1
  (no segment ids needed, unlike the reference's concat batching).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def scatter_add(values: jnp.ndarray, index: jnp.ndarray, num_segments: int
                ) -> jnp.ndarray:
    """Sum `values` (M, ...) into `num_segments` buckets by `index` (M,)."""
    return jax.ops.segment_sum(values, index, num_segments=num_segments)


def scatter_mean(values: jnp.ndarray, index: jnp.ndarray, num_segments: int,
                 weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean of `values` rows grouped by `index`; empty groups give zero.

    `weights` (M,) optionally masks/weights rows (padded edges use weight 0).
    Mirrors reference `_scatter_mean` (model.py:69-74) which clamps counts
    at 1.
    """
    if weights is not None:
        w = weights.reshape(weights.shape + (1,) * (values.ndim - 1))
        values = values * w
        counts = jax.ops.segment_sum(weights, index, num_segments=num_segments)
    else:
        counts = jax.ops.segment_sum(
            jnp.ones(index.shape, values.dtype), index,
            num_segments=num_segments)
    total = jax.ops.segment_sum(values, index, num_segments=num_segments)
    counts = jnp.maximum(counts, 1.0)
    return total / counts.reshape(counts.shape + (1,) * (values.ndim - 1))


def scatter_max(values: jnp.ndarray, index: jnp.ndarray, num_segments: int
                ) -> jnp.ndarray:
    """Per-segment maximum; empty segments give NEG_INF."""
    return jax.ops.segment_max(values, index, num_segments=num_segments)


def scatter_softmax(scores: jnp.ndarray, index: jnp.ndarray,
                    num_segments: int,
                    mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Numerically-stable softmax of `scores` (M,) grouped by `index`.

    The TPU analog of per-destination attention normalisation (used by the
    GATv2 variant).  Masked entries get probability 0.  Computed in float32
    (the reference keeps an fp32 island here too, model.py:90-108).
    """
    s = scores.astype(jnp.float32)
    if mask is not None:
        s = jnp.where(mask > 0, s, NEG_INF)
    peak = jax.ops.segment_max(s, index, num_segments=num_segments)
    peak = jnp.where(jnp.isfinite(peak), peak, 0.0)
    ex = jnp.exp(s - peak[index])
    if mask is not None:
        ex = ex * mask
    tot = jax.ops.segment_sum(ex, index, num_segments=num_segments)
    return (ex / (tot[index] + 1e-12)).astype(scores.dtype)


# ---------------------------------------------------------------------------
# Masked per-graph reductions on dense (G, N, ...) batches
# ---------------------------------------------------------------------------

def masked_mean(h: jnp.ndarray, mask: jnp.ndarray, axis: int = 1,
                keepdims: bool = True) -> jnp.ndarray:
    """Mean of `h` over `axis`, counting only entries where mask == 1.

    `mask` broadcasts against `h` ((G, N) against (G, N, D) via expansion).
    The dense-batch analog of the reference `_graph_mean` (model.py:77-87).
    """
    m = _expand(mask, h)
    total = jnp.sum(h * m, axis=axis, keepdims=keepdims)
    count = jnp.maximum(jnp.sum(m, axis=axis, keepdims=keepdims), 1.0)
    return total / count


def masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray, axis: int = 1
                   ) -> jnp.ndarray:
    """Softmax over `axis` with masked entries forced to probability 0.

    The dense-batch analog of the reference `_graph_softmax`
    (model.py:90-108): computed in float32 and cast back for bf16 safety.
    """
    dtype = scores.dtype
    s = scores.astype(jnp.float32)
    m = _expand(mask, s)
    s = jnp.where(m > 0, s, NEG_INF)
    s = s - jax.lax.stop_gradient(jnp.max(s, axis=axis, keepdims=True))
    ex = jnp.exp(s) * m
    tot = jnp.sum(ex, axis=axis, keepdims=True)
    return (ex / (tot + 1e-12)).astype(dtype)


def masked_var(h: jnp.ndarray, mask: jnp.ndarray, axis=None
               ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Masked (mean, biased variance, count) over the given axes."""
    m = _expand(mask, h)
    count = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    mean = jnp.sum(h * m, axis=axis) / count
    var = jnp.sum(((h - mean) ** 2) * m, axis=axis) / count
    return mean, var, count


def _expand(mask: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(like.dtype)
    while m.ndim < like.ndim:
        m = m[..., None]
    return m
