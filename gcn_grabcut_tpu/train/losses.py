"""Training objectives — masked, dense-batch versions of the reference
losses (src/gcn_grabcut/losses.py).

All functions take dense (G, N, ...) tensors plus a node mask; padded nodes
contribute exactly zero.  The per-graph soft-Dice term is an axis-1 masked
reduction (the reference needed index_add over a segment vector,
losses.py:139-148).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.graph import CLASS_UNK, CLASS_FG


def _weighted_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                 weight: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Per-node cross-entropy with optional class weights, fp32."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if weight is not None:
        ce = ce * weight[labels]
    return ce


def focal_loss(logits, labels, node_mask, gamma: float = 2.0,
               weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """FL = (1 - p_t)^gamma * CE, mean over valid nodes (losses.py:12-29)."""
    ce = _weighted_ce(logits, labels, weight)
    p_t = jnp.exp(-ce)
    per_node = ((1 - p_t) ** gamma) * ce
    return jnp.sum(per_node * node_mask) / jnp.maximum(
        jnp.sum(node_mask), 1.0)


def label_smoothing_ce(logits, labels, node_mask, smoothing: float = 0.1,
                       weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Smoothed CE (losses.py:32-54)."""
    n_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    smooth = jnp.full_like(logp, smoothing / (n_classes - 1))
    onehot = jax.nn.one_hot(labels, n_classes, dtype=logp.dtype)
    smooth = jnp.where(onehot > 0, 1.0 - smoothing, smooth)
    loss = -jnp.sum(smooth * logp, axis=-1)
    if weight is not None:
        loss = loss * weight[labels]
    return jnp.sum(loss * node_mask) / jnp.maximum(jnp.sum(node_mask), 1.0)


def trimap_loss(logits, labels, node_mask,
                area: Optional[jnp.ndarray] = None,
                fg_ratio: Optional[jnp.ndarray] = None,
                gamma: float = 2.0,
                weight: Optional[jnp.ndarray] = None,
                dice_weight: float = 0.5,
                area_weighted: bool = True,
                graph_weight: Optional[jnp.ndarray] = None,
                eps: float = 1e-6) -> jnp.ndarray:
    """Area-weighted focal CE + per-graph soft Dice (losses.py:57-150).

    Classification term: focal CE with the focal factor computed from the
    *detached* CE clamped at 30 (losses.py:111), weighted by region area
    normalised to unit mean over valid nodes.

    Overlap term: soft Dice on expected foreground coverage
    p = P(FG) + 0.5 P(UNK) against `fg_ratio` (or hard labels), accumulated
    with area weights per graph, then averaged over graphs.

    `graph_weight` (G,) down-weights whole graphs — used for the wrapped
    duplicates that fill the last partial batch under static batch shapes.
    """
    mask = node_mask
    if graph_weight is not None:
        mask = mask * graph_weight[:, None]
    n_valid = jnp.maximum(jnp.sum(mask), 1.0)

    ce = _weighted_ce(logits, labels, weight)
    if gamma > 0:
        p_t = jnp.exp(-jnp.clip(jax.lax.stop_gradient(ce), max=30.0))
        per_node = ((1 - p_t) ** gamma) * ce
    else:
        per_node = ce

    if area is not None and area_weighted:
        w = area * mask
        w = w * (n_valid / jnp.maximum(jnp.sum(w), eps))
        cls_loss = jnp.sum(per_node * w) / n_valid
    else:
        cls_loss = jnp.sum(per_node * mask) / n_valid

    if dice_weight <= 0:
        return cls_loss

    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    pred = probs[..., CLASS_FG] + 0.5 * probs[..., CLASS_UNK]

    if fg_ratio is not None:
        target = fg_ratio.astype(pred.dtype)
    else:
        target = ((labels == CLASS_FG).astype(pred.dtype)
                  + 0.5 * (labels == CLASS_UNK).astype(pred.dtype))

    a = mask if area is None else area * mask

    # Per-graph accumulation (axis 1), then mean over graphs — a large image
    # must not mask the error made on a small one (losses.py:139-148).
    inter = jnp.sum(a * pred * target, axis=1)
    sum_p = jnp.sum(a * pred, axis=1)
    sum_t = jnp.sum(a * target, axis=1)
    per_graph = 1.0 - (2.0 * inter + eps) / (sum_p + sum_t + eps)
    if graph_weight is not None:
        dice = (jnp.sum(per_graph * graph_weight)
                / jnp.maximum(jnp.sum(graph_weight), 1.0))
    else:
        dice = jnp.mean(per_graph)

    return cls_loss + dice_weight * dice


def make_loss_fn(loss_fn: str = "trimap", gamma: float = 2.0,
                 dice_weight: float = 0.5, label_smoothing: float = 0.1,
                 class_weights=None):
    """Criterion factory matching the trainer's selection
    (reference trainer.py:110-122).  Returns
    f(logits, labels, node_mask, area, fg_ratio) -> scalar."""
    w = None if class_weights is None else jnp.asarray(
        class_weights, jnp.float32)

    if loss_fn == "trimap":
        def f(logits, labels, node_mask, area=None, fg_ratio=None,
              graph_weight=None):
            return trimap_loss(logits, labels, node_mask, area=area,
                               fg_ratio=fg_ratio, gamma=gamma, weight=w,
                               dice_weight=dice_weight,
                               graph_weight=graph_weight)
    elif loss_fn == "focal":
        def f(logits, labels, node_mask, area=None, fg_ratio=None,
              graph_weight=None):
            if graph_weight is not None:
                node_mask = node_mask * graph_weight[:, None]
            return focal_loss(logits, labels, node_mask, gamma=gamma,
                              weight=w)
    elif loss_fn == "smooth_ce":
        def f(logits, labels, node_mask, area=None, fg_ratio=None,
              graph_weight=None):
            if graph_weight is not None:
                node_mask = node_mask * graph_weight[:, None]
            return label_smoothing_ce(logits, labels, node_mask,
                                      smoothing=label_smoothing, weight=w)
    else:  # plain CE
        def f(logits, labels, node_mask, area=None, fg_ratio=None,
              graph_weight=None):
            if graph_weight is not None:
                node_mask = node_mask * graph_weight[:, None]
            ce = _weighted_ce(logits, labels, w)
            return jnp.sum(ce * node_mask) / jnp.maximum(
                jnp.sum(node_mask), 1.0)
    return f


# ---------------------------------------------------------------------------
# Facade parity: the reference exports its losses as callable objects
# (src/gcn_grabcut/losses.py FocalLoss / LabelSmoothingCE / TrimapLoss,
# re-exported at package top level, __init__.py:31).  These thin classes
# bind the hyper-parameters at construction and call the functional forms.
# ---------------------------------------------------------------------------

class FocalLoss:
    """Callable wrapper over :func:`focal_loss` (reference losses.py:12-29)."""

    def __init__(self, gamma: float = 2.0, weight=None):
        self.gamma = gamma
        self.weight = None if weight is None else jnp.asarray(
            weight, jnp.float32)

    def __call__(self, logits, labels, node_mask):
        return focal_loss(logits, labels, node_mask, gamma=self.gamma,
                          weight=self.weight)


class LabelSmoothingCE:
    """Callable wrapper over :func:`label_smoothing_ce`
    (reference losses.py:32-54)."""

    def __init__(self, smoothing: float = 0.1, weight=None):
        self.smoothing = smoothing
        self.weight = None if weight is None else jnp.asarray(
            weight, jnp.float32)

    def __call__(self, logits, labels, node_mask):
        return label_smoothing_ce(logits, labels, node_mask,
                                  smoothing=self.smoothing,
                                  weight=self.weight)


class TrimapLoss:
    """Callable wrapper over :func:`trimap_loss` (reference losses.py:57-150)."""

    def __init__(self, gamma: float = 2.0, dice_weight: float = 0.5,
                 weight=None, area_weighted: bool = True):
        self.gamma = gamma
        self.dice_weight = dice_weight
        self.area_weighted = area_weighted
        self.weight = None if weight is None else jnp.asarray(
            weight, jnp.float32)

    def __call__(self, logits, labels, node_mask, area=None, fg_ratio=None,
                 graph_weight=None):
        return trimap_loss(logits, labels, node_mask, area=area,
                           fg_ratio=fg_ratio, gamma=self.gamma,
                           weight=self.weight, dice_weight=self.dice_weight,
                           area_weighted=self.area_weighted,
                           graph_weight=graph_weight)
