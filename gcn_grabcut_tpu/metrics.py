"""Evaluation metrics: segmentation (IoU/Dice/P/R/F1/BF1) and trimap
quality, computed with jnp reductions.

Counterpart of reference src/gcn_grabcut/metrics.py; boundary extraction
uses a morphological-erosion stencil (lax.reduce_window min-pool) instead of
cv2.erode (metrics.py:105-127).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .core.graph import TRIMAP_BG, TRIMAP_FG, TRIMAP_PROB_BG, TRIMAP_PROB_FG


@dataclasses.dataclass
class SegmentationMetrics:
    iou: float
    dice: float
    precision: float
    recall: float
    f1: float
    pixel_accuracy: float
    boundary_f1: float = 0.0

    def __str__(self) -> str:
        return (f"IoU={self.iou:.4f}  Dice={self.dice:.4f}  "
                f"Prec={self.precision:.4f}  Rec={self.recall:.4f}  "
                f"F1={self.f1:.4f}  PixAcc={self.pixel_accuracy:.4f}  "
                f"BF1={self.boundary_f1:.4f}")

    def as_dict(self) -> dict:
        return {k: round(float(v), 4)
                for k, v in dataclasses.asdict(self).items()}


@dataclasses.dataclass
class TrimapMetrics:
    fg_recall: float
    fg_precision: float
    bg_recall: float
    bg_precision: float
    bg_contamination: float
    unknown_fraction: float
    trimap_accuracy: float

    def __str__(self) -> str:
        return (f"FG_rec={self.fg_recall:.3f}  FG_prec={self.fg_precision:.3f}"
                f"  BG_rec={self.bg_recall:.3f}  "
                f"BG_cont={self.bg_contamination:.3f}  "
                f"Unk={self.unknown_fraction:.3f}  "
                f"Acc={self.trimap_accuracy:.3f}")

    def as_dict(self) -> dict:
        return {k: round(float(v), 4)
                for k, v in dataclasses.asdict(self).items()}


def _erode(m: jnp.ndarray, width: int) -> jnp.ndarray:
    """Binary erosion with a (2w+1)^2 square structuring element."""
    k = 2 * width + 1
    return jax.lax.reduce_window(
        m.astype(jnp.float32), 1.0, jax.lax.min, (k, k), (1, 1), "SAME")


@functools.partial(jax.jit, static_argnames=("width",))
def _boundary_f1(pred: jnp.ndarray, gt: jnp.ndarray, width: int = 3):
    def boundary(m):
        return (m - _erode(m, width)) > 0

    pb = boundary(pred.astype(jnp.float32))
    gb = boundary(gt.astype(jnp.float32))
    tp = jnp.sum(pb & gb)
    prec = tp / (jnp.sum(pb) + 1e-8)
    rec = tp / (jnp.sum(gb) + 1e-8)
    return 2 * prec * rec / (prec + rec + 1e-8)


def boundary_f1(pred, gt, width: int = 3) -> float:
    """Boundary alignment F1 with width-pixel tolerance (metrics.py:105-127)."""
    return float(_boundary_f1(jnp.asarray(pred), jnp.asarray(gt),
                              width=width))


@jax.jit
def _confusion(pred: jnp.ndarray, gt: jnp.ndarray):
    p = pred.astype(bool)
    g = gt.astype(bool)
    tp = jnp.sum(p & g)
    fp = jnp.sum(p & ~g)
    fn = jnp.sum(~p & g)
    tn = jnp.sum(~p & ~g)
    return tp, fp, fn, tn


def evaluate(pred, gt, boundary_width: int = 3) -> SegmentationMetrics:
    """Full binary segmentation metrics (reference metrics.py:58-102)."""
    pred = jnp.asarray(pred)
    gt = jnp.asarray(gt)
    tp, fp, fn, tn = (float(x) for x in _confusion(pred, gt))

    iou = tp / (tp + fp + fn + 1e-8)
    dice = 2 * tp / (2 * tp + fp + fn + 1e-8)
    precision = tp / (tp + fp + 1e-8)
    recall = tp / (tp + fn + 1e-8)
    f1 = 2 * precision * recall / (precision + recall + 1e-8)
    pix_acc = (tp + tn) / (tp + tn + fp + fn + 1e-8)
    bf1 = boundary_f1(pred, gt, boundary_width) if boundary_width > 0 else 0.0

    return SegmentationMetrics(iou=iou, dice=dice, precision=precision,
                               recall=recall, f1=f1, pixel_accuracy=pix_acc,
                               boundary_f1=bf1)


def evaluate_trimap(trimap, gt_mask) -> TrimapMetrics:
    """Trimap quality vs a binary GT mask (reference metrics.py:152-202)."""
    trimap = np.asarray(trimap)
    gt = np.asarray(gt_mask).astype(bool)
    n = gt.size

    pred_fg = trimap == TRIMAP_FG
    pred_bg = trimap == TRIMAP_BG
    pred_pfg = trimap == TRIMAP_PROB_FG
    pred_pbg = trimap == TRIMAP_PROB_BG

    fg_tp = (pred_fg & gt).sum()
    fg_fp = (pred_fg & ~gt).sum()
    fg_fn = (~pred_fg & gt).sum()

    bg_tp = (pred_bg & ~gt).sum()
    bg_fp = (pred_bg & gt).sum()
    bg_fn = (~pred_bg & ~gt).sum()

    pred_bin = (pred_fg | pred_pfg)

    return TrimapMetrics(
        fg_recall=float(fg_tp / (fg_tp + fg_fn + 1e-8)),
        fg_precision=float(fg_tp / (fg_tp + fg_fp + 1e-8)),
        bg_recall=float(bg_tp / (bg_tp + bg_fn + 1e-8)),
        bg_precision=float(bg_tp / (bg_tp + bg_fp + 1e-8)),
        bg_contamination=float(fg_fp / n),
        unknown_fraction=float((pred_pfg | pred_pbg).sum() / n),
        trimap_accuracy=float((pred_bin.ravel() == gt.ravel()).mean()),
    )


#: Aggregate keys exposed by :func:`evaluate_batch`, mapped to the
#: SegmentationMetrics attribute each summarises (same surface as
#: reference metrics.py:204-231).
_BATCH_FIELDS = {"iou": "iou", "dice": "dice", "bf1": "boundary_f1"}


def evaluate_batch(results: list[dict]) -> dict:
    """Mean ± std of per-sample metrics over result dicts carrying
    ``binary_mask`` / ``gt_mask`` arrays.

    Vectorised over the per-sample SegmentationMetrics: one (n_samples,
    n_fields) matrix, reduced column-wise.
    """
    per_sample = [evaluate(r["binary_mask"], r["gt_mask"]) for r in results]
    table = np.array(
        [[getattr(m, attr) for attr in _BATCH_FIELDS.values()]
         for m in per_sample],
        dtype=np.float64).reshape(len(per_sample), len(_BATCH_FIELDS))
    means = table.mean(axis=0) if len(per_sample) else np.zeros(len(_BATCH_FIELDS))
    stds = table.std(axis=0) if len(per_sample) else np.zeros(len(_BATCH_FIELDS))
    summary: dict = {"n": len(per_sample)}
    for col, key in enumerate(_BATCH_FIELDS):
        summary[f"mean_{key}"] = float(means[col])
        summary[f"std_{key}"] = float(stds[col])
    return summary
