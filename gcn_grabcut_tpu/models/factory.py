"""Model factory + shared prediction helpers.

Mirrors the reference `build_model` (src/gcn_grabcut/model.py:593-620) and
the trimap conversion helpers (model.py:623-678), with pixel projection as a
device-side gather.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.graph import (
    GraphBatch, N_NODE_FEATS, N_EDGE_FEATS,
    TRIMAP_BG, TRIMAP_FG, TRIMAP_PROB_BG, TRIMAP_PROB_FG,
    CLASS_BG, CLASS_FG,
)
from .resgcn import ResGCNNet
from .gcn import GCNTrimapNet
from .gat import GATTrimapNet


def build_model(variant: str = "resgcn",
                in_channels: int = N_NODE_FEATS,
                edge_channels: int = N_EDGE_FEATS,
                hidden_channels: int = 128,
                n_layers: int = 6,
                n_classes: int = 3,
                dropout: float = 0.2,
                dtype: Optional[jnp.dtype] = None) -> nn.Module:
    """variant: "resgcn" | "gcn" | "gat"."""
    kw = dict(in_channels=in_channels, edge_channels=edge_channels,
              hidden_channels=hidden_channels, n_classes=n_classes,
              dropout=dropout, dtype=dtype)
    if variant == "resgcn":
        return ResGCNNet(**kw, n_layers=n_layers)
    if variant == "gat":
        return GATTrimapNet(**kw, n_layers=n_layers, n_heads=8)
    if variant == "gcn":
        return GCNTrimapNet(**kw, n_layers=n_layers)
    raise ValueError(f"Unknown variant '{variant}'. Choose: resgcn|gcn|gat")


def init_model(model: nn.Module, rng: jax.Array, example: GraphBatch) -> Any:
    """Initialise parameters + batch_stats for a model."""
    return model.init({"params": rng}, example, train=False)


@functools.partial(jax.jit, static_argnames=("model",))
def _apply_eval_jit(model: nn.Module, variables: Any, graph: GraphBatch):
    """Cached-jit eval forward (flax modules are frozen dataclasses, so the
    model itself is a valid static argument).  Without this the pipeline's
    forward dispatched op by op — at ~0.5-4 ms per dispatch on the
    tunnel-attached chip that overhead was ~1000x the MXU compute
    (PERF.md: the slope-timed forward is 0.1-0.25 ms)."""
    return model.apply(variables, graph, train=False)


_ENSEMBLE_KEY = "__ensemble__"


def stack_variables(variables_list) -> dict:
    """Bundle M compatible variable pytrees into one inference ensemble.

    Leaves are stacked along a new leading axis (one device array per
    parameter, M× the size), and the result is tagged so `apply_model` /
    the pipeline run the vmapped ensemble forward.  TPU-first ensembling:
    the M forwards ride one jit as a batched matmul problem — on this
    tunnel-attached chip dispatch overhead dominates, so M members cost
    roughly the same wall time as one (the MXU is nowhere near saturated
    at these model sizes).  No reference counterpart (the reference runs a
    single checkpoint); used to cut posterior variance, which the
    stage-swap attribution identified as the accuracy-limiting stage.
    """
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *list(variables_list))
    return {_ENSEMBLE_KEY: stacked}


def is_ensemble(variables: Any) -> bool:
    return isinstance(variables, dict) and _ENSEMBLE_KEY in variables


@functools.partial(jax.jit, static_argnames=("model",))
def _apply_eval_ensemble_jit(model: nn.Module, stacked: Any,
                             graph: GraphBatch):
    """Mean class-probability over the stacked members, returned as
    log-probabilities so downstream softmax(logits) reproduces the mean
    exactly (softmax is invariant to the log of a normalised vector)."""
    probs = jax.vmap(
        lambda v: jax.nn.softmax(
            model.apply(v, graph, train=False).astype(jnp.float32), -1)
    )(stacked)
    return jnp.log(probs.mean(axis=0) + 1e-9)


def apply_model(model: nn.Module, variables: Any, graph: GraphBatch,
                train: bool = False, dropout_rng: Optional[jax.Array] = None):
    """Forward pass.  In training mode returns (logits, new_batch_stats).
    Eval mode accepts an ensemble bundle from `stack_variables` and then
    returns the log of the members' mean class probability."""
    if train:
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        logits, updates = model.apply(
            variables, graph, train=True, rngs=rngs,
            mutable=["batch_stats"])
        return logits, updates
    if is_ensemble(variables):
        return _apply_eval_ensemble_jit(model, variables[_ENSEMBLE_KEY],
                                        graph)
    return _apply_eval_jit(model, variables, graph)


def predict_probs(model: nn.Module, variables: Any, graph: GraphBatch
                  ) -> jnp.ndarray:
    """(G, N, 3) softmax class probabilities (eval mode)."""
    logits = apply_model(model, variables, graph, train=False)
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def probs_to_node_trimap(probs: jnp.ndarray, threshold_fg: float = 0.55,
                         threshold_bg: float = 0.55) -> jnp.ndarray:
    """Per-region class probabilities → 4-label OpenCV-convention trimap.

    Definite only above threshold, else the more likely probable side
    (reference model.py:623-645).
    """
    bg_p = probs[..., CLASS_BG]
    fg_p = probs[..., CLASS_FG]
    labels = jnp.where(fg_p > bg_p, TRIMAP_PROB_FG, TRIMAP_PROB_BG)
    labels = jnp.where(bg_p >= threshold_bg, TRIMAP_BG, labels)
    labels = jnp.where(fg_p >= threshold_fg, TRIMAP_FG, labels)
    return labels.astype(jnp.uint8)


def project_to_pixels(node_values: jnp.ndarray, segments: jnp.ndarray
                      ) -> jnp.ndarray:
    """Broadcast per-region values to pixels (reference model.py:648-661 —
    here the label space is static so no padding is ever needed).

    Float planes route through the blocked one-hot matmul (`project_planes`,
    ~3x faster than a gather at 512² on this backend); other dtypes (e.g.
    uint8 label maps) keep the exact gather."""
    node_values = jnp.asarray(node_values)
    if jnp.issubdtype(node_values.dtype, jnp.floating) and node_values.ndim == 1:
        return project_planes(node_values[:, None], segments)[..., 0]
    return node_values[segments]


def project_planes(node_planes: jnp.ndarray, segments: jnp.ndarray,
                   block: int = 32768) -> jnp.ndarray:
    """(K, C) per-region float planes → (H, W, C) pixel planes.

    Implemented as blocked one-hot matmuls on the MXU instead of an (H*W,)
    gather: one-hot(block, K) @ (K, C) selects exactly one row per pixel
    (fp32-exact, identical to the gather) and measures ~3x faster than
    separate per-plane gathers at 512²/K=500 on this chip.

    Above K=2048 the one-hot transient (block x K fp32 per loop step,
    times B under vmap) outgrows its win — the 10k-superpixel batch would
    materialise gigabytes — so large label spaces keep the exact gather.
    """
    node_planes = jnp.asarray(node_planes)
    K, C = node_planes.shape
    H, W = segments.shape
    if K > 2048:
        return node_planes[segments]
    flat = segments.reshape(-1)
    n = flat.shape[0]
    blk = min(block, n)
    nb = -(-n // blk)
    pad = nb * blk - n
    flat = jnp.pad(flat, (0, pad))
    p = node_planes.astype(jnp.float32)

    def body(i, out):
        idx = jax.lax.dynamic_slice_in_dim(flat, i * blk, blk)
        vals = jax.nn.one_hot(idx, K, dtype=jnp.float32) @ p
        return jax.lax.dynamic_update_slice_in_dim(out, vals, i * blk, 0)

    out = jax.lax.fori_loop(0, nb, body,
                            jnp.zeros((nb * blk, C), jnp.float32))
    return out[:n].reshape(H, W, C).astype(node_planes.dtype)


def probs_to_trimap(probs: jnp.ndarray, segments: jnp.ndarray,
                    threshold_fg: float = 0.55, threshold_bg: float = 0.55
                    ) -> np.ndarray:
    """Per-superpixel probabilities (N, 3) → pixel trimap (H, W) uint8."""
    node_labels = probs_to_node_trimap(probs, threshold_fg, threshold_bg)
    return np.asarray(project_to_pixels(node_labels, segments))
