"""Per-region (superpixel) statistics and node-feature assembly.

The reference computes every region reduction as a ``np.bincount`` counting
pass over the label map (reference: src/gcn_grabcut/graph_builder.py:190-226)
and assembles the 16-d node feature layout at graph_builder.py:228-255.  Here
the same O(HW) reductions are ``segment_sum`` scatters with a *static* number
of segments K, so they fuse into the jit'd graph-build pipeline.

Feature layout (identical contract to the reference docstring,
graph_builder.py:11-22):
  [0:3]  mean LAB   [3:6] std LAB   [6:9] mean HSV
  [9]    centroid y (normalised)    [10]  centroid x (normalised)
  [11]   area ratio                 [12]  isoperimetric ratio (clipped 0..1)
  [13]   mean gradient / 255        [14]  boundary-pixel ratio
  [15]   centre distance / 0.707

Colour statistics are min-max normalised per image over *valid* regions
(empty clusters are masked out of the min/max, which the ragged reference
never needed to consider).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.graph import N_IMAGE_FEATS


def region_reduce(segments: jnp.ndarray, planes: jnp.ndarray, k: int
                  ) -> jnp.ndarray:
    """Sum each of C image planes over regions: (H, W, C) → (K, C)."""
    flat = segments.reshape(-1)
    vals = planes.reshape(-1, planes.shape[-1])
    return jax.ops.segment_sum(vals, flat, num_segments=k)


def region_statistics(segments: jnp.ndarray, lab: jnp.ndarray,
                      hsv: jnp.ndarray, grad: jnp.ndarray, k: int) -> dict:
    """All per-region reductions in two fused segment passes.

    Returns dict with counts, safe, area_ratio, mean_lab, std_lab, mean_hsv,
    centroids (normalised y/x), boundary_px, mean_grad, mean_grad_n —
    the same keys as reference `_region_statistics` (graph_builder.py:190-226).
    """
    H, W = segments.shape
    flat = segments.reshape(-1)

    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) / H
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) / W
    boundaries = region_boundaries(segments).astype(jnp.float32)
    grad_scaled = grad / (jnp.max(grad) + 1e-6)

    planes = jnp.concatenate([
        jnp.ones((H, W, 1), jnp.float32),   # 0: counts
        lab,                                 # 1:4
        lab ** 2,                            # 4:7
        hsv,                                 # 7:10
        yy[..., None], xx[..., None],        # 10, 11
        boundaries[..., None],               # 12
        grad[..., None],                     # 13
        grad_scaled[..., None],              # 14
    ], axis=-1)
    sums = region_reduce(segments, planes, k)          # (K, 15)

    counts = sums[:, 0]
    safe = jnp.maximum(counts, 1.0)
    mean_lab = sums[:, 1:4] / safe[:, None]
    sq_lab = sums[:, 4:7] / safe[:, None]
    std_lab = jnp.sqrt(jnp.maximum(sq_lab - mean_lab ** 2, 0.0))
    mean_hsv = sums[:, 7:10] / safe[:, None]
    centroids = jnp.stack([sums[:, 10] / safe, sums[:, 11] / safe], axis=1)
    boundary_px = sums[:, 12]
    mean_grad = sums[:, 13] / safe
    mean_grad_n = sums[:, 14] / safe

    return {
        "counts": counts,
        "safe": safe,
        "area_ratio": counts / float(H * W),
        "mean_lab": mean_lab,
        "std_lab": std_lab,
        "mean_hsv": mean_hsv,
        "centroids": centroids,
        "boundary_px": boundary_px,
        "mean_grad": mean_grad,
        "mean_grad_n": mean_grad_n,
        "valid": (counts > 0).astype(jnp.float32),
    }


def region_boundaries(segments: jnp.ndarray) -> jnp.ndarray:
    """Inner region boundaries: pixels with a 4-neighbour of another label.

    jnp stencil replacement for skimage.find_boundaries(mode="inner")
    (reference graph_builder.py:211)."""
    lb = segments
    up = jnp.concatenate([lb[:1], lb[:-1]], axis=0)
    dn = jnp.concatenate([lb[1:], lb[-1:]], axis=0)
    lf = jnp.concatenate([lb[:, :1], lb[:, :-1]], axis=1)
    rt = jnp.concatenate([lb[:, 1:], lb[:, -1:]], axis=1)
    return (up != lb) | (dn != lb) | (lf != lb) | (rt != lb)


def assemble_node_features(st: dict) -> jnp.ndarray:
    """(K, 16) node features in the reference layout, masked normalisation.

    Mirrors graph_builder.py:228-255, with per-image min-max of the colour
    channels computed over valid regions only.
    """
    k = st["counts"].shape[0]
    valid = st["valid"]

    perimeter = jnp.maximum(st["boundary_px"], 1.0)
    iso = jnp.clip((4 * jnp.pi * st["counts"]) / (perimeter ** 2), 0.0, 1.0)
    centre_dist = jnp.linalg.norm(st["centroids"] - 0.5, axis=1) / 0.707

    feats = jnp.concatenate([
        st["mean_lab"],                       # 0:3
        st["std_lab"],                        # 3:6
        st["mean_hsv"],                       # 6:9
        st["centroids"],                      # 9:11 (y, x)
        st["area_ratio"][:, None],            # 11
        iso[:, None],                         # 12
        (st["mean_grad"] / 255.0)[:, None],   # 13
        (st["boundary_px"] / st["safe"])[:, None],  # 14
        centre_dist[:, None],                 # 15
    ], axis=1)

    # Per-image min-max on mean/std LAB over valid regions.
    def minmax_norm(cols):
        big = 1e30
        v = valid[:, None]
        mn = jnp.min(jnp.where(v > 0, cols, big), axis=0)
        mx = jnp.max(jnp.where(v > 0, cols, -big), axis=0)
        return (cols - mn) / (mx - mn + 1e-6)

    feats = feats.at[:, 0:3].set(minmax_norm(feats[:, 0:3]))
    feats = feats.at[:, 3:6].set(minmax_norm(feats[:, 3:6]))
    feats = jnp.nan_to_num(feats, nan=0.0, posinf=1.0, neginf=0.0)
    # Zero out padded/empty regions entirely.
    return feats * valid[:, None]
