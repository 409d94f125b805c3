"""Connected-component labelling + small-component mask clean-up in JAX.

Replaces cv2.connectedComponentsWithStats (reference:
src/gcn_grabcut/pipeline.py:189-227) with iterative min-label propagation —
every sweep is an 8-neighbour min stencil, run under `lax.while_loop` until
fixpoint, so it stays on-device with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEIGHBOURS_8 = ((-1, -1), (-1, 0), (-1, 1), (0, -1),
                 (0, 1), (1, -1), (1, 0), (1, 1))
_NEIGHBOURS_4 = ((-1, 0), (0, -1), (0, 1), (1, 0))


def _shift(a, dy, dx, fill):
    # Slice-of-padded (not roll + border writes): pad/slice fuse into the
    # consuming min, where each roll lowers to its own kernel.
    H, W = a.shape
    ap = jnp.pad(a, 1, constant_values=fill)
    return jax.lax.slice(ap, (1 - dy, 1 - dx), (1 - dy + H, 1 - dx + W))


def _segmented_min_scan(lab, is_bg, axis, reverse):
    """Min-scan of `lab` along `axis` that restarts at background pixels —
    propagates the component min across an entire foreground run in one
    O(log n) associative scan instead of one pixel per sweep."""
    def comb(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, jnp.minimum(av, bv)), ar | br

    v, _ = jax.lax.associative_scan(comb, (lab, is_bg), axis=axis,
                                    reverse=reverse)
    return v


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def connected_components(mask: jnp.ndarray, connectivity: int = 8,
                         max_iters: int = 512) -> jnp.ndarray:
    """Label connected True-regions of `mask`; background gets label H*W.

    Returns (H, W) int32 — each component is labelled by the minimum linear
    index it contains.  Each sweep is one 8-neighbour min stencil (which
    alone carries diagonal-only links) followed by four segmented min-scans
    (left/right/up/down), so labels cross whole pixel runs per sweep; the
    sweep count is bounded by the component's number of "turns", not its
    diameter.  On-device fixpoint detection."""
    H, W = mask.shape
    bg = jnp.int32(H * W)
    nbrs = _NEIGHBOURS_8 if connectivity == 8 else _NEIGHBOURS_4

    idx = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
           + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1))
    labels0 = jnp.where(mask, idx, bg)
    is_bg = ~mask

    def body(state):
        lab, _, it = state
        new = lab
        for dy, dx in nbrs:
            new = jnp.minimum(new, _shift(lab, dy, dx, bg))
        new = jnp.where(mask, new, bg)
        for axis in (1, 0):
            for reverse in (False, True):
                new = _segmented_min_scan(new, is_bg, axis, reverse)
        new = jnp.where(mask, new, bg)
        return new, jnp.any(new < lab), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.bool_(True), jnp.int32(0)))
    return labels


#: keep-largest coherence gate: a runner-up component survives when its
#: mean posterior is at least this fraction of the winner's.  Diagnosis on
#: the reference-demo photos (round 5): when the posterior fragments, the
#: runner-up components are usually *correct object parts* with mean P(FG)
#: close to the winner's (0.73-0.85 vs 0.90 measured; 98-100 % inside the
#: reference mask), while genuine noise blobs sit near the decision
#: threshold — so believability is relative mean posterior, not relative
#: mass (a mass-ratio gate deletes correct parts: the demo photos' correct
#: runner-ups carry only 9-25 % of the winner's mass).
KEEP_LARGEST_CONF_GATE = 0.75


@functools.partial(jax.jit, static_argnames=("keep_largest",))
def _clean_mask_jit(mask: jnp.ndarray, min_area: jnp.ndarray,
                    keep_largest: bool,
                    posterior: jnp.ndarray | None = None) -> jnp.ndarray:
    H, W = mask.shape
    labels = connected_components(mask > 0, connectivity=8)
    flat = labels.reshape(-1)
    clamped = jnp.minimum(flat, H * W - 1)
    valid_px = (flat < H * W).astype(jnp.float32)
    sizes = jax.ops.segment_sum(valid_px, clamped, num_segments=H * W)
    comp_size = sizes[clamped].reshape(H, W)
    comp_size = jnp.where(labels < H * W, comp_size, 0.0)

    # The min-area path (also the keep-largest coherence fallback):
    # components below min_area are dropped — never all of them
    # (reference pipeline.py:222-226 keeps the largest).
    keep_minarea = comp_size >= min_area
    any_kept = jnp.any(keep_minarea)
    largest_sz = jnp.max(comp_size)
    keep_minarea = jnp.where(any_kept, keep_minarea,
                             (comp_size >= largest_sz) & (comp_size > 0))

    if not keep_largest:
        return keep_minarea.astype(jnp.uint8)

    # "Largest object", not "largest component": a frame / vignette /
    # letterbox misclassified as FG forms a component that hugs the
    # image border, and picking it drops the actual subject (the
    # reference's +0.015 from keep-largest assumes the subject IS the
    # largest component, README.md:600-602).  Components occupying a
    # large fraction of the border perimeter are frame-like — demote
    # them, unless nothing else exists (a legitimately cropped subject
    # touches the border only along part of it).
    on_border = jnp.zeros((H, W), jnp.float32)
    on_border = on_border.at[0, :].set(1.0).at[-1, :].set(1.0)
    on_border = on_border.at[:, 0].set(1.0).at[:, -1].set(1.0)
    border_cnt = jax.ops.segment_sum(
        on_border.reshape(-1) * valid_px, clamped, num_segments=H * W)
    perimeter = jnp.float32(2 * (H + W) - 4)
    frame_like = (border_cnt[clamped].reshape(H, W) / perimeter) > 0.3
    eff_size = jnp.where(frame_like, 0.0, comp_size)
    has_non_frame = jnp.any(eff_size > 0)
    score = jnp.where(has_non_frame, eff_size, comp_size)
    largest = jnp.max(score)
    keep = (score >= largest) & (score > 0)

    if posterior is None:
        return keep.astype(jnp.uint8)

    # Posterior-coherence gate: a runner-up component as *believable* as
    # the winner (mean posterior ≥ KEEP_LARGEST_CONF_GATE × winner's) is a
    # fragmented piece of the subject, not noise — keep it (subject to the
    # min-area floor so confident specks still go).
    pmass = jax.ops.segment_sum(
        posterior.reshape(-1).astype(jnp.float32) * valid_px,
        clamped, num_segments=H * W)
    pmass_px = jnp.where(labels < H * W,
                         pmass[clamped].reshape(H, W), 0.0)
    mean_p = pmass_px / jnp.maximum(comp_size, 1.0)
    winner_mean = jnp.max(jnp.where(keep, mean_p, 0.0))
    confident = ((eff_size > 0) & ~keep
                 & (mean_p >= KEEP_LARGEST_CONF_GATE * winner_mean)
                 & (comp_size >= min_area))
    return (keep | confident).astype(jnp.uint8)


def clean_mask(mask, min_area_ratio: float = 0.002,
               keep_largest: bool = False, posterior=None):
    """Remove spurious connected components from a binary mask.

    Mirrors reference `clean_mask` (pipeline.py:189-227): components smaller
    than `min_area_ratio` of the image are dropped (never all of them — the
    largest survives), or only the largest is kept.  With `posterior`
    (an (H, W) foreground-probability map), keep-largest is gated on
    posterior coherence (see KEEP_LARGEST_CONF_GATE).
    """
    import numpy as np
    mask = np.asarray(mask)
    if mask.sum() == 0 or (min_area_ratio <= 0 and not keep_largest):
        return mask
    post = None if posterior is None else jnp.asarray(posterior)
    out = _clean_mask_jit(jnp.asarray(mask),
                          jnp.float32(min_area_ratio * mask.size),
                          keep_largest, post)
    return np.asarray(out)
