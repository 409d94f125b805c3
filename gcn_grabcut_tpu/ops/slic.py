"""SLIC superpixels as a fixed-iteration, fixed-shape JAX kernel.

The reference calls scikit-image's Cython SLIC (reference:
src/gcn_grabcut/graph_builder.py:177-188), which returns a *variable* number
of labels and post-processes connectivity on the host.  That shape dynamism
is hostile to XLA, so this implementation makes one deliberate design change:

* Cluster seeds live on a fixed ``gh x gw`` grid chosen from the requested
  ``n_segments`` — the label space is exactly ``K = gh * gw`` and **static**.
  Clusters that end up empty simply become masked graph nodes downstream.
* Each pixel restricts its assignment search to the 3x3 grid neighbourhood of
  its home cell (the gSLICr/SNIC search strategy) — 9 candidate clusters per
  pixel, fully vectorised over the image, no data-dependent control flow.
* A fixed number of assign/update iterations (k-means in LABXY space with
  the standard compactness metric D^2 = d_lab^2 + (d_xy * m / S)^2).
* Connectivity clean-up is a fixed number of local mode-filter sweeps that
  absorb stray single pixels; because candidates never leave the 3x3 cell
  neighbourhood, fragments are local by construction.

Everything here is jit-compatible with static shapes, and `vmap`s over a
batch of images.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def grid_shape(h: int, w: int, n_segments: int) -> tuple[int, int]:
    """Choose a seed grid (gh, gw) with gh*gw ≈ n_segments, cells ~square."""
    step = math.sqrt(h * w / max(n_segments, 1))
    gh = max(1, round(h / step))
    gw = max(1, round(w / step))
    return gh, gw


@functools.partial(jax.jit, static_argnames=("n_segments", "n_iter",
                                             "compactness", "smooth_sigma"))
def slic(lab: jnp.ndarray, n_segments: int = 300, compactness: float = 10.0,
         n_iter: int = 10, smooth_sigma: float = 1.0) -> jnp.ndarray:
    """Segment `lab` (H, W, 3) into at most K = gh*gw superpixels.

    Returns (H, W) int32 labels in [0, K).  K is `slic_num_labels(...)` —
    static, derived only from the image shape and `n_segments`.
    """
    H, W, _ = lab.shape
    gh, gw = grid_shape(H, W, n_segments)
    K = gh * gw
    # Per-axis steps (cells need not be exactly square).
    sy, sx = H / gh, W / gw
    s_avg = math.sqrt(sy * sx)

    lab = lab.astype(jnp.float32)
    if smooth_sigma > 0:
        lab = _gaussian_blur(lab, smooth_sigma)

    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)

    # Seed centers at cell midpoints: (gh, gw, 5) = [L, a, b, y, x]
    cy = (jnp.arange(gh, dtype=jnp.float32) + 0.5) * sy
    cx = (jnp.arange(gw, dtype=jnp.float32) + 0.5) * sx
    cyx = jnp.stack(jnp.meshgrid(cy, cx, indexing="ij"), axis=-1)  # (gh,gw,2)
    seed_y = jnp.clip(cyx[..., 0].astype(jnp.int32), 0, H - 1)
    seed_x = jnp.clip(cyx[..., 1].astype(jnp.int32), 0, W - 1)
    seed_lab = lab[seed_y, seed_x]                                  # (gh,gw,3)
    centers = jnp.concatenate([seed_lab, cyx], axis=-1)             # (gh,gw,5)

    # Home cell per pixel — a *static* block partition: every pixel of row
    # band i maps to cell row i, so the pixel↔cell exchange in both
    # directions is a pair of tiny one-hot matmuls per axis instead of
    # per-pixel gathers/scatters (TPU has no fast gather; this keeps the
    # whole k-means loop on the MXU/VPU).
    base_cy = jnp.clip((yy[:, 0] / sy).astype(jnp.int32), 0, gh - 1)  # (H,)
    base_cx = jnp.clip((xx[0, :] / sx).astype(jnp.int32), 0, gw - 1)  # (W,)
    oh_y = (base_cy[:, None] == jnp.arange(gh)[None, :]).astype(
        jnp.float32)                                                # (H, gh)
    oh_x = (base_cx[:, None] == jnp.arange(gw)[None, :]).astype(
        jnp.float32)                                                # (W, gw)
    hi = jax.lax.Precision.HIGHEST   # exact fp32 copies through the MXU

    inv_s2 = (compactness / s_avg) ** 2
    offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    BIG = jnp.float32(1e9)           # sentinel centre → infinite distance

    def up_sample(grids):
        """(gh, gw, C) cell values → (H, W, C) per-pixel values."""
        C = grids.shape[-1]
        t = jnp.einsum("hg,gwc->hwc", oh_y,
                       grids, precision=hi)                 # (H, gw, C)
        return jnp.einsum("Ww,hwc->hWc", oh_x, t,
                          precision=hi)                     # (H, W, C)

    def down_sum(field):
        """(H, W, C) per-pixel values → (gh, gw, C) per-home-cell sums."""
        t = jnp.einsum("hg,hwc->gwc", oh_y, field, precision=hi)
        return jnp.einsum("wW,gwc->gWc", oh_x, t, precision=hi)

    def shifted_centers(centers):
        """(gh, gw, 9, 5): candidate centre for each cell and offset,
        out-of-grid candidates replaced by the BIG sentinel."""
        cs = []
        for dy, dx in offsets:
            cp = jnp.pad(centers, ((1, 1), (1, 1), (0, 0)),
                         constant_values=BIG)
            cs.append(jax.lax.slice(
                cp, (1 + dy, 1 + dx, 0), (1 + dy + gh, 1 + dx + gw, 5)))
        return jnp.stack(cs, axis=2)                        # (gh, gw, 9, 5)

    def assign(centers):
        """Label each pixel with the best of its 9 candidate clusters.
        Returns (labels, choice) where choice ∈ [0, 9) is the offset index."""
        cand = shifted_centers(centers).reshape(gh, gw, 45)
        c = up_sample(cand).reshape(H, W, 9, 5)             # (H, W, 9, 5)
        d_lab = jnp.sum((lab[:, :, None, :] - c[..., :3]) ** 2, axis=-1)
        d_xy = ((yy[..., None] - c[..., 3]) ** 2
                + (xx[..., None] - c[..., 4]) ** 2)
        d = d_lab + d_xy * inv_s2                           # (H, W, 9)
        choice = jnp.argmin(d, axis=-1).astype(jnp.int32)
        # label = (home_y + dy(choice)) * gw + home_x + dx(choice)
        dys = jnp.asarray([o[0] for o in offsets], jnp.int32)[choice]
        dxs = jnp.asarray([o[1] for o in offsets], jnp.int32)[choice]
        lbl = ((base_cy[:, None] + dys) * gw + (base_cx[None, :] + dxs))
        return lbl, choice

    def update(choice):
        """Recompute cluster means in LABXY space (masked for empties).

        Per-label sums via the block structure: pixels choosing offset o
        contribute to cell home+o, so sum per home cell under each offset
        mask (one matmul pair for all 9 masks at once), then shift-add the
        partial grids."""
        feats = jnp.concatenate(
            [lab, yy[..., None], xx[..., None],
             jnp.ones((H, W, 1), jnp.float32)], axis=-1)    # (H, W, 6)
        sel = (choice[..., None] == jnp.arange(9)[None, None, :])
        masked = (feats[:, :, None, :]
                  * sel[..., None].astype(jnp.float32))     # (H, W, 9, 6)
        part = down_sum(masked.reshape(H, W, 54)).reshape(gh, gw, 9, 6)
        total = jnp.zeros((gh, gw, 6), jnp.float32)
        for o, (dy, dx) in enumerate(offsets):
            # home cell h contributed to cell h + (dy, dx): shift the
            # partial grid forward and accumulate.
            pp = jnp.pad(part[:, :, o, :], ((1, 1), (1, 1), (0, 0)))
            total = total + jax.lax.slice(
                pp, (1 - dy, 1 - dx, 0), (1 - dy + gh, 1 - dx + gw, 6))
        cnts = total[..., 5]
        means = total[..., :5] / jnp.maximum(cnts, 1.0)[..., None]
        return means, cnts

    def body(i, centers):
        _, choice = assign(centers)
        means, cnts = update(choice)
        keep = (cnts > 0)[..., None]
        return jnp.where(keep, means, centers)

    centers = jax.lax.fori_loop(0, n_iter, body, centers)
    labels, _ = assign(centers)
    labels = _absorb_orphans(labels, n_sweeps=4)
    labels = enforce_connectivity(labels, K)
    return labels


def slic_num_labels(h: int, w: int, n_segments: int) -> int:
    gh, gw = grid_shape(h, w, n_segments)
    return gh * gw


def _absorb_orphans(labels: jnp.ndarray, n_sweeps: int = 2) -> jnp.ndarray:
    """Local connectivity clean-up: a pixel none of whose 4-neighbours share
    its label adopts the most frequent neighbouring label.  Removes the
    single-pixel speckle the 9-candidate assignment can leave behind (the
    role of skimage's enforce_connectivity post-pass, at fixed shape)."""
    H, W = labels.shape

    def neighbours(lb):
        up = jnp.concatenate([lb[:1], lb[:-1]], axis=0)
        dn = jnp.concatenate([lb[1:], lb[-1:]], axis=0)
        lf = jnp.concatenate([lb[:, :1], lb[:, :-1]], axis=1)
        rt = jnp.concatenate([lb[:, 1:], lb[:, -1:]], axis=1)
        return up, dn, lf, rt

    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    parity = (yy + xx) % 2

    def half_sweep(lb, phase):
        up, dn, lf, rt = neighbours(lb)
        same = ((up == lb) | (dn == lb) | (lf == lb) | (rt == lb))
        # Majority vote among the 4 neighbours (ties → up/down preference).
        nbrs = [up, dn, lf, rt]
        counts = [sum((n == cand).astype(jnp.int32) for n in nbrs)
                  for cand in nbrs]
        best = nbrs[0]
        best_c = counts[0]
        for cand, c in zip(nbrs[1:], counts[1:]):
            take = c > best_c
            best = jnp.where(take, cand, best)
            best_c = jnp.where(take, c, best_c)
        # Checkerboard update: only one parity class moves per half-sweep,
        # so fixes cannot re-orphan the pixels that were just repaired.
        move = jnp.logical_not(same) & (parity == phase)
        return jnp.where(move, best, lb)

    def sweep(_, lb):
        lb = half_sweep(lb, 0)
        return half_sweep(lb, 1)

    return jax.lax.fori_loop(0, n_sweeps, sweep, labels)


def enforce_connectivity(labels: jnp.ndarray, k: int,
                         max_sweeps: int = 64) -> jnp.ndarray:
    """Make every SLIC label a single connected region.

    skimage's SLIC does this on the host as a post-pass; here it runs
    on-device at fixed shape: (1) connected components of the label map by
    min-index propagation, (2) for each label keep its largest component,
    (3) pixels in minor fragments iteratively adopt a neighbouring
    main-component label (checkerboard sweeps until fixpoint).
    """
    H, W = labels.shape
    hw = H * W

    idx = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
           + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1))

    def neighbours(a, fill):
        up = jnp.concatenate([a[:1] * 0 + fill, a[:-1]], axis=0)
        dn = jnp.concatenate([a[1:], a[-1:] * 0 + fill], axis=0)
        lf = jnp.concatenate([a[:, :1] * 0 + fill, a[:, :-1]], axis=1)
        rt = jnp.concatenate([a[:, 1:], a[:, -1:] * 0 + fill], axis=1)
        return up, dn, lf, rt

    # 1. components: min linear index reachable through equal labels.
    # Each while iteration batches `unroll` propagation steps: the update
    # is monotone (min), so extra steps after convergence are no-ops and
    # the fixpoint is unchanged.  Rationale: each iteration carries
    # ~0.5-4 ms of tunnel dispatch on top of its compute (CLAUDE.md;
    # same pattern as ops/maxflow.py's unroll=4).  Measured neutral
    # within tenancy noise at 1536²/10k (PERF.md follow-up 7) — the
    # build's dominator lies elsewhere — kept for dispatch-bound links.
    unroll = 4

    def cc_step(comp):
        new = comp
        for nb_c, nb_l in zip(neighbours(comp, hw),
                              neighbours(labels, -1)):
            new = jnp.minimum(new, jnp.where(nb_l == labels, nb_c, hw))
        return new

    def cc_body(state):
        comp, _, it = state
        new = comp
        for _ in range(unroll):
            new = cc_step(new)
        return new, jnp.any(new < comp), it + 1

    comp, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < max_sweeps),
        cc_body, (idx, jnp.bool_(True), jnp.int32(0)))

    # 2. component sizes → per-label main component.
    flat_comp = comp.reshape(-1)
    sizes = jax.ops.segment_sum(jnp.ones(hw, jnp.float32), flat_comp,
                                num_segments=hw)
    comp_size = sizes[flat_comp].reshape(H, W)
    # Encode (size, -comp) so ties go to the smaller component id.
    score = comp_size * hw - comp.astype(jnp.float32)
    label_best = jax.ops.segment_max(score.reshape(-1),
                                     labels.reshape(-1), num_segments=k)
    minor = score < label_best[labels]

    # 3. minor pixels adopt a neighbouring major label.
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    parity = (yy + xx) % 2

    def absorb_body(state):
        lab, minor, _, it = state
        new_lab, new_minor = lab, minor
        # Two full checkerboard sweeps (4 phases) per while iteration —
        # absorption only shrinks the minor set, so batched sweeps keep
        # the fixpoint while quartering the per-iteration dispatch tax.
        for phase in (0, 1, 0, 1):
            cand_l = neighbours(new_lab, -1)
            cand_m = neighbours(new_minor, True)
            take_l = jnp.full_like(new_lab, -1)
            for nl, nm in zip(cand_l, cand_m):
                ok = jnp.logical_not(nm) & (nl >= 0)
                take_l = jnp.where((take_l < 0) & ok, nl, take_l)
            move = new_minor & (take_l >= 0) & (parity == phase)
            new_lab = jnp.where(move, take_l, new_lab)
            new_minor = new_minor & jnp.logical_not(move)
        changed = jnp.any(new_minor != minor)
        return new_lab, new_minor, changed, it + 1

    labels, minor, _, _ = jax.lax.while_loop(
        lambda s: s[2] & (s[3] < max_sweeps),
        absorb_body, (labels, minor, jnp.bool_(True), jnp.int32(0)))
    return labels


def _gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian pre-smoothing (SLIC's `sigma` parameter)."""
    radius = max(1, int(3 * sigma + 0.5))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    k = k / jnp.sum(k)

    def conv_axis(a, axis):
        pad = [(0, 0)] * a.ndim
        pad[axis] = (radius, radius)
        ap = jnp.pad(a, pad, mode="reflect")
        out = jnp.zeros_like(a)
        for i in range(2 * radius + 1):
            out = out + k[i] * jax.lax.slice_in_dim(
                ap, i, i + a.shape[axis], axis=axis)
        return out

    return conv_axis(conv_axis(img, 0), 1)
