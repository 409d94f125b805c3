"""End-to-end automatic segmentation pipeline: image → binary mask.

Counterpart of reference src/gcn_grabcut/pipeline.py:239-380, orchestrating:
  1. superpixel graph construction (+ automatic FG/BG prior) — fused jit
  2. GCN inference → per-region class posteriors
  3. edge-aware trimap projection (guided filter) — on-device
  4. GrabCut refinement (GMM + parallel min-cut) — on-device
  5. connected-component clean-up

Every stage is timed into `SegmentationResult.timing` exactly as the
reference does (pipeline.py:294-342).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core.graph import (
    TRIMAP_BG, TRIMAP_FG, TRIMAP_PROB_BG, TRIMAP_PROB_FG, CLASS_BG, CLASS_FG,
)
from .graph_build import SuperpixelGraphConfig, RegionGraph, build_graph
from .grabcut import GrabCut, GrabCutConfig
from .metrics import evaluate, evaluate_trimap
from .models.factory import (
    apply_model, probs_to_node_trimap, project_to_pixels, project_planes,
)
from .ops import image as im
from .ops.connected import clean_mask


@dataclasses.dataclass
class SegmentationResult:
    """All outputs from one pipeline run (reference pipeline.py:32-68)."""
    image: np.ndarray          # original RGB
    binary_mask: np.ndarray    # (H, W) uint8 {0, 1}
    trimap: np.ndarray         # (H, W) uint8 {0,1,2,3}
    segments: np.ndarray       # (H, W) superpixel map
    overlay: np.ndarray        # RGB with coloured overlay
    rgba: np.ndarray           # RGBA transparent background
    timing: dict = dataclasses.field(default_factory=dict)

    def show(self) -> None:
        """Display input | trimap | overlay panels (blocks until keypress).

        Requires a display; headless environments should use save().
        """
        import cv2
        panel = np.concatenate([
            cv2.resize(cv2.cvtColor(self.image, cv2.COLOR_RGB2BGR),
                       (256, 256)),
            cv2.resize(cv2.cvtColor(colour_trimap(self.trimap),
                                    cv2.COLOR_RGB2BGR), (256, 256)),
            cv2.resize(cv2.cvtColor(self.overlay, cv2.COLOR_RGB2BGR),
                       (256, 256)),
        ], axis=1)
        cv2.imshow("Input | Trimap | Result", panel)
        cv2.waitKey(0)
        cv2.destroyAllWindows()

    def save(self, prefix: str = "result") -> None:
        import cv2
        cv2.imwrite(f"{prefix}_overlay.png",
                    cv2.cvtColor(self.overlay, cv2.COLOR_RGB2BGR))
        cv2.imwrite(f"{prefix}_rgba.png",
                    cv2.cvtColor(self.rgba, cv2.COLOR_RGBA2BGRA))
        cv2.imwrite(f"{prefix}_trimap_colour.png",
                    cv2.cvtColor(colour_trimap(self.trimap),
                                 cv2.COLOR_RGB2BGR))
        cv2.imwrite(f"{prefix}_mask.png", self.binary_mask * 255)
        print(f"Saved outputs with prefix: {prefix}")

    def evaluate_against(self, gt_mask: np.ndarray):
        return evaluate(self.binary_mask, gt_mask), \
            evaluate_trimap(self.trimap, gt_mask)


def colour_trimap(trimap: np.ndarray) -> np.ndarray:
    vis = np.zeros((*trimap.shape, 3), np.uint8)
    vis[trimap == TRIMAP_BG] = [0, 0, 0]
    vis[trimap == TRIMAP_FG] = [255, 255, 255]
    vis[trimap == TRIMAP_PROB_BG] = [60, 20, 20]
    vis[trimap == TRIMAP_PROB_FG] = [0, 200, 200]
    return vis


def refine_trimap(probs: np.ndarray, segments: np.ndarray, image: np.ndarray,
                  threshold_fg: float = 0.55, threshold_bg: float = 0.55,
                  radius: int = 8, eps: float = 1e-3) -> np.ndarray:
    """Edge-aware trimap: project P(BG)/P(FG) to pixels, guided-filter them
    under the grey image, then threshold (reference pipeline.py:103-146).

    Boundaries land on intensity edges instead of superpixel borders.
    """
    # Upload the image in its native uint8 (the float cast happens on
    # device): a host-side float32 conversion quadruples the h2d bytes.
    return np.asarray(_refine_trimap_jit(
        jnp.asarray(probs), jnp.asarray(segments), jnp.asarray(image),
        jnp.float32(threshold_fg), jnp.float32(threshold_bg), radius, eps))


@functools.partial(jax.jit, static_argnames=("radius", "eps"))
def _refine_trimap_jit(probs, segments, image, threshold_fg, threshold_bg,
                       radius: int, eps: float):
    gray = im.rgb_to_gray(image.astype(jnp.float32)) / 255.0

    p_bg = project_to_pixels(probs[:, CLASS_BG].astype(jnp.float32), segments)
    p_fg = project_to_pixels(probs[:, CLASS_FG].astype(jnp.float32), segments)

    p_bg = jnp.clip(im.guided_filter(gray, p_bg, radius, eps), 0.0, 1.0)
    p_fg = jnp.clip(im.guided_filter(gray, p_fg, radius, eps), 0.0, 1.0)

    trimap = jnp.where(p_fg > p_bg, TRIMAP_PROB_FG, TRIMAP_PROB_BG)
    trimap = jnp.where(p_bg >= threshold_bg, TRIMAP_BG, trimap)
    trimap = jnp.where(p_fg >= threshold_fg, TRIMAP_FG, trimap)
    return trimap.astype(jnp.uint8)


def seed_from_prior(trimap: np.ndarray, graph: RegionGraph,
                    seed_frac: float = 0.1) -> np.ndarray:
    """Guarantee both FG and BG seeds exist: promote the highest-prior
    superpixels to the missing probable side (reference pipeline.py:149-186).
    """
    prior = graph.prior
    if prior is None or prior.size == 0:
        return trimap

    has_fg = np.isin(trimap, (TRIMAP_FG, TRIMAP_PROB_FG)).any()
    has_bg = np.isin(trimap, (TRIMAP_BG, TRIMAP_PROB_BG)).any()
    if has_fg and has_bg:
        return trimap

    n_valid = max(int(graph.node_mask.sum()), 1)
    n_seed = max(1, int(round(seed_frac * n_valid)))
    trimap = trimap.copy()

    # Mask out empty clusters from the ranking.
    score = np.where(graph.node_mask > 0, prior[:, 0], -1.0)
    if not has_fg:
        ids = np.argsort(score)[::-1][:n_seed]
        trimap[np.isin(graph.segments, ids)] = TRIMAP_PROB_FG
    score_bg = np.where(graph.node_mask > 0, prior[:, 1], -1.0)
    if not has_bg:
        ids = np.argsort(score_bg)[::-1][:n_seed]
        trimap[np.isin(graph.segments, ids)] = TRIMAP_PROB_BG
    return trimap


def _slice_graph_batch(batch, b: int):
    """View graph `b` of a stacked GraphBatch as a 1-graph batch (a device
    slice — no host transfer)."""
    return jax.tree_util.tree_map(lambda a: a[b:b + 1], batch)


def _batch_budget() -> int:
    from .grabcut import BATCH_SOLVE_PIXEL_BUDGET
    return BATCH_SOLVE_PIXEL_BUDGET


def _apply_large_any(model, variables, graph):
    """apply_large for plain or ensemble variables.  The banded-SpMM path
    builds per-member plans, so ensemble members loop on the host (the
    large path is per-image already; M extra dispatches, not M extra
    compiles) and merge as mean class probability, log'd like
    factory._apply_eval_ensemble_jit."""
    from .models.large import apply_large
    from .models.factory import is_ensemble, _ENSEMBLE_KEY
    if not is_ensemble(variables):
        return apply_large(model, variables, graph)
    stacked = variables[_ENSEMBLE_KEY]
    n_members = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    acc = None
    for m in range(n_members):
        member = jax.tree_util.tree_map(lambda a: a[m], stacked)
        p = jax.nn.softmax(
            apply_large(model, member, graph).astype(jnp.float32), -1)
        acc = p if acc is None else acc + p
    return jnp.log(acc / n_members + 1e-9)


@functools.partial(jax.jit, static_argnames=("filter_radius",))
def _trimap_stage_device(probs, segments, grays, priors, node_masks,
                         thr_fg, thr_bg, filter_radius: int,
                         seed_frac: float = 0.1):
    """Edge-aware trimap refinement + prior seeding as ONE module-level jit.

    Module-level so repeated `segment_batch` calls hit the jit cache (a
    per-call closure retraces every time), with the thresholds as traced
    scalars (no retrace when a caller sweeps them) and only the filter
    radius static (it changes the box-filter program shape).

    All four per-node planes this stage projects to pixels — P(BG), P(FG)
    and the two prior-rank seed masks of `_seed_from_prior_device` — ride
    ONE blocked one-hot-matmul projection (`project_planes`): separate
    per-plane gathers at 512² were the stage's dominant cost.
    """
    from .models.factory import project_planes

    def node_side(p, prior, nm):
        n_valid = jnp.maximum(jnp.sum(nm), 1.0)
        n_seed = jnp.maximum(
            1, jnp.round(seed_frac * n_valid)).astype(jnp.int32)

        def seed_mask(score):
            s = jnp.where(nm > 0, score, -1.0)
            kth = jnp.sort(s)[::-1][jnp.minimum(n_seed - 1, s.shape[0] - 1)]
            return (s >= kth).astype(jnp.float32)

        return jnp.stack(
            [p[:, CLASS_BG].astype(jnp.float32),
             p[:, CLASS_FG].astype(jnp.float32),
             seed_mask(prior[:, 0]), seed_mask(prior[:, 1])], axis=-1)

    packed = jax.vmap(node_side)(probs, priors, node_masks)    # (B, K, 4)
    px = jax.vmap(project_planes)(packed, segments)            # (B, H, W, 4)
    return jax.vmap(
        lambda px1, gray: _threshold_and_seed(px1, gray, thr_fg, thr_bg,
                                              filter_radius))(px, grays)


def _threshold_and_seed(px1, gray, thr_fg, thr_bg, filter_radius: int):
    """(H, W, 4) planes [P(BG), P(FG), seed_fg, seed_bg] → uint8 trimap.
    Shared by the single-scale and multi-scale trimap stages."""
    p_bg = jnp.clip(im.guided_filter(
        gray, px1[..., 0], filter_radius, 1e-3), 0, 1)
    p_fg = jnp.clip(im.guided_filter(
        gray, px1[..., 1], filter_radius, 1e-3), 0, 1)
    tri = jnp.where(p_fg > p_bg, TRIMAP_PROB_FG, TRIMAP_PROB_BG)
    tri = jnp.where(p_bg >= thr_bg, TRIMAP_BG, tri)
    tri = jnp.where(p_fg >= thr_fg, TRIMAP_FG, tri)
    tri = tri.astype(jnp.uint8)
    # seed_from_prior, branchless (reference pipeline.py:149-186): when
    # a probable side is missing entirely, promote the ~seed_frac
    # highest-prior regions to it.
    has_fg = jnp.any((tri == TRIMAP_FG) | (tri == TRIMAP_PROB_FG))
    has_bg = jnp.any((tri == TRIMAP_BG) | (tri == TRIMAP_PROB_BG))
    tri = jnp.where(has_fg, tri,
                    jnp.where(px1[..., 2] > 0,
                              jnp.uint8(TRIMAP_PROB_FG), tri))
    tri = jnp.where(has_bg, tri,
                    jnp.where(px1[..., 3] > 0,
                              jnp.uint8(TRIMAP_PROB_BG), tri))
    return tri


@functools.partial(jax.jit, static_argnames=("out_hw",))
def _project_probs_device(probs, segments, out_hw: tuple):
    """(B, K, 3) probs + (B, h, w) segments → (B, H, W, 2) pixel planes
    [P(BG), P(FG)], bilinearly upsampled to `out_hw` when the graph was
    built at a reduced scale (the multi-scale path)."""
    pk = jnp.stack([probs[..., CLASS_BG], probs[..., CLASS_FG]],
                   axis=-1).astype(jnp.float32)
    px = jax.vmap(project_planes)(pk, segments)
    if px.shape[1:3] != tuple(out_hw):
        px = jax.image.resize(px, (px.shape[0], *out_hw, 2), "linear")
    return px


@functools.partial(jax.jit, static_argnames=("hw",))
def _resize_batch_device(rgbs, hw: tuple):
    """Bilinear batch resize on device (multi-scale path)."""
    return jax.image.resize(rgbs, (rgbs.shape[0], *hw, 3), "linear")


@functools.partial(jax.jit, static_argnames=("filter_radius",))
def _trimap_stage_ms_device(px_stack, grays, priors, node_masks, segments,
                            thr_fg, thr_bg, filter_radius: int,
                            seed_frac: float = 0.1):
    """Multi-scale trimap stage: `px_stack` is (S, B, H, W, 2) per-scale
    pixel probability planes (scale 0 = full resolution); they are averaged
    and thresholded exactly like the single-scale stage.  Prior seed masks
    come from the full-resolution graph."""
    px_mean = jnp.mean(px_stack, axis=0)                       # (B, H, W, 2)

    def seed_planes(prior, nm):
        n_valid = jnp.maximum(jnp.sum(nm), 1.0)
        n_seed = jnp.maximum(
            1, jnp.round(seed_frac * n_valid)).astype(jnp.int32)

        def seed_mask(score):
            s = jnp.where(nm > 0, score, -1.0)
            kth = jnp.sort(s)[::-1][jnp.minimum(n_seed - 1, s.shape[0] - 1)]
            return (s >= kth).astype(jnp.float32)

        return jnp.stack([seed_mask(prior[:, 0]), seed_mask(prior[:, 1])],
                         axis=-1)

    seeds_k = jax.vmap(seed_planes)(priors, node_masks)        # (B, K, 2)
    seeds_px = jax.vmap(project_planes)(seeds_k, segments)     # (B, H, W, 2)
    px = jnp.concatenate([px_mean, seeds_px], axis=-1)
    return jax.vmap(
        lambda px1, gray: _threshold_and_seed(px1, gray, thr_fg, thr_bg,
                                              filter_radius))(px, grays)


@functools.partial(jax.jit, static_argnames=("keep_largest",
                                             "want_segments"))
def _post_stage_device(masks, trimaps, segments, min_area,
                       keep_largest: bool, want_segments: bool = True,
                       pfg=None):
    """Batched component clean-up + output packing as one jit.

    Returns one (B, bytes) uint8 buffer so the batch's entire output rides
    ONE host transfer, bit-packed for the ~40 MB/s tunnel: the binary mask
    is 1 bit/px, the 4-label trimap 2 bits/px, and the optional label map
    two bytes/px (K < 65536).  At 512² that is 98 KB/image without the
    label map (vs 1 MB unpacked) — the d2h pull stops being a pipeline
    stage.  `_unpack_post_host` is the inverse."""
    from .ops.connected import _clean_mask_jit
    if pfg is not None:
        # Posterior-coherence-gated keep-largest (ops/connected.py).
        cleaned = jax.vmap(
            lambda m, p: _clean_mask_jit(m, min_area, keep_largest, p)
        )(masks, pfg)
    else:
        cleaned = jax.vmap(
            lambda m: _clean_mask_jit(m, min_area, keep_largest))(masks)
    B, H, W = masks.shape
    hw = H * W

    def pack_planar(a, n_planes, bits):
        # Planar layout: plane i holds pixels [i·n, (i+1)·n) and lands in
        # bit-slot i·bits of each byte.  Every op stays on (B, n) arrays
        # with a long minor axis — a (B, hw/8, 8) "8 bits per byte" layout
        # put the 8-wide group on the lane dimension and cost ~1.5 s of
        # relayouts at 8x512² on this backend.
        flat = jnp.pad(a.reshape(B, hw).astype(jnp.int32),
                       ((0, 0), (0, (-hw) % n_planes)))
        planes = flat.reshape(B, n_planes, -1)
        byte = planes[:, 0, :]
        for i in range(1, n_planes):
            byte = byte | (planes[:, i, :] << (i * bits))
        return byte.astype(jnp.uint8)

    mask_bits = pack_planar(cleaned, 8, 1)
    tri2 = pack_planar(trimaps, 4, 2)

    parts = [mask_bits, tri2]
    if want_segments:
        seg16 = segments.astype(jnp.uint16).reshape(B, hw)
        parts += [(seg16 & 0xFF).astype(jnp.uint8),
                  (seg16 >> 8).astype(jnp.uint8)]
    return jnp.concatenate(parts, axis=-1)


def _unpack_post_host(packed: np.ndarray, H: int, W: int,
                      want_segments: bool):
    """Host-side inverse of `_post_stage_device`'s bit packing."""
    B = packed.shape[0]
    hw = H * W
    n8, n4 = -(-hw // 8), -(-hw // 4)

    def unpack_planar(byte, n_planes, bits):
        n = byte.shape[1]
        out = np.empty((B, n_planes * n), np.uint8)
        lo_mask = (1 << bits) - 1
        for i in range(n_planes):
            out[:, i * n:(i + 1) * n] = (byte >> (i * bits)) & lo_mask
        return out[:, :hw].reshape(B, H, W)

    masks = unpack_planar(packed[:, :n8], 8, 1)
    off = n8
    trimaps = unpack_planar(packed[:, off:off + n4], 4, 2)
    off += n4
    segments = None
    if want_segments:
        lo = packed[:, off:off + hw].astype(np.int32)
        hi = packed[:, off + hw:off + 2 * hw].astype(np.int32)
        segments = (lo | (hi << 8)).reshape(B, H, W)
    return masks, trimaps, segments


class GCNGrabCutPipeline:
    """Full GCN-GrabCut segmentation pipeline (reference pipeline.py:239-352).

    Parameters
    ----------
    model     : a flax trimap model (ResGCNNet / GCNTrimapNet / GATTrimapNet)
    variables : its {"params", "batch_stats"} variables
    sp_config : SuperpixelGraphConfig
    gc_config : GrabCutConfig
    """

    def __init__(self, model, variables,
                 sp_config: Optional[SuperpixelGraphConfig] = None,
                 gc_config: Optional[GrabCutConfig] = None):
        self.model = model
        self.variables = variables
        self.sp_config = sp_config or SuperpixelGraphConfig()
        self.gc_config = gc_config or GrabCutConfig()

    # Above this many superpixels the GCN forward switches from the dense
    # N x N adjacency to the banded-SpMM large-graph path (models/large.py)
    # — the dense matrices at 10k+ nodes cost O(N^2) memory per layer.
    LARGE_NODE_THRESHOLD = 2048

    def predict_probs(self, graph: RegionGraph) -> np.ndarray:
        if (graph.n_nodes > self.LARGE_NODE_THRESHOLD
                and (getattr(self.model, "supports_spmm_aggregators", False)
                     or getattr(self.model, "supports_banded_attention",
                                False))):
            logits = _apply_large_any(self.model, self.variables,
                                      graph.graph)
        else:
            logits = apply_model(self.model, self.variables, graph.graph,
                                 train=False)
        return np.asarray(
            jax.nn.softmax(logits.astype(jnp.float32), axis=-1))[0]

    def segment(self, image: np.ndarray,
                threshold_fg: float = 0.55, threshold_bg: float = 0.55,
                refine_iters: int = 0, min_area_ratio: float = 0.002,
                keep_largest: bool = False, edge_aware: bool = True,
                filter_radius: int = 8,
                ms_scales: tuple | None = None) -> SegmentationResult:
        """Image in → mask out, fully automatic."""
        # The default configuration (edge-aware trimap, no extra refine
        # rounds) runs through the device-resident batched program at B=1:
        # graph build → forward → trimap → GrabCut → clean-up with a single
        # host pull at the end (PERF.md: the per-stage pulls dominated the
        # scalar path).  Large images take the same route — segment_batch
        # swaps the dense stacked forward for the per-image banded-SpMM
        # path above LARGE_NODE_THRESHOLD.
        # An explicit backend="native" keeps the classic staged path below
        # (its GrabCut honours the C++ host solver); "auto"/"device" take
        # the fused device program.
        if (edge_aware and refine_iters == 0
                and self.gc_config.backend != "native"):
            return self.segment_batch(
                [image], threshold_fg=threshold_fg,
                threshold_bg=threshold_bg, min_area_ratio=min_area_ratio,
                keep_largest=keep_largest, filter_radius=filter_radius,
                ms_scales=ms_scales)[0]

        timing: dict = {}

        t = time.perf_counter()
        graph = build_graph(image, self.sp_config)
        timing["graph_build"] = time.perf_counter() - t

        t = time.perf_counter()
        probs = self.predict_probs(graph)
        if edge_aware:
            trimap = refine_trimap(probs, graph.segments, image,
                                   threshold_fg, threshold_bg,
                                   radius=filter_radius)
        else:
            node_labels = np.asarray(probs_to_node_trimap(
                jnp.asarray(probs), threshold_fg, threshold_bg))
            trimap = node_labels[graph.segments]
        timing["gcn_inference"] = time.perf_counter() - t

        # Without a user to correct it, a one-sided trimap must be repaired.
        trimap = seed_from_prior(trimap, graph)

        t = time.perf_counter()
        gc = GrabCut(image, self.gc_config)
        binary_mask = gc.run_with_trimap(trimap)
        if refine_iters > 0:
            binary_mask = gc.refine(refine_iters)
        timing["grabcut"] = time.perf_counter() - t

        t = time.perf_counter()
        post = (probs[:, CLASS_FG].astype(np.float32)[graph.segments]
                if keep_largest else None)
        cleaned = clean_mask(binary_mask, min_area_ratio, keep_largest,
                             posterior=post)
        if not np.array_equal(cleaned, binary_mask):
            binary_mask = cleaned
            gc.mask = np.where(binary_mask == 1, TRIMAP_PROB_FG,
                               TRIMAP_PROB_BG).astype(np.uint8)
        timing["postprocess"] = time.perf_counter() - t

        return SegmentationResult(
            image=image, binary_mask=binary_mask, trimap=trimap,
            segments=graph.segments, overlay=gc.overlay_mask(),
            rgba=gc.crop_foreground(), timing=timing)

    def segment_batch(self, images: list[np.ndarray],
                      threshold_fg: float = 0.55, threshold_bg: float = 0.55,
                      min_area_ratio: float = 0.002,
                      keep_largest: bool = False,
                      filter_radius: int = 8,
                      want_segments: bool = True,
                      ms_scales: tuple | None = None,
                      sync_timing: bool = False) -> list[SegmentationResult]:
        """Segment a batch of same-size images, device-resident end to end.

        One vmapped fused graph build, one stacked (B, N, F) model forward
        (the per-graph attention readout stays per-image by construction),
        vmapped trimap refinement, prior seeding, GrabCut and component
        clean-up — arrays never leave the device until the final bit-packed
        pull (the tunnel-attached chip moves host data at ~40 MB/s, so
        intermediate pulls dominated this path before).  The
        batched-inference configuration (BASELINE configs[2]).

        `want_segments=False` drops the superpixel label map from the
        output transfer (2 of its 2.375 bytes/px) for throughput paths
        that only consume masks/trimaps; `result.segments` is then None.
        """
        handle = self._dispatch_batch(
            images, threshold_fg=threshold_fg, threshold_bg=threshold_bg,
            min_area_ratio=min_area_ratio, keep_largest=keep_largest,
            filter_radius=filter_radius, want_segments=want_segments,
            sync_timing=sync_timing, ms_scales=ms_scales)
        return self._finalize_batch(handle)

    def segment_stream(self, images, batch_size: int = 8,
                       threshold_fg: float = 0.55, threshold_bg: float = 0.55,
                       min_area_ratio: float = 0.002,
                       keep_largest: bool = False,
                       filter_radius: int = 8,
                       want_segments: bool = True,
                       ms_scales: tuple | None = None):
        """Generator over SegmentationResults with cross-batch pipelining.

        Keeps two batches in flight: batch i+1's upload and device program
        are dispatched (asynchronously) before batch i's packed output is
        pulled, so host↔device transfers ride under device compute instead
        of serialising with it — the steady-state throughput mode for bulk
        evaluation and serving.  The final partial chunk is padded to
        `batch_size` by repetition (one compile signature) and the padding
        dropped from the yielded results.
        """
        images = list(images)
        if not images:
            return
        pending: list = []
        for start in range(0, len(images), batch_size):
            chunk = images[start:start + batch_size]
            n_real = len(chunk)
            chunk = chunk + [chunk[-1]] * (batch_size - n_real)
            handle = self._dispatch_batch(
                chunk, threshold_fg=threshold_fg, threshold_bg=threshold_bg,
                min_area_ratio=min_area_ratio, keep_largest=keep_largest,
                filter_radius=filter_radius, want_segments=want_segments,
                sync_timing=False, ms_scales=ms_scales)
            pending.append((handle, n_real))
            if len(pending) > 1:
                h, n = pending.pop(0)
                yield from self._finalize_batch(h)[:n]
        for h, n in pending:
            yield from self._finalize_batch(h)[:n]

    def _dispatch_batch(self, images, threshold_fg, threshold_bg,
                        min_area_ratio, keep_largest, filter_radius,
                        want_segments, sync_timing, ms_scales=None):
        """Upload + dispatch every device stage; no output pull (the
        returned handle's `packed` is a live device array)."""
        from .core.graph import make_graph_batch
        from .graph_build import build_graph_batch_arrays
        from .grabcut import grabcut_batch_device, run_batch_with_trimaps

        assert images, "empty batch"
        H, W = images[0].shape[:2]
        assert all(x.shape[:2] == (H, W) for x in images), \
            "segment_batch requires same-size images (resize upstream)"
        B = len(images)

        # The stacked forward uses the dense (B, N, N) adjacency; above the
        # large-graph threshold that is O(N^2) memory per layer, so the
        # forward stage below switches to the per-image banded-SpMM path
        # (models/large.py) — every other stage is K-agnostic and stays
        # batched + device-resident.
        from .graph_build import num_nodes_for
        large = num_nodes_for(H, W, self.sp_config) > self.LARGE_NODE_THRESHOLD
        timing: dict = {}

        # Stages dispatch asynchronously and only the final packed pull
        # synchronises, so the per-stage wall clocks below measure dispatch,
        # not device time, unless `sync_timing` forces a (tiny scalar) pull
        # at each boundary — the accurate-breakdown mode the reference's
        # per-stage printout corresponds to (reference pipeline.py:294-342).
        def _sync(x):
            if sync_timing:
                float(jnp.ravel(x)[0])   # block until the stage's work ran
        t = time.perf_counter()
        rgbs = jnp.asarray(np.stack(images)).astype(jnp.float32)
        out = build_graph_batch_arrays(rgbs, self.sp_config)
        batch = make_graph_batch(
            x=out["x"], edge_src=out["edge_src"], edge_dst=out["edge_dst"],
            edge_attr=out["edge_attr"], node_mask=out["node_mask"],
            edge_mask=out["edge_mask"], node_area=out["node_area"])
        _sync(out["x"])
        timing["graph_build"] = time.perf_counter() - t

        t = time.perf_counter()
        if large and (getattr(self.model, "supports_spmm_aggregators", False)
                      or getattr(self.model, "supports_banded_attention",
                                 False)):
            logits = jnp.concatenate([
                _apply_large_any(self.model, self.variables,
                                 _slice_graph_batch(batch, b))
                for b in range(B)], axis=0)
        else:
            logits = apply_model(self.model, self.variables, batch,
                                 train=False)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        segments = out["segments"]

        grays = im.rgb_to_gray(rgbs) / 255.0
        if ms_scales is not None and len(ms_scales) > 1 and not large:
            # Multi-scale inference (no reference counterpart): rebuild the
            # graph and re-run the forward at reduced scales, average the
            # pixel-projected class planes, threshold once at full
            # resolution.  Objects mis-sized for one superpixel budget are
            # often recovered at another.
            assert ms_scales[0] == 1.0, "ms_scales[0] must be 1.0"
            px_full = _project_probs_device(probs, segments, (H, W))
            px_list = [px_full]
            for sc in ms_scales[1:]:
                hs = max(int(round(H * sc)), 64)
                ws = max(int(round(W * sc)), 64)
                rgb_s = _resize_batch_device(rgbs, (hs, ws))
                out_s = build_graph_batch_arrays(rgb_s, self.sp_config)
                batch_s = make_graph_batch(
                    x=out_s["x"], edge_src=out_s["edge_src"],
                    edge_dst=out_s["edge_dst"], edge_attr=out_s["edge_attr"],
                    node_mask=out_s["node_mask"],
                    edge_mask=out_s["edge_mask"],
                    node_area=out_s["node_area"])
                logits_s = apply_model(self.model, self.variables, batch_s,
                                       train=False)
                probs_s = jax.nn.softmax(logits_s.astype(jnp.float32),
                                         axis=-1)
                px_list.append(_project_probs_device(
                    probs_s, out_s["segments"], (H, W)))
            trimaps = _trimap_stage_ms_device(
                jnp.stack(px_list), grays, out["prior"], out["node_mask"],
                segments, jnp.float32(threshold_fg),
                jnp.float32(threshold_bg), filter_radius)
            # Same plane the thresholds see: the scale-averaged P(FG).
            pfg_px = jnp.mean(jnp.stack(px_list), axis=0)[..., 1]
        else:
            trimaps = _trimap_stage_device(
                probs, segments, grays, out["prior"], out["node_mask"],
                jnp.float32(threshold_fg), jnp.float32(threshold_bg),
                filter_radius)
            pfg_px = (_project_probs_device(probs, segments, (H, W))[..., 1]
                      if keep_largest else None)
        _sync(trimaps)
        timing["gcn_inference"] = time.perf_counter() - t

        t = time.perf_counter()
        if B * H * W <= _batch_budget():
            masks = grabcut_batch_device(rgbs, trimaps, self.gc_config)
        else:
            masks = jnp.asarray(run_batch_with_trimaps(
                np.stack(images), np.asarray(trimaps), self.gc_config))
        _sync(masks)
        timing["grabcut"] = time.perf_counter() - t

        t = time.perf_counter()
        min_area = jnp.float32(min_area_ratio * H * W)
        # Bit-packed single-buffer output (see _post_stage_device); the
        # pull itself happens in _finalize_batch so segment_stream can
        # overlap it with the next batch's device work.
        packed = _post_stage_device(masks, trimaps, segments, min_area,
                                    keep_largest, want_segments,
                                    pfg_px if keep_largest else None)
        _sync(packed)
        timing["postprocess"] = time.perf_counter() - t
        return {"packed": packed, "images": images, "H": H, "W": W,
                "want_segments": want_segments, "timing": timing}

    def _finalize_batch(self, handle) -> list[SegmentationResult]:
        """Pull the batch's packed device buffer (the one d2h transfer)
        and assemble SegmentationResults."""
        timing = dict(handle["timing"])
        t = time.perf_counter()
        packed = np.asarray(handle["packed"])
        masks_np, trimaps_np, segments_np = _unpack_post_host(
            packed, handle["H"], handle["W"], handle["want_segments"])
        timing["postprocess"] = timing.get("postprocess", 0.0) + (
            time.perf_counter() - t)

        results = []
        tint = np.array([0, 220, 100], np.float32)
        for b, image in enumerate(handle["images"]):
            mask = masks_np[b]
            binary = mask[..., None].astype(np.float32)
            overlay = np.clip(image * (1 - 0.45 * binary)
                              + tint * 0.45 * binary, 0, 255).astype(
                                  np.uint8)
            rgba = np.concatenate(
                [image, (mask * 255)[..., None]], axis=-1).astype(np.uint8)
            results.append(SegmentationResult(
                image=image, binary_mask=mask, trimap=trimaps_np[b],
                segments=None if segments_np is None else segments_np[b],
                overlay=overlay, rgba=rgba, timing=dict(timing)))
        return results

    def segment_bbox(self, image: np.ndarray,
                     bbox: tuple[int, int, int, int]) -> SegmentationResult:
        """Classical bbox GrabCut baseline (reference pipeline.py:354-380)."""
        import cv2
        gc = GrabCut(image, self.gc_config)
        binary_mask = gc.run_with_bbox(bbox)

        x, y, w, h = bbox
        H, W = image.shape[:2]
        trimap = np.full((H, W), TRIMAP_PROB_BG, np.uint8)
        trimap[y:y + h, x:x + w] = TRIMAP_PROB_FG
        inner = np.zeros((H, W), np.uint8)
        inner[y:y + h, x:x + w] = 1
        inner = cv2.erode(inner, np.ones((30, 30), np.uint8))
        trimap[inner == 1] = TRIMAP_FG

        return SegmentationResult(
            image=image, binary_mask=binary_mask, trimap=trimap,
            segments=np.zeros((H, W), np.int32), overlay=gc.overlay_mask(),
            rgba=gc.crop_foreground())
