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
    apply_model, probs_to_node_trimap, project_to_pixels,
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
    probs = jnp.asarray(probs)
    segments = jnp.asarray(segments)
    gray = im.rgb_to_gray(jnp.asarray(image, jnp.float32)) / 255.0

    p_bg = project_to_pixels(probs[:, CLASS_BG].astype(jnp.float32), segments)
    p_fg = project_to_pixels(probs[:, CLASS_FG].astype(jnp.float32), segments)

    p_bg = jnp.clip(im.guided_filter(gray, p_bg, radius, eps), 0.0, 1.0)
    p_fg = jnp.clip(im.guided_filter(gray, p_fg, radius, eps), 0.0, 1.0)

    trimap = jnp.where(p_fg > p_bg, TRIMAP_PROB_FG, TRIMAP_PROB_BG)
    trimap = jnp.where(p_bg >= threshold_bg, TRIMAP_BG, trimap)
    trimap = jnp.where(p_fg >= threshold_fg, TRIMAP_FG, trimap)
    return np.asarray(trimap).astype(np.uint8)


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

    def predict_probs(self, graph: RegionGraph) -> np.ndarray:
        logits = apply_model(self.model, self.variables, graph.graph,
                             train=False)
        return np.asarray(
            jax.nn.softmax(logits.astype(jnp.float32), axis=-1))[0]

    def segment(self, image: np.ndarray,
                threshold_fg: float = 0.55, threshold_bg: float = 0.55,
                refine_iters: int = 0, min_area_ratio: float = 0.002,
                keep_largest: bool = False, edge_aware: bool = True,
                filter_radius: int = 8) -> SegmentationResult:
        """Image in → mask out, fully automatic."""
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
        cleaned = clean_mask(binary_mask, min_area_ratio, keep_largest)
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
                      filter_radius: int = 8) -> list[SegmentationResult]:
        """Segment a batch of same-size images as fused device programs.

        Graph builds share one compiled signature; the GCN forward runs
        once over the stacked (B, N, F) batch (the per-graph attention
        readout stays per-image by construction); trimap refinement and
        GrabCut are vmapped — the batched-inference configuration
        (BASELINE configs[2]).
        """
        from .core.graph import stack_graphs
        from .grabcut import run_batch_with_trimaps

        assert images, "empty batch"
        H, W = images[0].shape[:2]
        assert all(im.shape[:2] == (H, W) for im in images), \
            "segment_batch requires same-size images (resize upstream)"
        timing: dict = {}

        t = time.perf_counter()
        graphs = [build_graph(im, self.sp_config) for im in images]
        batch = stack_graphs([g.graph for g in graphs])
        timing["graph_build"] = time.perf_counter() - t

        t = time.perf_counter()
        logits = apply_model(self.model, self.variables, batch, train=False)
        probs = np.asarray(jax.nn.softmax(
            logits.astype(jnp.float32), axis=-1))
        segments = np.stack([g.segments for g in graphs])

        @jax.jit
        def refine_all(probs, segments, grays):
            def one(p, s, gray):
                p_bg = jnp.clip(im.guided_filter(
                    gray, p[:, CLASS_BG][s], filter_radius, 1e-3), 0, 1)
                p_fg = jnp.clip(im.guided_filter(
                    gray, p[:, CLASS_FG][s], filter_radius, 1e-3), 0, 1)
                tri = jnp.where(p_fg > p_bg, TRIMAP_PROB_FG, TRIMAP_PROB_BG)
                tri = jnp.where(p_bg >= threshold_bg, TRIMAP_BG, tri)
                tri = jnp.where(p_fg >= threshold_fg, TRIMAP_FG, tri)
                return tri.astype(jnp.uint8)
            return jax.vmap(one)(probs, segments, grays)

        grays = jnp.stack([
            im.rgb_to_gray(jnp.asarray(x, jnp.float32)) / 255.0
            for x in images])
        trimaps = np.asarray(refine_all(
            jnp.asarray(probs), jnp.asarray(segments), grays))
        timing["gcn_inference"] = time.perf_counter() - t

        trimaps = np.stack([
            seed_from_prior(trimaps[b], graphs[b])
            for b in range(len(images))])

        t = time.perf_counter()
        masks = run_batch_with_trimaps(
            np.stack(images), trimaps, self.gc_config)
        timing["grabcut"] = time.perf_counter() - t

        t = time.perf_counter()
        results = []
        for b, image in enumerate(images):
            mask = clean_mask(masks[b], min_area_ratio, keep_largest)
            binary = mask[..., None].astype(np.float32)
            tint = np.array([0, 220, 100], np.float32)
            overlay = np.clip(image * (1 - 0.45 * binary)
                              + tint * 0.45 * binary, 0, 255).astype(
                                  np.uint8)
            rgba = np.concatenate(
                [image, (mask * 255)[..., None]], axis=-1).astype(np.uint8)
            results.append(SegmentationResult(
                image=image, binary_mask=mask, trimap=trimaps[b],
                segments=segments[b], overlay=overlay, rgba=rgba,
                timing=dict(timing)))
        timing["postprocess"] = time.perf_counter() - t
        for r in results:
            r.timing["postprocess"] = timing["postprocess"]
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
