"""Real-image smoke evaluation against the reference's own demo output.

The reference repo ships no dataset, but its demo video
(/root/reference/demo.mp4, rendered by tools/make_demo.py) contains real
photos AND the reference pipeline's own segmentations: each image is shown
as five stage pages — (a) the input photo letterboxed into a 760x500 panel
at (28, 90) (make_demo.py:42-44, 59-95), and (e) a cutout where background
pixels are washed as 0.93*255 + 0.07*orig with a dark contour
(make_demo.py:194-199).  Inverting that compositing recovers the
reference's binary mask, giving a direct head-to-head on real images:

  our mask (this framework, same protocol)  vs  reference demo mask.

Usage:  python tools/demo_eval.py --checkpoint examples/flagship_resgcn_d128.msgpack
Writes a qualitative grid to --out (default /tmp/demo_eval_grid.png) and
prints per-image + mean IoU agreement.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import cv2  # noqa: E402
import numpy as np  # noqa: E402

MARGIN, HEAD_H = 28, 62
PANEL_W, PANEL_H = 760, 500
TOP = MARGIN + HEAD_H


def classify_stage(frame: np.ndarray) -> int:
    """Stage index 0..4 from the filled pager dots (make_demo.py:92-98)."""
    r, gap = 5, 18
    cx = MARGIN + PANEL_W - 4 * gap - r
    cy = MARGIN + 12
    filled = 0
    for k in range(5):
        px = frame[cy, cx + k * gap].astype(int)
        if px.sum() < 3 * 128:
            filled += 1
    return filled - 1


def panel(frame: np.ndarray) -> np.ndarray:
    return frame[TOP:TOP + PANEL_H, MARGIN:MARGIN + PANEL_W]


def content_box(img: np.ndarray) -> tuple[int, int, int, int]:
    """Bounding box of the letterboxed photo (non-white content)."""
    nonwhite = (img < 248).any(axis=2)
    ys, xs = np.nonzero(nonwhite)
    return ys.min(), ys.max() + 1, xs.min(), xs.max() + 1


def collect_images(video: str):
    """Yield (input_bgr, reference_mask) pairs from the demo video."""
    cap = cv2.VideoCapture(video)
    uniq = []
    prev = None
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        if prev is None or np.abs(fr.astype(int) - prev).mean() > 1.0:
            uniq.append(fr)
        prev = fr.astype(int)
    cap.release()

    groups, current = [], {}
    for fr in uniq:
        s = classify_stage(fr)
        if s == 0 and 0 in current:
            groups.append(current)
            current = {}
        current[s] = fr
    if current:
        groups.append(current)

    out = []
    for g in groups:
        if 0 not in g or 4 not in g:
            continue
        a = panel(g[0])
        e = panel(g[4])
        y0, y1, x0, x1 = content_box(a)
        a_c = a[y0:y1, x0:x1].astype(np.float32)
        e_c = e[y0:y1, x0:x1].astype(np.float32)
        # Invert the stage-(e) compositing: bg = 0.93*255 + 0.07*a.
        d_bg = np.abs(e_c - (0.93 * 255.0 + 0.07 * a_c)).mean(axis=2)
        d_fg = np.abs(e_c - a_c).mean(axis=2)
        mask = (d_fg < d_bg).astype(np.uint8)
        # The 2px contour and JPEG/GIF artefacts: morphological clean-up.
        kernel = np.ones((5, 5), np.uint8)
        mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel)
        mask = cv2.morphologyEx(mask, cv2.MORPH_OPEN, kernel)
        out.append((a[y0:y1, x0:x1].copy(), mask))
    return out


def iou(a, b):
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return inter / union if union else 1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", type=str,
                    default="examples/flagship512_resgcn_d128.msgpack",
                    help="checkpoint path, or comma-separated paths for an "
                         "inference ensemble (stack_variables)")
    ap.add_argument("--video", type=str, default="/root/reference/demo.mp4")
    ap.add_argument("--out", type=str, default="/tmp/demo_eval_grid.png")
    ap.add_argument("--n-segments", type=int, default=500)
    ap.add_argument("--bg-connectivity", action="store_true",
                    help="geodesic boundary-connectivity bg prior cue "
                         "(match the checkpoint's training setting)")
    ap.add_argument("--threshold", type=float, default=0.65)
    ap.add_argument("--filter-radius", type=int, default=4)
    ap.add_argument("--max-size", type=int, default=512)
    ap.add_argument("--ms-scales", type=str, default="1.0,0.75",
                    help="comma-separated inference scales (first 1.0); "
                         "default is the measured-best 1.0,0.75 "
                         "(PERF.md), 'none' disables")
    ap.add_argument("--keep-largest", action="store_true",
                    help="keep only the largest component (the reference "
                         "documents ~+0.015 IoU on single-object scenes, "
                         "README.md:600-602)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from gcn_grabcut_tpu.utils import setup_compilation_cache
    setup_compilation_cache()
    from gcn_grabcut_tpu import (GCNGrabCutPipeline, SuperpixelGraphConfig,
                                 load_model_from_checkpoint,
                                 load_ensemble_from_checkpoints)

    ms_scales = (tuple(float(s) for s in args.ms_scales.split(","))
                 if args.ms_scales and args.ms_scales.lower() != "none"
                 else None)
    pairs = collect_images(args.video)
    print(f"recovered {len(pairs)} (input, reference-mask) pairs")

    ckpts = args.checkpoint.split(",")
    if len(ckpts) > 1:
        model, variables, _ = load_ensemble_from_checkpoints(ckpts)
        print(f"ensemble of {len(ckpts)} checkpoints")
    else:
        model, variables, _ = load_model_from_checkpoint(ckpts[0])
    pipe = GCNGrabCutPipeline(
        model, variables,
        sp_config=SuperpixelGraphConfig(
            n_segments=args.n_segments,
            bg_connectivity=args.bg_connectivity))

    rows = []
    ious = []
    for i, (bgr, ref_mask) in enumerate(pairs):
        h, w = bgr.shape[:2]
        s = args.max_size / max(h, w)
        if s < 1.0:
            bgr_r = cv2.resize(bgr, (int(w * s), int(h * s)),
                               interpolation=cv2.INTER_AREA)
            ref_r = cv2.resize(ref_mask, (int(w * s), int(h * s)),
                               interpolation=cv2.INTER_NEAREST)
        else:
            bgr_r, ref_r = bgr, ref_mask
        rgb = cv2.cvtColor(bgr_r, cv2.COLOR_BGR2RGB)
        res = pipe.segment(rgb, threshold_fg=args.threshold,
                           threshold_bg=args.threshold,
                           filter_radius=args.filter_radius,
                           keep_largest=args.keep_largest,
                           ms_scales=ms_scales)
        v = iou(res.binary_mask > 0, ref_r > 0)
        ious.append(v)
        print(f"image {i}: IoU vs reference output = {v:.3f} "
              f"(ref fg {ref_r.mean():.3f}, ours {res.binary_mask.mean():.3f})")

        ref_vis = bgr_r.copy()
        ref_vis[ref_r == 0] = (0.9 * 255 + 0.1 * ref_vis[ref_r == 0]
                               ).astype(np.uint8)
        row = np.concatenate([
            bgr_r, ref_vis,
            cv2.cvtColor(res.overlay, cv2.COLOR_RGB2BGR)], axis=1)
        scale = 360 / row.shape[0]
        rows.append(cv2.resize(row, (int(row.shape[1] * scale), 360)))

    if rows:
        wmax = max(r.shape[1] for r in rows)
        rows = [cv2.copyMakeBorder(r, 0, 0, 0, wmax - r.shape[1],
                                   cv2.BORDER_CONSTANT, value=(255,) * 3)
                for r in rows]
        cv2.imwrite(args.out, np.concatenate(rows, axis=0))
        print(f"grid (input | reference cutout | ours): {args.out}")
    print(f"mean IoU agreement with reference output: "
          f"{np.mean(ious):.3f}  median {np.median(ious):.3f}")


if __name__ == "__main__":
    main()
