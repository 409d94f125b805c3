"""Score checkpoint(s) on the dense posterior-agreement protocol.

The round-5 campaign's selection metric: per demo photo, project the
region posterior to pixels and compare against the reference pipeline's
own recovered posterior (tools/stage_swap.py recovers it from the demo
video) — post_mae / post_iou skip the bistable trimap→GrabCut stages and
have far lower run-to-run variance than the 3-photo mask IoU (PERF.md
round-4 honest readout: ±0.1+/photo).

  python tools/score_posterior.py --checkpoint a.msgpack[,b.msgpack...] \
      [--bg-connectivity] [--mask-iou] [--out-json results.jsonl]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import cv2  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="path or comma-separated paths (ensemble)")
    ap.add_argument("--name", type=str, default=None)
    ap.add_argument("--video", type=str, default="/root/reference/demo.mp4")
    ap.add_argument("--n-segments", type=int, default=500)
    ap.add_argument("--bg-connectivity", action="store_true")
    ap.add_argument("--mask-iou", action="store_true",
                    help="also run the full pipeline for mask agreement "
                         "(slower, noisier)")
    ap.add_argument("--out-json", type=str, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from gcn_grabcut_tpu.utils import setup_compilation_cache
    setup_compilation_cache()
    from stage_swap import collect_stages, resize_stages
    from demo_eval import iou
    from gcn_grabcut_tpu import (GCNGrabCutPipeline, SuperpixelGraphConfig,
                                 build_graph, project_to_pixels, CLASS_FG)
    from gcn_grabcut_tpu.train.checkpoints import load_model_auto

    stages = [resize_stages(s, 512) for s in collect_stages(args.video)]
    model, variables, meta = load_model_auto(args.checkpoint)
    cfg = SuperpixelGraphConfig(n_segments=args.n_segments,
                                bg_connectivity=args.bg_connectivity)
    pipe = GCNGrabCutPipeline(model, variables, sp_config=cfg)

    name = args.name or Path(args.checkpoint.split(",")[0]).stem
    post_maes, post_ious, mask_ious = [], [], []
    for i, st in enumerate(stages):
        rgb = cv2.cvtColor(st["input"], cv2.COLOR_BGR2RGB)
        graph = build_graph(rgb, cfg)
        probs = pipe.predict_probs(graph)
        pfg = project_to_pixels(probs[:, CLASS_FG].astype(np.float32),
                                np.asarray(graph.segments))
        post_maes.append(float(np.abs(pfg - st["p_fg"]).mean()))
        post_ious.append(float(iou(pfg > 0.5, st["p_fg"] > 0.5)))
        line = (f"[{name}] photo {i}: post_mae={post_maes[-1]:.4f} "
                f"post_iou={post_ious[-1]:.3f}")
        if args.mask_iou:
            res = pipe.segment(rgb, threshold_fg=0.65, threshold_bg=0.65,
                               filter_radius=4, ms_scales=(1.0, 0.75))
            mask_ious.append(float(iou(res.binary_mask > 0,
                                       st["mask"] > 0)))
            line += f" mask_iou={mask_ious[-1]:.3f}"
        print(line)

    rec = dict(name=name, ensemble=meta.get("ensemble_size", 1),
               bg_connectivity=bool(args.bg_connectivity),
               post_maes=post_maes, post_mae=float(np.mean(post_maes)),
               post_ious=post_ious, post_iou=float(np.mean(post_ious)))
    if mask_ious:
        rec.update(mask_ious=mask_ious, mean_iou=float(np.mean(mask_ious)))
    print(f"[{name}] post_mae={rec['post_mae']:.4f} "
          f"post_iou={rec['post_iou']:.3f}"
          + (f" mean_iou={rec['mean_iou']:.3f}" if mask_ious else ""))
    if args.out_json:
        with open(args.out_json, "a") as f:
            f.write(json.dumps(rec) + "\n")
    return rec


if __name__ == "__main__":
    main()
