"""Render the 5-stage demo animation: input → superpixels → GCN posterior →
trimap → final mask (counterpart of reference tools/make_demo.py).

Writes an animated GIF (imageio) and, when ffmpeg is available, an MP4.

Evaluation settings documented here as in the reference
(make_demo.py:222-228): threshold 0.65, guided-filter radius 4,
500 superpixels, 512-px longest edge.

Usage:
  python tools/make_demo.py --checkpoint ckpt/best_model.msgpack \
      --input photo.jpg --out demo.gif
  python tools/make_demo.py --synthetic --out demo.gif   # untrained demo image
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import cv2
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--input", type=str, default=None)
    p.add_argument("--out", type=str, default="demo.gif")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--n-segments", type=int, default=500)
    p.add_argument("--max-size", type=int, default=512)
    p.add_argument("--threshold", type=float, default=0.65)
    p.add_argument("--filter-radius", type=int, default=4)
    p.add_argument("--seconds-per-stage", type=float, default=1.2)
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def _label(img, text):
    img = img.copy()
    cv2.rectangle(img, (0, 0), (img.shape[1], 28), (20, 20, 20), -1)
    cv2.putText(img, text, (8, 20), cv2.FONT_HERSHEY_SIMPLEX, 0.55,
                (255, 255, 255), 1, cv2.LINE_AA)
    return img


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    from gcn_grabcut_tpu import (
        build_model, init_model, build_graph, SuperpixelGraphConfig,
        GCNGrabCutPipeline, colour_trimap)
    from gcn_grabcut_tpu.models.factory import project_to_pixels

    if args.input:
        bgr = cv2.imread(args.input)
        if bgr is None:
            raise SystemExit(f"unreadable: {args.input}")
        img = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        H, W = img.shape[:2]
        s = args.max_size / max(H, W)
        if s < 1:
            img = cv2.resize(img, (int(W * s), int(H * s)))
    else:
        from gcn_grabcut_tpu.data.dataset import make_synthetic_dataset
        img = make_synthetic_dataset(n=1, size=min(args.max_size, 256),
                                     seed=5)[0]["image"]

    sp_cfg = SuperpixelGraphConfig(n_segments=args.n_segments)
    if args.checkpoint:
        from gcn_grabcut_tpu.train.checkpoints import load_model_auto
        model, variables, _ = load_model_auto(args.checkpoint)
    else:
        model = build_model("resgcn", hidden_channels=64, n_layers=3)
        g0 = build_graph(img, sp_cfg).graph
        variables = init_model(model, jax.random.PRNGKey(0), g0)
        print("[Demo] no checkpoint — using an untrained model")

    pipe = GCNGrabCutPipeline(model, variables, sp_cfg)
    graph = build_graph(img, sp_cfg)
    probs = pipe.predict_probs(graph)
    res = pipe.segment(img, threshold_fg=args.threshold,
                       threshold_bg=args.threshold,
                       filter_radius=args.filter_radius)

    # Stage frames -----------------------------------------------------
    seg = graph.segments
    bound = np.zeros_like(seg, bool)
    bound[1:, :] |= seg[1:, :] != seg[:-1, :]
    bound[:, 1:] |= seg[:, 1:] != seg[:, :-1]
    sp_vis = img.copy()
    sp_vis[bound] = [255, 255, 0]

    p_fg = np.asarray(project_to_pixels(probs[:, 2], seg))
    heat = cv2.applyColorMap((p_fg * 255).astype(np.uint8),
                             cv2.COLORMAP_JET)
    heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB)
    posterior = (0.55 * img + 0.45 * heat).astype(np.uint8)

    frames = [
        _label(img, "1/5 input"),
        _label(sp_vis, f"2/5 SLIC superpixels (K={graph.n_nodes})"),
        _label(posterior, "3/5 GCN foreground posterior"),
        _label(colour_trimap(res.trimap), "4/5 trimap (guided filter)"),
        _label(res.overlay, "5/5 GrabCut mask"),
    ]

    import imageio.v2 as imageio
    fps = 1.0 / args.seconds_per_stage
    imageio.mimsave(args.out, frames, duration=args.seconds_per_stage,
                    loop=0)
    print(f"[Demo] wrote {args.out}")
    mp4 = Path(args.out).with_suffix(".mp4")
    try:
        imageio.mimsave(str(mp4), frames, fps=max(fps, 1))
        print(f"[Demo] wrote {mp4}")
    except Exception as exc:  # ffmpeg may be absent
        print(f"[Demo] mp4 skipped: {exc}")
    return frames


if __name__ == "__main__":
    main()
