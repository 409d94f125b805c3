"""Stage-swap attribution vs the reference pipeline on its own demo photos.

The reference demo video (/root/reference/demo.mp4, rendered by
tools/make_demo.py) shows, for every real photo, all five stage panels of
the REFERENCE pipeline (make_demo.py:165-215):

  (a) input photo                         → the head-to-head input
  (c) foreground posterior                → gray = 255·(1 − clip(P(FG),0,1))
      (make_demo.py:176-179: the RAW region posterior projected to pixels,
      before the guided filter)
  (d) trimap                              → gray ∈ {245, 200, 110, 40} for
      {BG_DEF, BG_PROB, FG_PROB, FG_DEF} (make_demo.py:181-186)
  (e) final mask as a cutout              → recovered by inverting the
      compositing (tools/demo_eval.py)

Inverting (c), (d), (e) gives the reference's intermediate products, so the
0.485 end-to-end disagreement (PERF.md) can be DECOMPOSED per stage:

  posterior Δ   our P(FG) map        vs  their P(FG) map        (model stage)
  trimap Δ      our trimap           vs  their trimap           (+ refine)
  refine-swap   their trimap → OUR GrabCut+cleanup  vs  their final mask
                (isolates our refinement: if this is ~1, the whole gap is
                 upstream of GrabCut)
  end-to-end    our mask             vs  their mask             (baseline)

Usage:  python tools/stage_swap.py [--checkpoint …] [--ms-scales 1.0,0.75]
Writes a per-photo attribution table (markdown) and a qualitative grid.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import cv2  # noqa: E402
import numpy as np  # noqa: E402

from demo_eval import classify_stage, panel, content_box, iou  # noqa: E402

# Stage-(d) gray levels (make_demo.py:181-186) → trimap labels (cv2 space).
TRI_LEVELS = {245: 0, 200: 2, 110: 3, 40: 1}   # BG, PR_BG, PR_FG, FG


def collect_stage_sets(video: str):
    """Yield dicts {stage: panel_bgr} with all five stages per photo."""
    cap = cv2.VideoCapture(video)
    uniq, prev = [], None
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
    return [g for g in groups if all(k in g for k in range(5))]


def decode_reference_stages(group: dict):
    """(input_bgr, ref_posterior, ref_trimap, ref_mask) at content-box res."""
    a = panel(group[0])
    y0, y1, x0, x1 = content_box(a)
    crop = slice(y0, y1), slice(x0, x1)
    a_c = a[crop].astype(np.float32)

    # (c): gray = 255·(1 − P(FG))  →  P(FG) = 1 − gray/255
    c_gray = panel(group[2])[crop].astype(np.float32).mean(axis=2)
    posterior = np.clip(1.0 - c_gray / 255.0, 0.0, 1.0)

    # (d): nearest of the four quantisation levels (video compression
    # perturbs the grays by a few counts).
    d_gray = panel(group[3])[crop].astype(np.float32).mean(axis=2)
    levels = np.array(sorted(TRI_LEVELS), np.float32)        # [40,110,200,245]
    lab_of = np.array([TRI_LEVELS[int(v)] for v in levels], np.uint8)
    tri = lab_of[np.argmin(np.abs(d_gray[..., None] - levels), axis=-1)]

    # (e): invert the cutout compositing (demo_eval.py logic).
    e_c = panel(group[4])[crop].astype(np.float32)
    d_bg = np.abs(e_c - (0.93 * 255.0 + 0.07 * a_c)).mean(axis=2)
    d_fg = np.abs(e_c - a_c).mean(axis=2)
    mask = (d_fg < d_bg).astype(np.uint8)
    kernel = np.ones((5, 5), np.uint8)
    mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel)
    mask = cv2.morphologyEx(mask, cv2.MORPH_OPEN, kernel)

    return panel(group[0])[crop].copy(), posterior, tri, mask


def tri_fg(tri: np.ndarray) -> np.ndarray:
    """Binary foreground view of a 4-label trimap (FG ∪ PR_FG)."""
    return ((tri == 1) | (tri == 3)).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", type=str,
                    default="examples/flagship512_resgcn_d128.msgpack")
    ap.add_argument("--video", type=str, default="/root/reference/demo.mp4")
    ap.add_argument("--out", type=str, default="/tmp/stage_swap_grid.png")
    ap.add_argument("--n-segments", type=int, default=500)
    ap.add_argument("--threshold", type=float, default=0.65)
    ap.add_argument("--filter-radius", type=int, default=4)
    ap.add_argument("--max-size", type=int, default=512)
    ap.add_argument("--ms-scales", type=str, default="1.0,0.75")
    ap.add_argument("--keep-largest", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from gcn_grabcut_tpu.utils import setup_compilation_cache
    setup_compilation_cache()
    import jax.numpy as jnp
    from gcn_grabcut_tpu import (
        GCNGrabCutPipeline, SuperpixelGraphConfig, GrabCut, GrabCutConfig,
        build_graph, load_model_from_checkpoint, refine_trimap,
        seed_from_prior, clean_mask, project_to_pixels, CLASS_FG)

    ms_scales = (tuple(float(s) for s in args.ms_scales.split(","))
                 if args.ms_scales and args.ms_scales.lower() != "none"
                 else None)
    groups = collect_stage_sets(args.video)
    print(f"recovered {len(groups)} photos with all five stage panels")

    model, variables, _ = load_model_from_checkpoint(args.checkpoint)
    sp_cfg = SuperpixelGraphConfig(n_segments=args.n_segments)
    pipe = GCNGrabCutPipeline(model, variables, sp_config=sp_cfg)

    rows = []
    table = []
    for i, g in enumerate(groups):
        bgr, ref_post, ref_tri, ref_mask = decode_reference_stages(g)
        h, w = bgr.shape[:2]
        s = args.max_size / max(h, w)
        if s < 1.0:
            hw = (int(w * s), int(h * s))
            bgr = cv2.resize(bgr, hw, interpolation=cv2.INTER_AREA)
            ref_post = cv2.resize(ref_post, hw,
                                  interpolation=cv2.INTER_LINEAR)
            ref_tri = cv2.resize(ref_tri, hw,
                                 interpolation=cv2.INTER_NEAREST)
            ref_mask = cv2.resize(ref_mask, hw,
                                  interpolation=cv2.INTER_NEAREST)
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)

        # --- OUR stages (the scalar staged path, same protocol) ----------
        graph = build_graph(rgb, sp_cfg)
        probs = pipe.predict_probs(graph)
        our_post = np.asarray(project_to_pixels(
            jnp.asarray(probs[:, CLASS_FG].astype(np.float32)),
            jnp.asarray(graph.segments)))
        our_tri = refine_trimap(probs, graph.segments, rgb,
                                args.threshold, args.threshold,
                                radius=args.filter_radius)
        our_tri = seed_from_prior(our_tri, graph)
        res = pipe.segment(rgb, threshold_fg=args.threshold,
                           threshold_bg=args.threshold,
                           filter_radius=args.filter_radius,
                           keep_largest=args.keep_largest,
                           ms_scales=ms_scales)
        our_mask = res.binary_mask

        # --- refine-swap: THEIR trimap through OUR GrabCut + cleanup -----
        gc = GrabCut(rgb, GrabCutConfig())
        swap_mask = gc.run_with_trimap(ref_tri.copy())
        swap_mask = np.asarray(clean_mask(swap_mask, 0.002,
                                          args.keep_largest))

        m = {
            "posterior_mae": float(np.abs(our_post - ref_post).mean()),
            "posterior_iou": iou(our_post > 0.5, ref_post > 0.5),
            "trimap_agree": float((our_tri == ref_tri).mean()),
            "trimap_fg_iou": iou(tri_fg(our_tri) > 0,
                                 tri_fg(ref_tri) > 0),
            "refine_swap_iou": iou(swap_mask > 0, ref_mask > 0),
            "end_to_end_iou": iou(our_mask > 0, ref_mask > 0),
        }
        table.append(m)
        print(f"photo {i}: " + "  ".join(f"{k}={v:.3f}"
                                         for k, v in m.items()))

        def gg(x):   # grayscale → BGR panel
            return cv2.cvtColor((np.clip(x, 0, 1) * 255).astype(np.uint8),
                                cv2.COLOR_GRAY2BGR)

        def gt(t):   # trimap → gray levels like the demo
            lut = np.zeros(4, np.uint8)
            for g_, l_ in TRI_LEVELS.items():
                lut[l_] = g_
            return cv2.cvtColor(lut[t], cv2.COLOR_GRAY2BGR)

        row = np.concatenate([
            bgr, gg(ref_post), gg(our_post), gt(ref_tri), gt(our_tri),
            gg(ref_mask.astype(np.float32)), gg(swap_mask.astype(np.float32)),
            gg(our_mask.astype(np.float32))], axis=1)
        sc = 240 / row.shape[0]
        rows.append(cv2.resize(row, (int(row.shape[1] * sc), 240)))

    if rows:
        wmax = max(r.shape[1] for r in rows)
        rows = [cv2.copyMakeBorder(r, 0, 0, 0, wmax - r.shape[1],
                                   cv2.BORDER_CONSTANT, value=(255,) * 3)
                for r in rows]
        cv2.imwrite(args.out, np.concatenate(rows, axis=0))
        print(f"grid (input | refP | ourP | refT | ourT | refM | swapM | "
              f"ourM): {args.out}")

    keys = list(table[0].keys())
    print("\n| photo | " + " | ".join(keys) + " |")
    print("|---|" + "---|" * len(keys))
    for i, m in enumerate(table):
        print(f"| {i} | " + " | ".join(f"{m[k]:.3f}" for k in keys) + " |")
    print("| mean | " + " | ".join(
        f"{np.mean([m[k] for m in table]):.3f}" for k in keys) + " |")


if __name__ == "__main__":
    main()
