"""Measure the device-resident batched pipeline at the headline config.

Times `segment_batch` (B x 512^2, 500 superpixels) end to end — upload,
fused graph build, model forward, trimap refine, batched GrabCut,
connected components, final pulls — warm, with per-stage breakdown.
This is the number PERF.md's "batched pipeline" row quotes; run it on an
idle chip (the shared chip's tenancy noise reaches ~50%, CLAUDE.md).

Usage: python tools/bench_pipeline.py [--batch 8] [--size 512] [--reps 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from gcn_grabcut_tpu.utils import setup_compilation_cache  # noqa: E402

setup_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--segments", type=int, default=500)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--checkpoint", type=str,
                    default="examples/flagship512_resgcn_d128.msgpack")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from gcn_grabcut_tpu import (GCNGrabCutPipeline, SuperpixelGraphConfig,
                                 load_model_from_checkpoint)
    from gcn_grabcut_tpu.data.dataset import make_photo_synthetic_dataset

    print(f"backend={jax.devices()[0]}  "
          f"B={args.batch} {args.size}^2 px, {args.segments} superpixels")

    samples = make_photo_synthetic_dataset(
        n=3 * args.batch + 4, size=args.size, seed=123)
    imgs = [s["image"] for s in samples]

    model, variables, _ = load_model_from_checkpoint(args.checkpoint)
    pipe = GCNGrabCutPipeline(
        model, variables,
        sp_config=SuperpixelGraphConfig(n_segments=args.segments))

    t0 = time.perf_counter()
    pipe.segment_batch(imgs[:args.batch], threshold_fg=0.65,
                       threshold_bg=0.65, filter_radius=4)
    print(f"compile+first batch: {time.perf_counter() - t0:.1f}s")

    best = None
    for rep in range(args.reps):
        chunk = imgs[(rep % 3) * args.batch:(rep % 3 + 1) * args.batch]
        t0 = time.perf_counter()
        pipe.segment_batch(chunk, threshold_fg=0.65,
                           threshold_bg=0.65, filter_radius=4)
        dt = time.perf_counter() - t0
        ips = args.batch / dt
        print(f"warm batch {rep}: {dt:.2f}s  ({ips:.2f} img/s)")
        best = ips if best is None else max(best, ips)
    print(f"best: {best:.2f} img/s")

    # Steady-state streaming throughput: cross-batch pipelining overlaps
    # batch i+1's upload + device program with batch i's packed pull.
    # Prime the lean (no-label-map) post-stage signature first so the
    # stream timing is compile-free.
    pipe.segment_batch(imgs[:args.batch], threshold_fg=0.65,
                       threshold_bg=0.65, filter_radius=4,
                       want_segments=False)
    n_stream = 3 * args.batch
    for rep in range(2):
        t0 = time.perf_counter()
        n_out = sum(1 for _ in pipe.segment_stream(
            imgs[:n_stream], batch_size=args.batch, threshold_fg=0.65,
            threshold_bg=0.65, filter_radius=4, want_segments=False))
        dt = time.perf_counter() - t0
        print(f"stream {rep} ({n_out} imgs, no label map): {dt:.2f}s  "
              f"({n_out / dt:.2f} img/s)")

    # One per-stage breakdown with stage-boundary syncs (slower overall —
    # the syncs serialise the stages — but each number is real device time).
    rs = pipe.segment_batch(imgs[:args.batch], threshold_fg=0.65,
                            threshold_bg=0.65, filter_radius=4,
                            sync_timing=True)
    stages = " ".join(f"{k}={v:.2f}" for k, v in rs[0].timing.items())
    print(f"synced stage breakdown: {stages}")


if __name__ == "__main__":
    main()
