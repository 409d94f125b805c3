"""Benchmark the 10k+-superpixel configuration on the real TPU chip.

Image → blocked fused graph build (1536 px, ~10k SLIC segments) →
banded-SpMM ResGCNNet forward (models/large.py) → trimap → GrabCut.
This is the SURVEY §5.7 "long context" configuration; the reference caps
graphs at 300-500 nodes (README.md:125-127) and its dense O(N²) prior /
k-NN are the scaling limits this path removes.

Usage:  python tools/bench_large.py [--size 1536] [--segments 10000]
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

import jax  # noqa: E402
import jax.random as jr  # noqa: E402

from gcn_grabcut_tpu import (  # noqa: E402
    GCNGrabCutPipeline, SuperpixelGraphConfig, build_graph, build_model,
    init_model)
from gcn_grabcut_tpu.models.large import apply_large  # noqa: E402


def make_image(hw: int, seed: int = 0) -> np.ndarray:
    r = np.random.RandomState(seed)
    img = np.kron(r.rand(hw // 8, hw // 8, 3), np.ones((8, 8, 1)))
    yy, xx = np.mgrid[0:hw, 0:hw]
    cy, cx = hw // 2, int(hw * 0.47)
    blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < (hw // 4) ** 2
    img[blob] = img[blob] * 0.25 + r.rand(3) * 0.75
    return (img * 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1536)
    ap.add_argument("--segments", type=int, default=10000)
    args = ap.parse_args()

    print(f"backend={jax.devices()[0]}  image {args.size}^2, "
          f"{args.segments} requested segments")

    imgs = [make_image(args.size, s) for s in range(3)]

    cfg = SuperpixelGraphConfig(n_segments=args.segments)
    t0 = time.perf_counter()
    g = build_graph(imgs[0], cfg)
    print(f"build_graph compile+first: {time.perf_counter() - t0:.1f}s  "
          f"K={g.n_nodes}")
    for i in (1, 2):
        t0 = time.perf_counter()
        g = build_graph(imgs[i], cfg)
        print(f"build_graph warm: {time.perf_counter() - t0:.2f}s")

    _, _, em = g.edges()
    n_edges = int(em.sum())
    print(f"valid directed edges: {n_edges}")

    model = build_model("resgcn", hidden_channels=128, n_layers=6)
    vs = init_model(model, jr.PRNGKey(0), g.graph)

    t0 = time.perf_counter()
    logits = apply_large(model, vs, g.graph)
    print(f"apply_large compile+first: {time.perf_counter() - t0:.1f}s")
    for _ in range(2):
        t0 = time.perf_counter()
        logits = apply_large(model, vs, g.graph)
        s = float(logits.sum())
        t = time.perf_counter() - t0
        print(f"apply_large warm (plans rebuilt): {t:.2f}s  sum={s:.1f}")
    from gcn_grabcut_tpu.models.large import (build_gcn_plans,
                                              build_gcn_plans_device)
    for _ in range(2):
        t0 = time.perf_counter()
        dplans = build_gcn_plans_device(
            g.graph.edge_src[0], g.graph.edge_dst[0], g.graph.edge_mask[0],
            g.graph.max_nodes)
        s = float(dplans[0].band.sum())   # pull-sync (CLAUDE.md: timing)
        print(f"device plan build: {time.perf_counter() - t0:.2f}s "
              f"(band mass {s:.0f})")
    t0 = time.perf_counter()
    plans = build_gcn_plans(
        np.asarray(g.graph.edge_src[0]), np.asarray(g.graph.edge_dst[0]),
        np.asarray(g.graph.edge_mask[0]), g.graph.max_nodes)
    print(f"host plan build (pull + np.add.at): "
          f"{time.perf_counter() - t0:.2f}s")
    for _ in range(2):
        t0 = time.perf_counter()
        logits = apply_large(model, vs, g.graph, plans=plans)
        s = float(logits.sum())
        t = time.perf_counter() - t0
        # 7 SpMM propagations per forward (6 GCN layers + 1 SAGE).
        eps = 7 * n_edges / t / 1e6
        print(f"apply_large warm (cached plans): {t:.2f}s  "
              f"({eps:.0f} M edge-msgs/s, sum={s:.1f})")

    # GATv2 at the same scale: banded SDDMM attention (ops/sddmm.py) vs the
    # O(E) edge-list forward it replaced (round-2 measurement: 0.225 s).
    from gcn_grabcut_tpu.models.large import build_gat_plan_device
    gat = build_model("gat", hidden_channels=128, n_layers=5)
    gvs = init_model(gat, jr.PRNGKey(1), g.graph)
    t0 = time.perf_counter()
    gplan = build_gat_plan_device(
        g.graph.edge_src[0], g.graph.edge_dst[0], g.graph.edge_attr[0],
        g.graph.edge_mask[0], g.graph.max_nodes)
    s = float(gplan.mask_band.sum())
    print(f"gat plan build: {time.perf_counter() - t0:.2f}s "
          f"(band edges {s:.0f}, fallback {float(gplan.fb_mask.sum()):.0f}, "
          f"overflow {int(gplan.fb_overflow[0])})")
    t0 = time.perf_counter()
    glogits = apply_large(gat, gvs, g.graph, plans=gplan)
    print(f"gat banded compile+first: {time.perf_counter() - t0:.1f}s")
    for _ in range(2):
        t0 = time.perf_counter()
        glogits = apply_large(gat, gvs, g.graph, plans=gplan)
        s = float(glogits.sum())
        print(f"gat banded warm (cached plan): "
              f"{time.perf_counter() - t0:.3f}s  sum={s:.1f}")
    from gcn_grabcut_tpu.models.factory import apply_model
    t0 = time.perf_counter()
    glogits = apply_model(gat, gvs, g.graph, train=False)
    print(f"gat edge-list compile+first: {time.perf_counter() - t0:.1f}s")
    for _ in range(2):
        t0 = time.perf_counter()
        glogits = apply_model(gat, gvs, g.graph, train=False)
        s = float(glogits.sum())
        print(f"gat edge-list warm: {time.perf_counter() - t0:.3f}s  "
              f"sum={s:.1f}")

    pipe = GCNGrabCutPipeline(model, vs, sp_config=cfg)
    t0 = time.perf_counter()
    res = pipe.segment(imgs[0])
    print(f"segment compile+first: {time.perf_counter() - t0:.1f}s")
    for i in (1, 2):
        t0 = time.perf_counter()
        res = pipe.segment(imgs[i])
        t = time.perf_counter() - t0
        print(f"segment warm: {t:.2f}s  stages: "
              + " ".join(f"{k}={v:.2f}" for k, v in res.timing.items()))


if __name__ == "__main__":
    main()
