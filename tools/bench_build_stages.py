"""Stage-level roofline of the fused 10k-superpixel graph build.

The fused build (graph_build._build_graph_arrays) is one jit, so the
driver-visible 0.60 s at 1536^2/10k (PERF.md) has no internal attribution.
This tool times each sub-stage as its own pull-synced jit (CLAUDE.md
timing rules: end every region in a host pull; perturb inputs per rep so
the tunnel cannot serve a cached dispatch), plus the full fused build, to
find where the 0.60 s lives.

  python tools/bench_build_stages.py [--size 1536] [--segments 10000]
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
import jax.numpy as jnp  # noqa: E402

from gcn_grabcut_tpu.graph_build import (build_graph,  # noqa: E402
                                         SuperpixelGraphConfig)
from gcn_grabcut_tpu.ops import slic as slic_ops  # noqa: E402
from gcn_grabcut_tpu.ops import region as region_ops  # noqa: E402
from gcn_grabcut_tpu.ops import edges as edge_ops  # noqa: E402
from gcn_grabcut_tpu.ops import prior as prior_ops  # noqa: E402
from gcn_grabcut_tpu.ops import image as im  # noqa: E402
from tools.bench_large import make_image  # noqa: E402


def timed(fn, *args, reps=3, label=""):
    """Best-of-reps wall time; fn must end in a host pull."""
    fn(*args)  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    print(f"  {label:34s} {best * 1e3:8.1f} ms")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1536)
    ap.add_argument("--segments", type=int, default=10000)
    args = ap.parse_args()
    H = W = args.size
    nseg = args.segments
    print(f"backend={jax.devices()[0]}  {H}x{W}, {nseg} segments")

    imgs = [jnp.asarray(make_image(args.size, s), jnp.float32)
            for s in range(4)]
    k = slic_ops.slic_num_labels(H, W, nseg)
    _, gw = slic_ops.grid_shape(H, W, nseg)
    print(f"K={k}")

    cfg = SuperpixelGraphConfig(n_segments=nseg)
    rep = [0]

    def nxt():
        rep[0] = (rep[0] + 1) % len(imgs)
        return imgs[rep[0]]

    # full fused build (host entry)
    def full():
        g = build_graph(np.asarray(nxt(), np.uint8), cfg)
        float(np.asarray(g.graph.x).sum())
    timed(full, label="full build_graph (host, with pulls)")

    # device-resident fused build: the metric the batched/streamed product
    # paths see — inputs already on device, one scalar pull to sync (the
    # host-entry number above additionally pays ~7 MB h2d + ~5 MB d2h on a
    # ~25-50 MB/s tunnel, a ~0.3 s protocol floor no kernel change moves).
    from gcn_grabcut_tpu.graph_build import _build_graph_arrays

    def dev(i=[0]):
        i[0] = (i[0] + 1) % len(imgs)
        out = _build_graph_arrays(imgs[i[0]], cfg.n_segments,
                                  cfg.compactness, cfg.sigma,
                                  cfg.connectivity, cfg.n_nonlocal,
                                  cfg.slic_iters, cfg.bg_connectivity)
        float(out["x"][0, 0])
    timed(dev, label="fused build, device-resident (1 scalar pull)")

    # stage jits -------------------------------------------------------
    lab_j = jax.jit(im.rgb_to_lab)

    def colour(x):
        lab = lab_j(x)
        return float(lab.sum())
    timed(colour, imgs[0], label="rgb->lab")

    labs = [lab_j(x) for x in imgs]

    kmeans_j = jax.jit(lambda lab: slic_ops.slic(
        lab, n_segments=nseg, n_iter=10))

    def slic_full(i=[0]):
        i[0] = (i[0] + 1) % len(labs)
        return int(kmeans_j(labs[i[0]]).sum())
    timed(slic_full, label="slic total (kmeans+orphans+cc)")

    segs = [kmeans_j(x) for x in labs]

    absorb_j = jax.jit(lambda s: slic_ops._absorb_orphans(s, n_sweeps=4))

    def absorb(i=[0]):
        i[0] = (i[0] + 1) % len(segs)
        return int(absorb_j(segs[i[0]]).sum())
    timed(absorb, label="absorb_orphans(4)")

    enforce_j = jax.jit(lambda s: slic_ops.enforce_connectivity(s, k))

    def enforce(i=[0]):
        i[0] = (i[0] + 1) % len(segs)
        return int(enforce_j(segs[i[0]]).sum())
    timed(enforce, label="enforce_connectivity")

    hsv0 = jax.jit(im.rgb_to_hsv)(imgs[0])
    gray0 = jax.jit(im.rgb_to_gray)(imgs[0])
    grad0 = jax.jit(im.gradient_magnitude)(gray0)

    stats_j = jax.jit(lambda s, lab: region_ops.region_statistics(
        s, lab, hsv0, grad0, k))

    def stats(i=[0]):
        i[0] = (i[0] + 1) % len(segs)
        st = stats_j(segs[i[0]], labs[i[0]])
        return float(st["mean_lab"].sum())
    timed(stats, label="region_statistics")

    adj_j = jax.jit(lambda s: edge_ops.adjacency_pairs(s, k, 4))

    def adj(i=[0]):
        i[0] = (i[0] + 1) % len(segs)
        p, sh, m = adj_j(segs[i[0]])
        return float(m.sum())
    timed(adj, label="adjacency_pairs (incl. sort)")

    nl_j = jax.jit(lambda ml, v: edge_ops.nonlocal_pairs_banded(
        ml, v, k, 4, exclude_window=gw + 1))

    def nl(i=[0]):
        i[0] = (i[0] + 1) % len(segs)
        st = stats_j(segs[i[0]], labs[i[0]])
        p, m = nl_j(st["mean_lab"], st["valid"])
        return float(m.sum())
    timed(nl, label="nonlocal banded kNN (+stats)")

    pr_j = jax.jit(lambda s, lab, c, ml, ct: prior_ops.compute_auto_prior(
        s, lab, k, stats=(c, ml, ct)))

    def pr(i=[0]):
        i[0] = (i[0] + 1) % len(segs)
        st = stats_j(segs[i[0]], labs[i[0]])
        p = pr_j(segs[i[0]], labs[i[0]], st["counts"], st["mean_lab"],
                 st["centroids"])
        return float(p.sum())
    timed(pr, label="auto prior blocked (+stats)")


if __name__ == "__main__":
    main()
