"""Benchmark the banded-dense SpMM on the real TPU chip.

Builds the 10k-superpixel-scale banded graph from PERF.md (N=10k nodes in
SLIC grid scan order, 8-connected lattice adjacency + a sprinkle of
non-local edges, E ~ 82k directed), then times the XLA shifted-view and
Pallas schedules against the XLA scatter-add oracle.

Timing methodology — slope timing: this backend's executions carry a
~450 us per-loop-iteration scheduling quantum (and per-dispatch results
for identical buffers can be deduped by the tunnel), so a single op is
timed as the *difference* between a fori_loop whose body chains the op
5 times and one that chains it once:  t_op = (t_5 - t_1) / 4.  Validated
against a 4096^2 bf16 matmul (193 TFLOP/s measured vs ~197 peak).

Usage:  python tools/bench_spmm.py [--n-side 100] [--d 128]
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

from gcn_grabcut_tpu.ops.spmm import (  # noqa: E402
    spmm_plan, banded_spmm, spmm_reference,
)


def make_grid_graph(n_side: int, n_far: int, seed: int = 0):
    """8-connected n_side x n_side lattice in scan order + random far edges
    — the superpixel-adjacency shape the kernel is designed for."""
    n = n_side * n_side
    ys, xs = np.mgrid[0:n_side, 0:n_side]
    idx = (ys * n_side + xs).ravel()
    srcs, dsts = [], []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            ny, nx = ys + dy, xs + dx
            ok = (ny >= 0) & (ny < n_side) & (nx >= 0) & (nx < n_side)
            srcs.append(idx.reshape(n_side, n_side)[ok])
            dsts.append((ny * n_side + nx)[ok])
    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    r = np.random.RandomState(seed)
    src = np.concatenate([src, r.randint(0, n, n_far)])
    dst = np.concatenate([dst, r.randint(0, n, n_far)])
    w = r.rand(len(src)).astype(np.float32) + 0.1
    perm = r.permutation(len(src))
    return src[perm], dst[perm], w[perm], n


def _time_loop(op, x0, body_reps: int, iters: int, trials: int) -> float:
    @jax.jit
    def chain(x):
        def body(_, acc):
            y = acc
            for _ in range(body_reps):
                out = op(y)
                # Normalise so chained magnitudes stay bounded.
                y = out / (jnp.max(jnp.abs(out)) + 1.0)
            return y
        return jax.lax.fori_loop(0, iters, body, x)

    chain(x0).block_until_ready()         # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        chain(x0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / iters


def slope_time(op, x0, iters: int = 30, trials: int = 5) -> float:
    """Marginal seconds/op: body with 5 chained ops minus body with 1."""
    t1 = _time_loop(op, x0, 1, iters, trials)
    t5 = _time_loop(op, x0, 5, iters, trials)
    return max((t5 - t1) / 4, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-side", type=int, default=100)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--far", type=int, default=2000)
    args = ap.parse_args()

    src, dst, w, n = make_grid_graph(args.n_side, args.far)
    e = len(src)
    print(f"graph: N={n} E={e} D={args.d}  backend={jax.devices()[0]}")

    x = jnp.asarray(np.random.RandomState(1).randn(n, args.d), jnp.float32)
    ref = spmm_reference(x, src, dst, w, n)
    sj, dj, wj = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)

    t = slope_time(lambda xx: spmm_reference(xx, sj, dj, wj, n), x)
    print(f"xla scatter-add:                  {t * 1e6:8.1f} us  "
          f"{e / t / 1e6:8.1f} M edges/s")

    for br, win in [(128, 512), (128, 640), (256, 768)]:
        plan = spmm_plan(src, dst, w, n, block_rows=br, window=win)
        fbn = len(plan.fb_src)
        for backend in ("xla", "pallas"):
            for prec in ("default", "highest"):
                fn = lambda xx, p=plan, pr=prec, be=backend: banded_spmm(
                    xx, p, precision=pr, backend=be)
                out = fn(x)
                err = float(jnp.max(jnp.abs(out - ref))
                            / (jnp.max(jnp.abs(ref)) + 1e-9))
                t = slope_time(fn, x)
                print(f"{backend:6s} R={br:3d} W={plan.window:4d} "
                      f"fb={fbn:4d} {prec:8s}: {t * 1e6:8.1f} us  "
                      f"{e / t / 1e6:8.1f} M edges/s  relerr={err:.2e}")


if __name__ == "__main__":
    main()
