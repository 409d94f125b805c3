"""Scaling benchmark: edge-partitioned aggregation edges/s vs shard count.

Measures the `parallel.partition` halo-exchange SpMM on a large graph at
1, 2, 4, ... shards over the available devices and reports edges/s plus
scaling efficiency relative to 1 shard (the BASELINE target is >= 80%
efficiency on 2+ hosts).

On a single-chip/CPU machine, run with virtual devices to validate the
methodology (communication is through memory, so efficiencies are
optimistic — the tool prints the device platform so results are labelled):

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/bench_scaling.py --cpu

On a real slice the same command measures ICI collectives.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=16384)
    p.add_argument("--features", type=int, default=128)
    p.add_argument("--degree", type=int, default=8)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", type=str, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gcn_grabcut_tpu.parallel.mesh import make_mesh
    from gcn_grabcut_tpu.parallel.partition import (
        partition_edges_by_dst, sharded_scatter_add)
    from gcn_grabcut_tpu.utils import setup_compilation_cache
    setup_compilation_cache()

    n_dev = len(jax.devices())
    platform = jax.devices()[0].platform
    N, D = args.nodes, args.features
    E = N * args.degree

    r = np.random.RandomState(0)
    src = np.clip(np.arange(E) // args.degree
                  + r.randint(-200, 200, E), 0, N - 1).astype(np.int32)
    dst = (np.arange(E) // args.degree).astype(np.int32)
    mask = np.ones(E, np.float32)
    x = r.randn(N, D).astype(np.float32)

    shard_counts = [s for s in (1, 2, 4, 8, 16) if s <= n_dev]
    results = []
    for s in shard_counts:
        mesh = make_mesh(n_data=1, n_graph=s, devices=jax.devices()[:s])
        psrc, pdst, pmask = partition_edges_by_dst(src, dst, mask, N, s)
        agg = sharded_scatter_add(mesh, N)
        sh_n = NamedSharding(mesh, P("graph", None))
        sh_e = NamedSharding(mesh, P("graph"))
        xs = jax.device_put(jnp.asarray(x), sh_n)
        es = (jax.device_put(jnp.asarray(psrc), sh_e),
              jax.device_put(jnp.asarray(pdst), sh_e),
              jax.device_put(jnp.asarray(pmask), sh_e))

        with mesh:
            f = jax.jit(agg)
            f(xs, *es).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = f(xs, *es)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / args.iters
        eps = E / dt
        results.append(dict(shards=s, us_per_op=round(dt * 1e6),
                            edges_per_s=round(eps)))

    base = results[0]["edges_per_s"]
    for rrow in results:
        rrow["speedup"] = round(rrow["edges_per_s"] / base, 2)
        rrow["efficiency"] = round(
            rrow["edges_per_s"] / (base * rrow["shards"]), 3)

    report = dict(platform=platform, n_devices=n_dev, nodes=N, edges=E,
                  features=D, results=results)
    print(json.dumps(report, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
