"""Multi-host validation: run the edge-partitioned aggregation across
multiple JAX *processes* (jax.distributed + Gloo collectives on CPU),
the same code path a TPU pod uses across hosts over DCN.

Usage (spawns its own workers):
  python tools/test_multihost.py [--processes 2] [--local-devices 2]

Each worker builds the global (1, n_devices) mesh, receives its node-block
shard of a random graph, runs `ring_scatter_add` (ppermute ring) and the
all-gather `sharded_scatter_add`, and process 0 checks both against the
dense scatter oracle.  Exit code 0 iff both match.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

WORKER = r"""
import sys
sys.path.insert(0, "__REPO__")
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gcn_grabcut_tpu.parallel.partition import (
    partition_edges_by_dst, partition_edges_2d, sharded_scatter_add,
    ring_scatter_add)

devs = jax.devices()
n_dev = len(devs)
mesh = Mesh(np.array(devs).reshape(1, n_dev), ("data", "graph"))

r = np.random.RandomState(0)
n, e, d = 16 * n_dev, 64 * n_dev, 8
src = r.randint(0, n, e).astype(np.int32)
dst = r.randint(0, n, e).astype(np.int32)
mask = np.ones(e, np.float32)
x = r.randn(n, d).astype(np.float32)

def put(arr, spec):
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        arr.shape, sh, lambda idx: arr[idx])

# all-gather path
psrc, pdst, pmask = partition_edges_by_dst(src, dst, mask, n, n_dev)
agg = sharded_scatter_add(mesh, n)

# gather the full result on every process for checking
from jax.experimental import multihost_utils
with mesh:
    full_ag = multihost_utils.process_allgather(
        jax.jit(agg)(put(x, P("graph", None)), put(psrc, P("graph")),
                     put(pdst, P("graph")), put(pmask, P("graph"))),
        tiled=True)

# ring path
s2, d2, m2 = partition_edges_2d(src, dst, mask, n, n_dev)
ring = ring_scatter_add(mesh, n)
with mesh:
    full_ring = multihost_utils.process_allgather(
        jax.jit(ring)(put(x, P("graph", None)),
                      put(s2, P("graph", None, None)),
                      put(d2, P("graph", None, None)),
                      put(m2, P("graph", None, None))),
        tiled=True)

if pid == 0:
    ref = np.zeros_like(x)
    np.add.at(ref, dst, x[src])
    err_ag = np.abs(np.asarray(full_ag) - ref).max()
    err_ring = np.abs(np.asarray(full_ring) - ref).max()
    print(f"[multihost] {nproc} processes x "
          f"{len(jax.local_devices())} devices: "
          f"allgather err={err_ag:.2e} ring err={err_ring:.2e}", flush=True)
    assert err_ag < 1e-4 and err_ring < 1e-4
    print("[multihost] PASS", flush=True)
"""


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--processes", type=int, default=2)
    p.add_argument("--local-devices", type=int, default=2)
    p.add_argument("--port", type=str, default="9923")
    args = p.parse_args(argv)

    worker_src = WORKER.replace("__REPO__", str(REPO))
    worker_path = Path("/tmp/_gcngc_mh_worker.py")
    worker_path.write_text(worker_src)

    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count="
                          f"{args.local_devices}")

    procs = [subprocess.Popen(
        [sys.executable, str(worker_path), str(i), str(args.processes),
         args.port],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(args.processes)]
    rc = 0
    for i, proc in enumerate(procs):
        out, _ = proc.communicate(timeout=180)
        text = out.decode()
        if proc.returncode != 0:
            rc = 1
        if i == 0 or proc.returncode != 0:
            print(text[-2000:])
    print("MULTIHOST:", "PASS" if rc == 0 else "FAIL")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
