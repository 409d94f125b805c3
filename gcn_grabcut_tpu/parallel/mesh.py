"""Device-mesh helpers: data-parallel training over graph batches and the
sharding vocabulary for the multi-chip configurations.

The reference is strictly single-device (SURVEY §2.9/§5.8: no DP/TP/PP, no
NCCL/MPI).  The TPU framework makes distribution a first-class layer:

* axis "data"  — data parallelism over graphs in a batch (gradients are
  reduced by XLA-inserted psums when parameters are replicated and batches
  sharded),
* axis "graph" — model parallelism *within* one large graph: nodes are
  block-partitioned across devices and neighbourhood aggregation runs
  edge-partitioned with halo exchange (see parallel/partition.py).

Everything uses `jax.sharding.Mesh` + NamedSharding through plain `jax.jit`:
XLA chooses and schedules the collectives (psum for grad reduction,
all-gather for halo features) over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialise multi-host JAX (jax.distributed) when running on more
    than one host.  Safe to call unconditionally: with no arguments and no
    cluster environment it is a no-op on a single host.

    The reference has no distributed backend at all (SURVEY §5.8); on TPU
    pods the per-host invocation is typically fully automatic (the TPU
    environment provides coordinator/process info).
    """
    import jax
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        elif num_processes is not None or _in_cluster_env():
            jax.distributed.initialize()
    except (RuntimeError, ValueError) as exc:
        # Tolerate the two single-process situations: the service is already
        # initialised, or the XLA backend came up first (single-host run in
        # an environment whose env vars merely look cluster-like).
        msg = str(exc)
        if "already" not in msg and "must be called before" not in msg:
            raise


def _in_cluster_env() -> bool:
    import os
    return any(k in os.environ for k in (
        "COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"))


def make_mesh(n_data: Optional[int] = None, n_graph: int = 1,
              devices=None) -> Mesh:
    """Create a (data, graph) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_graph
    assert n_data * n_graph <= n, (n_data, n_graph, n)
    dev = np.asarray(devices[:n_data * n_graph]).reshape(n_data, n_graph)
    return Mesh(dev, ("data", "graph"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (graph-batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_graph_batch(batch, mesh: Mesh):
    """Place a GraphBatch with its G axis split across the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
