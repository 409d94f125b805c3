"""Pallas remote-DMA ring all-gather — the explicit-ICI halo exchange.

The edge-partitioned aggregation (parallel/partition.py) assembles the full
node axis on every device before the local gather/scatter.  The default
backend is `jax.lax.all_gather`, where XLA chooses the collective schedule.
This module provides the hand-scheduled alternative the performance guide
recommends for bandwidth-critical halos: each device's node block circulates
around the ring as explicit inter-chip RDMA (`pltpu.make_async_remote_copy`),
double-buffered so the hop-(s+1) transfer is in flight while hop s's block is
being copied out — peak ICI utilisation instead of whatever schedule XLA
picks, and no (log n)-tree latency on meshes where the ring rides a physical
torus ring.

The reference has no counterpart (it is single-device; SURVEY §2.9/§5.8
lists zero NCCL/MPI/collective code) — this is new TPU-first design work
for the BASELINE.json multi-chip north star.

Correctness protocol (per device, n = ring size):

  1. neighbour barrier — nobody issues a remote write until the two peers
     it touches have entered the kernel (their comm buffers are live);
  2. hop s ∈ [0, n-1): RDMA send of comm[s % 2] to the right neighbour's
     comm[(s+1) % 2]; wait for our own send + receive semaphores; copy the
     received block (originating at device (i - s - 1) mod n) into the
     output at its owner's offset;
  3. slot-reuse credits — the hop-s write lands in the slot the receiver
     consumed at hop s-2, so senders wait for an explicit consumption ack
     (a REGULAR semaphore signalled by the receiver) before reusing a slot.
     Acks are only produced when a reuse will actually happen (hops
     ≤ n-4), keeping every semaphore at zero on kernel exit.

Environment note: this container has one physical TPU chip, so the kernel
is validated in Pallas **interpret mode** on the 8-virtual-device CPU mesh
(tests/test_ring_pallas.py checks it against `lax.all_gather` and through
the full edge-partitioned aggregation oracle).  Interpret mode executes
devices serially and does not implement *remote semaphore signals* (only
remote copies), so the barrier and ack credits of steps 1/3 — needed only
for true concurrency — are compiled in exactly when ``interpret=False``,
i.e. on real hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Distinct from any other collective kernel's id in this process (the
# barrier semaphore is selected by collective_id).
_RING_COLLECTIVE_ID = 13


def _ring_kernel(axis_name: str, chunk: int, interpret: bool,
                 x_ref, out_ref, comm_ref, send_sem, recv_sem, ack_sem):
    ndev = jax.lax.axis_size(axis_name)      # static: mesh known at trace
    my_id = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my_id + 1, ndev)
    left = jax.lax.rem(my_id + ndev - 1, ndev)

    if not interpret:
        # Neighbour barrier (guide: Patterns/Ring Collectives).  Interpret
        # mode runs devices serially and lacks remote signals, so the
        # barrier exists exactly when concurrency does.
        barrier = pltpu.get_barrier_semaphore()
        for peer in (left, right):
            pltpu.semaphore_signal(barrier, inc=1, device_id=peer,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier, 2)

    out_ref[pl.ds(pl.multiple_of(my_id * chunk, chunk), chunk), :] = x_ref[:]
    comm_ref[0] = x_ref[:]

    # ndev is static — unrolled Python loop, so comm-buffer slots are
    # static indices and the @pl.when predicates are Python bools.
    for step in range(ndev - 1):
        send_slot = step % 2
        recv_slot = (step + 1) % 2

        if not interpret and step >= 2:
            # Hop s reuses the slot the right neighbour received into at
            # hop s-2; wait for its consumption ack before overwriting.
            pltpu.semaphore_wait(ack_sem, 1)

        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_ref.at[send_slot],
            dst_ref=comm_ref.at[recv_slot],
            send_sem=send_sem.at[send_slot],
            recv_sem=recv_sem.at[recv_slot],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()

        src_dev = jax.lax.rem(my_id + 2 * ndev - step - 1, ndev)
        out_ref[pl.ds(pl.multiple_of(src_dev * chunk, chunk), chunk), :] = (
            comm_ref[recv_slot])

        if not interpret and step <= ndev - 4:
            # Grant the upstream sender its slot back iff it will reuse it
            # (keeps the semaphore balanced at zero on exit).
            pltpu.semaphore_signal(ack_sem, inc=1, device_id=left,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)


def ring_all_gather(x_blk: jax.Array, axis_name: str, *,
                    interpret: bool | None = None) -> jax.Array:
    """All-gather the node-block axis via an explicit RDMA ring.

    Call **inside** `shard_map` over a mesh axis ``axis_name``; ``x_blk``
    is this device's ``(block, D)`` shard and the result is the full
    ``(n_dev * block, D)`` array on every device — a drop-in for
    ``jax.lax.all_gather(x_blk, axis_name, axis=0, tiled=True)``.

    On real TPU, ``block`` and ``D`` follow the usual tiling rules
    (sublane multiple-of-8 for fp32 / 16 for bf16, lane 128); the
    per-device block must fit VMEM twice (double-buffered comm scratch).

    interpret=None auto-selects interpret mode off-TPU so tests on the
    virtual CPU mesh exercise the same kernel the hardware lowers.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ndev = jax.lax.axis_size(axis_name)
    if ndev == 1:
        return x_blk
    chunk, feat = x_blk.shape
    kernel = functools.partial(_ring_kernel, axis_name, chunk, interpret)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ndev * chunk, feat), x_blk.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, feat), x_blk.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.REGULAR,
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=_RING_COLLECTIVE_ID),
    )(x_blk)
