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


def _all_gather_impl(x_blk: jax.Array, axis_name: str,
                     interpret: bool) -> jax.Array:
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


def _reduce_scatter_kernel(axis_name: str, chunk: int, interpret: bool,
                           g_ref, out_ref, comm_ref, stage_ref,
                           send_sem, recv_sem, ack_sem):
    """Ring reduce-scatter: device i ends with sum_j g_j[block i].

    Partial sums circulate rightward: at hop s device i stages its local
    block (i - s - 1) mod n (plus the partial received at hop s-1) and
    sends it on; after n-1 hops the fully-reduced block i arrives home.
    The staging buffer keeps the in-flight RDMA source immutable while
    the next partial is being built.
    """
    ndev = jax.lax.axis_size(axis_name)
    my_id = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my_id + 1, ndev)
    left = jax.lax.rem(my_id + ndev - 1, ndev)

    if not interpret:
        barrier = pltpu.get_barrier_semaphore()
        for peer in (left, right):
            pltpu.semaphore_signal(barrier, inc=1, device_id=peer,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier, 2)

    def local_block(idx):
        return g_ref[pl.ds(pl.multiple_of(idx * chunk, chunk), chunk), :]

    for step in range(ndev - 1):
        slot = step % 2
        send_idx = jax.lax.rem(my_id + 2 * ndev - step - 1, ndev)
        if step == 0:
            stage_ref[slot] = local_block(send_idx)
        else:
            # comm[slot] holds the hop-(s-1) partial for this same block.
            stage_ref[slot] = local_block(send_idx) + comm_ref[slot]
            if not interpret and step <= ndev - 3:
                # comm[slot] is consumed; the left neighbour's hop-(s+1)
                # write will reuse it — grant the slot back iff that hop
                # exists (keeps the semaphore balanced at zero).
                pltpu.semaphore_signal(
                    ack_sem, inc=1, device_id=left,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)

        if not interpret and step >= 2:
            # Our hop-s write lands in the slot the right neighbour
            # received into at hop s-2; wait for its consumption ack.
            pltpu.semaphore_wait(ack_sem, 1)

        rdma = pltpu.make_async_remote_copy(
            src_ref=stage_ref.at[slot],
            dst_ref=comm_ref.at[(step + 1) % 2],
            send_sem=send_sem.at[slot],
            recv_sem=recv_sem.at[(step + 1) % 2],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()

    out_ref[...] = local_block(my_id) + comm_ref[(ndev - 1) % 2]


def _reduce_scatter_impl(g_full: jax.Array, axis_name: str,
                         interpret: bool) -> jax.Array:
    ndev = jax.lax.axis_size(axis_name)
    if ndev == 1:
        return g_full
    rows, feat = g_full.shape
    chunk = rows // ndev
    kernel = functools.partial(_reduce_scatter_kernel, axis_name, chunk,
                               interpret)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((chunk, feat), g_full.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, feat), g_full.dtype),
            pltpu.VMEM((2, chunk, feat), g_full.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.REGULAR,
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=_RING_COLLECTIVE_ID + 1),
    )(g_full)


# --- differentiable wrappers -------------------------------------------
# Tiled all-gather and reduce-scatter are each other's transpose: the
# cotangent of "every device sees block j" is "block j's cotangents,
# summed over devices, delivered to block j's owner" — so training
# through the RDMA halo runs the reduce-scatter ring backward (and vice
# versa), keeping the whole path on explicit ICI schedules.

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _ring_all_gather(x_blk, axis_name, interpret):
    return _all_gather_impl(x_blk, axis_name, interpret)


def _ag_fwd(x_blk, axis_name, interpret):
    return _all_gather_impl(x_blk, axis_name, interpret), None


def _ag_bwd(axis_name, interpret, _res, g):
    return (_reduce_scatter_impl(g, axis_name, interpret),)


_ring_all_gather.defvjp(_ag_fwd, _ag_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _ring_reduce_scatter(g_full, axis_name, interpret):
    return _reduce_scatter_impl(g_full, axis_name, interpret)


def _rs_fwd(g_full, axis_name, interpret):
    return _reduce_scatter_impl(g_full, axis_name, interpret), None


def _rs_bwd(axis_name, interpret, _res, g):
    return (_all_gather_impl(g, axis_name, interpret),)


_ring_reduce_scatter.defvjp(_rs_fwd, _rs_bwd)


def ring_all_gather(x_blk: jax.Array, axis_name: str, *,
                    interpret: bool | None = None) -> jax.Array:
    """All-gather the node-block axis via an explicit RDMA ring.

    Call **inside** `shard_map` over a mesh axis ``axis_name``; ``x_blk``
    is this device's ``(block, D)`` shard and the result is the full
    ``(n_dev * block, D)`` array on every device — a drop-in for
    ``jax.lax.all_gather(x_blk, axis_name, axis=0, tiled=True)``.
    Differentiable: the VJP is :func:`ring_reduce_scatter` (so training
    through the halo also rides the explicit ring).

    On real TPU, ``block`` and ``D`` follow the usual tiling rules
    (sublane multiple-of-8 for fp32 / 16 for bf16, lane 128); the
    per-device block must fit VMEM twice (double-buffered comm scratch).

    interpret=None auto-selects interpret mode off-TPU so tests on the
    virtual CPU mesh exercise the same kernel the hardware lowers.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _ring_all_gather(x_blk, axis_name, interpret)


def ring_reduce_scatter(g_full: jax.Array, axis_name: str, *,
                        interpret: bool | None = None) -> jax.Array:
    """Reduce-scatter over the ring: device i receives sum_j g_j[block i].

    Drop-in for ``jax.lax.psum_scatter(g, axis_name, scatter_dimension=0,
    tiled=True)``; the VJP is :func:`ring_all_gather`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _ring_reduce_scatter(g_full, axis_name, interpret)
