"""Edge-partitioned neighbourhood aggregation for large graphs.

The reference caps graphs at ~300-500 nodes because its prior and non-local
search are dense O(N^2) and its aggregation single-device (SURVEY §5.7).
The 10k+-superpixel multi-host configuration instead block-partitions the
node axis across the mesh's "graph" axis and partitions edges by their
*destination* block, so each device aggregates only into the nodes it owns:

  1. every device holds a contiguous node block x_local (N/n, D);
  2. source features for arbitrary src indices are obtained by all-gathering
     the node axis (halo exchange over ICI; bandwidth N*D per step);
  3. each device scatter-adds its edge shard's messages into its own block.

The all-gather is issued *before* the local per-edge work so XLA can overlap
the collective with the gather/scatter compute.  Partitioning by destination
makes the scatter purely local — no reduce over devices is needed.

`partition_edges_by_dst` reorders an edge list so that the e-axis shards
line up with the destination blocks (host-side, once per graph).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def partition_edges_by_dst(edge_src: np.ndarray, edge_dst: np.ndarray,
                           edge_mask: np.ndarray, n_nodes: int,
                           n_shards: int):
    """Reorder + pad edges so shard i holds exactly the edges whose dst lies
    in node block i.  Returns (src, dst, mask) with length
    n_shards * per_shard, per_shard = max over shards (rounded up)."""
    block = (n_nodes + n_shards - 1) // n_shards
    owner = np.minimum(edge_dst // block, n_shards - 1)
    owner = np.where(edge_mask > 0, owner, -1)

    shards = [np.nonzero(owner == i)[0] for i in range(n_shards)]
    per_shard = max(1, max(len(s) for s in shards))

    src = np.zeros(n_shards * per_shard, edge_src.dtype)
    dst = np.zeros(n_shards * per_shard, edge_dst.dtype)
    msk = np.zeros(n_shards * per_shard, np.float32)
    for i, idx in enumerate(shards):
        o = i * per_shard
        src[o:o + len(idx)] = edge_src[idx]
        dst[o:o + len(idx)] = edge_dst[idx]
        # The mask column carries the edge weight (1.0 for plain masks).
        msk[o:o + len(idx)] = edge_mask[idx]
        # Padded slots point at the block's first node with zero mask.
        dst[o + len(idx):o + per_shard] = min(i * block, n_nodes - 1)
    return src, dst, msk


def sharded_scatter_add(mesh: Mesh, n_nodes: int, halo: str = "xla"):
    """Build an edge-partitioned aggregation: (x, src, dst, mask) → out.

    x is sharded P("graph") on the node axis; edge arrays are sharded
    P("graph") on the edge axis (pre-partitioned by destination block).
    Each device all-gathers x, computes its local messages, and scatter-adds
    into its own node block.  out has the same sharding as x.

    halo="xla" assembles the node axis with `lax.all_gather` (XLA picks the
    collective schedule); halo="pallas_ring" uses the explicit remote-DMA
    ring kernel (parallel/ring_pallas.py) — hand-scheduled, double-buffered
    ICI hops for bandwidth-critical halos on real torus meshes.
    """
    axis = "graph"
    if halo not in ("xla", "pallas_ring"):
        raise ValueError(f"unknown halo backend: {halo!r}")

    def local(x_blk, src, dst, mask):
        # Halo exchange: assemble the full node axis on every device.
        if halo == "pallas_ring":
            from .ring_pallas import ring_all_gather
            x_full = ring_all_gather(x_blk, axis)
        else:
            x_full = jax.lax.all_gather(x_blk, axis, axis=0, tiled=True)
        i = jax.lax.axis_index(axis)
        block = x_blk.shape[0]
        base = i * block
        msgs = x_full[src].astype(jnp.float32) * mask[:, None]
        local_dst = jnp.clip(dst - base, 0, block - 1)
        in_block = ((dst >= base) & (dst < base + block)).astype(jnp.float32)
        msgs = msgs * in_block[:, None]
        out = jnp.zeros((block, x_blk.shape[1]),
                        jnp.float32).at[local_dst].add(msgs)
        return out.astype(x_blk.dtype)

    if halo == "pallas_ring" and len(mesh.axis_names) > 1:
        # The RDMA device id resolves against the named-axis environment,
        # which Pallas's dma_start rule supports for exactly one named
        # axis — the ring halo therefore takes a graph-only mesh (its
        # natural shape: the halo rides the "graph" ring; data-parallel
        # replicas each run their own ring).  Callers with a combined
        # (data, graph) mesh pass the graph submesh here.
        raise ValueError(
            "halo='pallas_ring' requires a single-axis ('graph',) mesh; "
            f"got axes {mesh.axis_names}.  Build the aggregation over the "
            "graph-axis submesh (Mesh(devices_of_one_replica, ('graph',)))")
    return shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis), P(axis)),
        out_specs=P(axis, None),
        # The pallas_call primitive carries no replication rule.
        check_rep=(halo == "xla"))


def partition_edges_2d(edge_src: np.ndarray, edge_dst: np.ndarray,
                       edge_mask: np.ndarray, n_nodes: int, n_shards: int):
    """Bucket edges by (dst block, src block) for the ring schedule.

    Returns (src, dst, mask) shaped (n_shards, n_shards, per_bucket):
    bucket [i, j] holds the edges whose destination lies in node block i and
    source in node block j, with indices made block-relative.  For
    spatially-sorted superpixel graphs the mass concentrates on near-
    diagonal buckets, so the static per-bucket budget stays modest.
    """
    block = (n_nodes + n_shards - 1) // n_shards
    di = np.minimum(edge_dst // block, n_shards - 1)
    sj = np.minimum(edge_src // block, n_shards - 1)
    valid = edge_mask > 0

    counts = np.zeros((n_shards, n_shards), np.int64)
    np.add.at(counts, (di[valid], sj[valid]), 1)
    per_bucket = max(1, int(counts.max()))

    src = np.zeros((n_shards, n_shards, per_bucket), np.int32)
    dst = np.zeros((n_shards, n_shards, per_bucket), np.int32)
    msk = np.zeros((n_shards, n_shards, per_bucket), np.float32)
    fill = np.zeros((n_shards, n_shards), np.int64)
    for e in np.nonzero(valid)[0]:
        i, j = di[e], sj[e]
        k = fill[i, j]
        src[i, j, k] = edge_src[e] - j * block
        dst[i, j, k] = edge_dst[e] - i * block
        # The mask column carries the edge weight (1.0 for plain masks).
        msk[i, j, k] = edge_mask[e]
        fill[i, j] = k + 1
    return src, dst, msk


def ring_scatter_add(mesh: Mesh, n_nodes: int):
    """Ring-scheduled edge-partitioned aggregation: (x, src2d, dst2d,
    mask2d) → out, with x sharded P("graph") on the node axis.

    Instead of all-gathering the full node axis (peak memory O(N) per
    device), each device's block circulates around the ring via
    `lax.ppermute`; at step s every device aggregates the bucket of edges
    whose sources live in the block it currently holds.  Peak memory is
    O(N / n) and the permute of step s+1 can overlap the bucket-s compute.
    """
    axis = "graph"

    def local(x_blk, src_b, dst_b, mask_b):
        # src_b/dst_b/mask_b: (1, n_shards, per_bucket) — this shard's row.
        n = jax.lax.axis_size(axis)
        i = jax.lax.axis_index(axis)
        block = x_blk.shape[0]
        perm = [(k, (k + 1) % n) for k in range(n)]

        def step(s, carry):
            x_rot, acc = carry
            # Double-buffered schedule: the permute producing the next
            # step's block is issued BEFORE the bucket-s compute (it only
            # depends on x_rot, which is live at loop entry), so the ICI
            # transfer overlaps the local gather/scatter under XLA's
            # latency-hiding scheduler.
            x_next = jax.lax.ppermute(x_rot, axis, perm)
            j = (i - s) % n                       # owner of x_rot's block
            src = jax.lax.dynamic_index_in_dim(
                src_b[0], j, axis=0, keepdims=False)
            dst = jax.lax.dynamic_index_in_dim(
                dst_b[0], j, axis=0, keepdims=False)
            m = jax.lax.dynamic_index_in_dim(
                mask_b[0], j, axis=0, keepdims=False)
            msgs = (x_rot[jnp.clip(src, 0, block - 1)].astype(jnp.float32)
                    * m[:, None])
            acc = acc.at[jnp.clip(dst, 0, block - 1)].add(msgs)
            return x_next, acc

        # Derive the accumulator from x_blk so it inherits the shard_map
        # "varying" annotation (a fresh jnp.zeros would be unvarying and
        # reject the loop carry).
        acc0 = (x_blk * 0).astype(jnp.float32)
        _, acc = jax.lax.fori_loop(0, n, step, (x_blk, acc0))
        return acc.astype(x_blk.dtype)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None, None),
                  P(axis, None, None), P(axis, None, None)),
        out_specs=P(axis, None))


def mesh_aggregators(mesh: Mesh, edge_src, edge_dst, edge_mask,
                     n_nodes: int, method: str = "ring",
                     halo: str = "xla"):
    """(gcn_propagate, mean_propagate) callables for
    ``ResGCNNet(aggregators=…)`` that run the neighbourhood aggregation
    edge-partitioned over the mesh "graph" axis.

    GCN weights fold PyG's symmetric normalisation and self loops into
    per-edge weights exactly as models/large.py:build_gcn_plans; the mean
    aggregator uses 1/deg(dst).  `method="ring"` circulates node blocks
    with `lax.ppermute` (O(N/n) peak memory, permute s+1 overlappable with
    bucket-s compute); `method="allgather"` assembles the full node axis
    per layer (halo="xla" via lax.all_gather, halo="pallas_ring" via the
    explicit remote-DMA ring kernel).  Both accept the model's (1, N, D)
    activations.
    """
    n_sh = mesh.shape["graph"]
    block = -(-n_nodes // n_sh)
    n_pad = block * n_sh

    keep = np.asarray(edge_mask) > 0
    src = np.asarray(edge_src)[keep].astype(np.int64)
    dst = np.asarray(edge_dst)[keep].astype(np.int64)
    deg = np.bincount(dst, minlength=n_pad).astype(np.float64)
    dhat = deg + 1.0
    dis = 1.0 / np.sqrt(dhat)
    loops = np.arange(n_nodes)
    g_src = np.concatenate([src, loops])
    g_dst = np.concatenate([dst, loops])
    g_w = np.concatenate([dis[src] * dis[dst],
                          1.0 / dhat[:n_nodes]]).astype(np.float32)
    m_w = (1.0 / np.maximum(deg, 1.0))[dst].astype(np.float32)

    if method == "ring":
        agg = ring_scatter_add(mesh, n_pad)

        def build(ss, dd, ww):
            s2, d2, w2 = partition_edges_2d(ss, dd, ww, n_pad, n_sh)
            s2, d2, w2 = jnp.asarray(s2), jnp.asarray(d2), jnp.asarray(w2)

            def prop(h):
                n = h.shape[1]
                hp = jnp.pad(h[0], ((0, n_pad - n), (0, 0)))
                return agg(hp, s2, d2, w2)[:n][None]
            return prop
    elif method == "allgather":
        agg = sharded_scatter_add(mesh, n_pad, halo=halo)

        def build(ss, dd, ww):
            ps, pd, pw = partition_edges_by_dst(ss, dd, ww, n_pad, n_sh)
            ps, pd, pw = jnp.asarray(ps), jnp.asarray(pd), jnp.asarray(pw)

            def prop(h):
                n = h.shape[1]
                hp = jnp.pad(h[0], ((0, n_pad - n), (0, 0)))
                return agg(hp, ps, pd, pw)[:n][None]
            return prop
    else:
        raise ValueError(f"unknown method: {method!r}")

    return build(g_src, g_dst, g_w), build(src, dst, m_w)


def sharded_gcn_layer(mesh: Mesh, n_nodes: int):
    """Edge-partitioned GCN propagation: h' = D^-1/2 (A+I) D^-1/2 h W.

    Demonstrates the large-graph message-passing path over the "graph" mesh
    axis; the weight multiply stays local to each node block (the MXU work
    is evenly sharded), only the halo exchange crosses devices.
    """
    agg = sharded_scatter_add(mesh, n_nodes)

    def gcn(x, w, src, dst, mask, deg_inv_sqrt):
        xw = jnp.einsum("nd,df->nf", x, w)
        h = xw * deg_inv_sqrt[:, None]
        h = agg(h, src, dst, mask)
        h = h * deg_inv_sqrt[:, None]
        h = h + xw * (deg_inv_sqrt ** 2)[:, None]
        return h

    return gcn
