"""Pallas remote-DMA ring all-gather (parallel/ring_pallas.py).

Validated in interpret mode on the virtual CPU mesh: the kernel must be a
drop-in for `lax.all_gather(..., tiled=True)` both standalone and through
the full edge-partitioned aggregation / model forward (the same numerical
contract tests/test_mesh_aggregators.py enforces for the XLA halo).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gcn_grabcut_tpu.parallel.ring_pallas import ring_all_gather


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("graph",))


@pytest.mark.parametrize("ndev", [2, 4, 8])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_matches_all_gather(ndev, dtype):
    if len(jax.devices()) < ndev:
        pytest.skip(f"needs >= {ndev} virtual devices")
    mesh = _mesh(ndev)
    block, d = 16, 128
    x = jnp.arange(ndev * block * d, dtype=jnp.float32).reshape(
        ndev * block, d).astype(dtype)

    def ring(xb):
        return ring_all_gather(xb, "graph")

    def xla(xb):
        return jax.lax.all_gather(xb, "graph", axis=0, tiled=True)

    kw = dict(mesh=mesh, in_specs=P("graph", None), out_specs=P(),
              check_rep=False)
    got = np.asarray(jax.jit(shard_map(ring, **kw))(x))
    want = np.asarray(jax.jit(shard_map(xla, **kw))(x))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, np.asarray(x))


def test_single_device_identity():
    mesh = _mesh(1)
    x = jnp.ones((8, 128), jnp.float32)

    def ring(xb):
        return ring_all_gather(xb, "graph")

    out = jax.jit(shard_map(ring, mesh=mesh, in_specs=P("graph", None),
                            out_specs=P(), check_rep=False))(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_sharded_scatter_add_pallas_halo_matches_oracle():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from gcn_grabcut_tpu.parallel.partition import (
        partition_edges_by_dst, sharded_scatter_add)
    r = np.random.RandomState(0)
    n, e, d, n_sh = 128, 700, 128, 8
    src = r.randint(0, n, e).astype(np.int32)
    dst = r.randint(0, n, e).astype(np.int32)
    w = r.rand(e).astype(np.float32)
    x = r.randn(n, d).astype(np.float32)

    oracle = np.zeros((n, d), np.float32)
    np.add.at(oracle, dst, x[src] * w[:, None])

    mesh = Mesh(np.array(jax.devices()), ("graph",))
    ps, pd, pw = partition_edges_by_dst(src, dst, w, n, n_sh)
    agg = sharded_scatter_add(mesh, n, halo="pallas_ring")
    out = np.asarray(agg(jnp.asarray(x), jnp.asarray(ps), jnp.asarray(pd),
                         jnp.asarray(pw)))
    np.testing.assert_allclose(out, oracle, atol=1e-4, rtol=1e-5)


def test_model_forward_with_pallas_halo():
    """The full aggregator contract: model forward with the pallas-ring
    halo equals the dense-adjacency path (same weights, same graph)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    from gcn_grabcut_tpu.core.graph import single_graph
    from gcn_grabcut_tpu.models import build_model, init_model, apply_model
    from gcn_grabcut_tpu.parallel.partition import mesh_aggregators

    r = np.random.RandomState(0)
    n, e = 96, 500
    x = r.randn(n, 19).astype(np.float32)
    src_l = r.randint(0, n, e)
    dst_l = np.clip(src_l + r.randint(-20, 20, e), 0, n - 1)
    keep = src_l != dst_l
    src = np.concatenate([src_l[keep], dst_l[keep]])
    dst = np.concatenate([dst_l[keep], src_l[keep]])
    attr = r.rand(len(src), 5).astype(np.float32)
    g = single_graph(x, src, dst, attr)

    model = build_model("resgcn", hidden_channels=32, n_layers=2)
    vs = init_model(model, jax.random.PRNGKey(0), g)
    dense_out = np.asarray(apply_model(model, vs, g, train=False))

    # The RDMA ring halo takes the graph-only mesh (the ring axis is the
    # sole named axis in the kernel's environment; data-parallel replicas
    # each run their own ring).
    mesh = _mesh(4)
    aggs = mesh_aggregators(
        mesh, np.asarray(g.edge_src[0]), np.asarray(g.edge_dst[0]),
        np.asarray(g.edge_mask[0]), g.max_nodes,
        method="allgather", halo="pallas_ring")
    with mesh:
        out = np.asarray(model.apply(vs, g, train=False, aggregators=aggs))
    np.testing.assert_allclose(out, dense_out, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_reduce_scatter_matches_psum_scatter(ndev):
    if len(jax.devices()) < ndev:
        pytest.skip(f"needs >= {ndev} virtual devices")
    from gcn_grabcut_tpu.parallel.ring_pallas import ring_reduce_scatter
    mesh = _mesh(ndev)
    block, d = 16, 128
    r = np.random.RandomState(0)
    # Per-device distinct cotangents: shard a (ndev, ndev*block, d) stack.
    g = jnp.asarray(r.randn(ndev, ndev * block, d).astype(np.float32))

    def ring(gs):
        return ring_reduce_scatter(gs[0], "graph")

    def xla(gs):
        return jax.lax.psum_scatter(gs[0], "graph", scatter_dimension=0,
                                    tiled=True)

    kw = dict(mesh=mesh, in_specs=P("graph", None, None),
              out_specs=P("graph", None), check_rep=False)
    got = np.asarray(jax.jit(shard_map(ring, **kw))(g))
    want = np.asarray(jax.jit(shard_map(xla, **kw))(g))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_pallas_halo_gradient_matches_xla_halo():
    """Training through the RDMA halo: grad of a scalar loss through
    sharded_scatter_add must match the XLA-collective halo exactly
    (the custom VJP routes the backward through the reduce-scatter ring)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from gcn_grabcut_tpu.parallel.partition import (
        partition_edges_by_dst, sharded_scatter_add)
    r = np.random.RandomState(1)
    n, e, d, n_sh = 128, 600, 128, 8
    src = r.randint(0, n, e).astype(np.int32)
    dst = r.randint(0, n, e).astype(np.int32)
    w = r.rand(e).astype(np.float32)
    x = jnp.asarray(r.randn(n, d).astype(np.float32))
    tgt = jnp.asarray(r.randn(n, d).astype(np.float32))

    mesh = Mesh(np.array(jax.devices()), ("graph",))
    ps, pd, pw = map(jnp.asarray, partition_edges_by_dst(src, dst, w, n, n_sh))

    def loss_fn(agg):
        def loss(xx):
            out = agg(xx, ps, pd, pw)
            return jnp.sum((out - tgt) ** 2)
        return loss

    g_ring = np.asarray(jax.grad(loss_fn(
        sharded_scatter_add(mesh, n, halo="pallas_ring")))(x))
    g_xla = np.asarray(jax.grad(loss_fn(
        sharded_scatter_add(mesh, n, halo="xla")))(x))
    np.testing.assert_allclose(g_ring, g_xla, atol=1e-4, rtol=1e-5)


def test_pallas_halo_rejects_multi_axis_mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    from gcn_grabcut_tpu.parallel.mesh import make_mesh
    from gcn_grabcut_tpu.parallel.partition import sharded_scatter_add
    mesh = make_mesh(n_data=1, n_graph=4)
    with pytest.raises(ValueError, match="single-axis"):
        sharded_scatter_add(mesh, 64, halo="pallas_ring")
