"""Mesh-backed neighbourhood aggregation plugged into the model forward.

The ring (`lax.ppermute`) and all-gather halo-exchange aggregators must
reproduce the dense-adjacency model output exactly (same weights, same
graph) on an 8-virtual-device CPU mesh — the numerical contract that lets
the 10k+-node multi-chip configuration reuse trained checkpoints.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gcn_grabcut_tpu.core.graph import single_graph
from gcn_grabcut_tpu.models import build_model, init_model, apply_model
from gcn_grabcut_tpu.parallel.mesh import make_mesh
from gcn_grabcut_tpu.parallel.partition import mesh_aggregators


def _graph(n=96, e=500, seed=0):
    r = np.random.RandomState(seed)
    x = r.randn(n, 19).astype(np.float32)
    src_l = r.randint(0, n, e)
    dst_l = np.clip(src_l + r.randint(-20, 20, e), 0, n - 1)
    keep = src_l != dst_l
    src = np.concatenate([src_l[keep], dst_l[keep]])
    dst = np.concatenate([dst_l[keep], src_l[keep]])
    attr = r.rand(len(src), 5).astype(np.float32)
    return single_graph(x, src, dst, attr)


@pytest.mark.parametrize("method", ["ring", "allgather"])
def test_matches_dense_model_path(method):
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    g = _graph()
    model = build_model("resgcn", hidden_channels=32, n_layers=2)
    vs = init_model(model, jax.random.PRNGKey(0), g)
    dense_out = np.asarray(apply_model(model, vs, g, train=False))

    mesh = make_mesh(n_data=1, n_graph=4)
    aggs = mesh_aggregators(
        mesh, np.asarray(g.edge_src[0]), np.asarray(g.edge_dst[0]),
        np.asarray(g.edge_mask[0]), g.max_nodes, method=method)
    with mesh:
        out = np.asarray(model.apply(vs, g, train=False, aggregators=aggs))
    np.testing.assert_allclose(out, dense_out, atol=2e-4, rtol=2e-4)


def test_ring_weighted_aggregation_exact():
    """The ring scatter with weight-carrying masks equals the weighted
    scatter oracle."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    from gcn_grabcut_tpu.parallel.partition import (
        partition_edges_2d, ring_scatter_add)
    r = np.random.RandomState(1)
    n, e, d = 64, 400, 8
    src = r.randint(0, n, e).astype(np.int32)
    dst = r.randint(0, n, e).astype(np.int32)
    w = r.rand(e).astype(np.float32)
    x = r.randn(n, d).astype(np.float32)

    mesh = make_mesh(n_data=1, n_graph=4)
    s2, d2, w2 = partition_edges_2d(src, dst, w, n, 4)
    agg = ring_scatter_add(mesh, n)
    with mesh:
        out = np.asarray(agg(jnp.asarray(x), jnp.asarray(s2),
                             jnp.asarray(d2), jnp.asarray(w2)))
    ref = np.zeros_like(x)
    np.add.at(ref, dst, x[src] * w[:, None])
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
