"""Model zoo tests — the analog of the reference TestModel
(reference: tests/test.py:250-354) plus PyG-semantics parity checks of the
dense-adjacency aggregation against independent numpy edge-list references.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcn_grabcut_tpu.core.graph import single_graph, stack_graphs
from gcn_grabcut_tpu.models import (
    build_model, init_model, apply_model, predict_probs,
    probs_to_node_trimap,
)
from gcn_grabcut_tpu.models.layers import (
    dense_adjacency, gcn_norm_adjacency, mean_adjacency,
)
from gcn_grabcut_tpu.models.resgcn import (
    ResGCNNet, resgcn_lr_label, resgcn_group_scales,
)


def make_chain_graph(n, seed, max_nodes=None, max_edges=None):
    """Random features on an n-node chain (reference _make_data,
    tests/test.py:257-272)."""
    r = np.random.RandomState(seed)
    x = r.randn(n, 19).astype(np.float32)
    src = np.concatenate([np.arange(n - 1), np.arange(1, n)])
    dst = np.concatenate([np.arange(1, n), np.arange(n - 1)])
    attr = r.rand(len(src), 5).astype(np.float32)
    attr[len(src) // 2:] = attr[:len(src) // 2]  # symmetric attrs
    y = r.randint(0, 3, n)
    return single_graph(x, src, dst, attr, max_nodes=max_nodes,
                        max_edges=max_edges, y=y)


@pytest.mark.parametrize("variant", ["resgcn", "gcn", "gat"])
class TestForward:
    def test_output_shape_and_finite(self, variant):
        g = make_chain_graph(12, 0)
        m = build_model(variant, hidden_channels=32, n_layers=2)
        vs = init_model(m, jax.random.PRNGKey(0), g)
        out = apply_model(m, vs, g, train=False)
        assert out.shape == (1, 12, 3)
        assert bool(jnp.isfinite(out).all())

    def test_input_sensitivity(self, variant):
        g1 = make_chain_graph(12, 0)
        g2 = make_chain_graph(12, 1)
        m = build_model(variant, hidden_channels=32, n_layers=2)
        vs = init_model(m, jax.random.PRNGKey(0), g1)
        o1 = apply_model(m, vs, g1, train=False)
        o2 = apply_model(m, vs, g2, train=False)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_padding_invariance(self, variant):
        """Valid-node logits must not depend on the padding budget — the
        fixed-shape analog of the reference's batched-equals-single
        invariant (tests/test.py:294-306)."""
        tight = make_chain_graph(10, 3)
        padded = make_chain_graph(10, 3, max_nodes=24, max_edges=64)
        m = build_model(variant, hidden_channels=32, n_layers=2)
        vs = init_model(m, jax.random.PRNGKey(0), tight)
        o1 = np.asarray(apply_model(m, vs, tight, train=False))[0]
        o2 = np.asarray(apply_model(m, vs, padded, train=False))[0, :10]
        np.testing.assert_allclose(o1, o2, atol=1e-4)

    def test_batched_equals_single(self, variant):
        gs = [make_chain_graph(n, seed, max_nodes=16, max_edges=40)
              for n, seed in ((10, 0), (13, 1), (7, 2))]
        batch = stack_graphs(gs)
        m = build_model(variant, hidden_channels=32, n_layers=2)
        vs = init_model(m, jax.random.PRNGKey(0), gs[0])
        ob = np.asarray(apply_model(m, vs, batch, train=False))
        for i, (g, n) in enumerate(zip(gs, (10, 13, 7))):
            oi = np.asarray(apply_model(m, vs, g, train=False))
            np.testing.assert_allclose(ob[i, :n], oi[0, :n], atol=1e-4)


class TestAggregationParity:
    """Dense-adjacency aggregation vs independent numpy edge-list math."""

    def _graph(self, n=9, seed=0):
        r = np.random.RandomState(seed)
        # random undirected graph, stored symmetric
        pairs = set()
        for _ in range(12):
            a, b = r.randint(0, n, 2)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        pairs = sorted(pairs)
        src = np.array([p[0] for p in pairs] + [p[1] for p in pairs])
        dst = np.array([p[1] for p in pairs] + [p[0] for p in pairs])
        return src, dst, n

    def test_gcn_norm_matches_pyg_formula(self):
        src, dst, n = self._graph()
        x = np.random.RandomState(1).randn(n, 4).astype(np.float32)

        adj = dense_adjacency(
            jnp.asarray(src)[None], jnp.asarray(dst)[None],
            jnp.ones((1, len(src))), n)
        agg = np.asarray(
            jnp.einsum("gij,gjd->gid", gcn_norm_adjacency(adj),
                       jnp.asarray(x)[None]))[0]

        # Independent numpy reference: out_i = sum_{j in N(i) ∪ {i}}
        # x_j / sqrt(dhat_i dhat_j), dhat = 1 + degree (PyG GCNConv docs).
        deg = np.zeros(n)
        for d in dst:
            deg[d] += 1
        dhat = deg + 1.0
        ref = np.zeros_like(x)
        for i in range(n):
            ref[i] += x[i] / dhat[i]
            for s, d in zip(src, dst):
                if d == i:
                    ref[i] += x[s] / np.sqrt(dhat[i] * dhat[s])
        np.testing.assert_allclose(agg, ref, atol=1e-5)

    def test_mean_adjacency_matches_sage_aggregation(self):
        src, dst, n = self._graph(seed=2)
        x = np.random.RandomState(2).randn(n, 4).astype(np.float32)
        adj = dense_adjacency(
            jnp.asarray(src)[None], jnp.asarray(dst)[None],
            jnp.ones((1, len(src))), n)
        agg = np.asarray(
            jnp.einsum("gij,gjd->gid", mean_adjacency(adj),
                       jnp.asarray(x)[None]))[0]
        ref = np.zeros_like(x)
        for i in range(n):
            nbrs = [s for s, d in zip(src, dst) if d == i]
            if nbrs:
                ref[i] = x[nbrs].mean(axis=0)
        np.testing.assert_allclose(agg, ref, atol=1e-5)


class TestResGCN:
    def test_param_count_matches_reference(self):
        """Reference publishes 187,826 params at D=128, n=6
        (reference README.md:579)."""
        g = make_chain_graph(8, 0)
        m = build_model("resgcn", hidden_channels=128, n_layers=6)
        vs = init_model(m, jax.random.PRNGKey(0), g)
        n_params = sum(x.size for x in jax.tree.leaves(vs["params"]))
        assert n_params == 187826

    def test_layer_weights_sum_to_one(self):
        g = make_chain_graph(8, 0)
        m = build_model("resgcn", hidden_channels=32, n_layers=4)
        vs = init_model(m, jax.random.PRNGKey(0), g)
        w = np.asarray(ResGCNNet.layer_weights(vs["params"]))
        assert w.shape == (6,)
        assert abs(w.sum() - 1.0) < 1e-5

    def test_lr_groups_decay_towards_input(self):
        scales = resgcn_group_scales(6)
        assert scales["block_0"] < scales["block_5"] <= scales["head"]
        assert resgcn_lr_label(("gcn_2", "kernel"), 6) == "block_2"
        assert resgcn_lr_label(("in_norm", "scale"), 6) == "input"
        assert resgcn_lr_label(("jk_logits",), 6) == "head"

    def test_dropout_only_in_train_mode(self):
        g = make_chain_graph(10, 0)
        m = build_model("resgcn", hidden_channels=32, n_layers=2,
                        dropout=0.5)
        vs = init_model(m, jax.random.PRNGKey(0), g)
        o1 = apply_model(m, vs, g, train=False)
        o2 = apply_model(m, vs, g, train=False)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))
        t1, _ = apply_model(m, vs, g, train=True,
                            dropout_rng=jax.random.PRNGKey(1))
        t2, _ = apply_model(m, vs, g, train=True,
                            dropout_rng=jax.random.PRNGKey(2))
        assert not np.allclose(np.asarray(t1), np.asarray(t2))


class TestTrimapConversion:
    def test_labels_in_opencv_range(self):
        probs = jax.nn.softmax(
            jnp.asarray(np.random.RandomState(0).randn(20, 3)), axis=-1)
        labels = np.asarray(probs_to_node_trimap(probs))
        assert set(np.unique(labels)) <= {0, 1, 2, 3}

    def test_definite_thresholds(self):
        probs = jnp.asarray([
            [0.9, 0.05, 0.05],   # definite BG
            [0.05, 0.05, 0.9],   # definite FG
            [0.4, 0.2, 0.4],     # probable; fg_p == bg_p → PROB_BG
            [0.3, 0.2, 0.5],     # probable FG
        ])
        labels = np.asarray(probs_to_node_trimap(probs, 0.55, 0.55))
        assert labels[0] == 0 and labels[1] == 1
        assert labels[2] == 2 and labels[3] == 3


class TestEnsemble:
    """Inference ensembling (models.factory.stack_variables): the vmapped
    mean-probability forward.  No reference counterpart — used to cut
    posterior variance (PERF.md round 4)."""

    def _model_and_graph(self):
        g = make_chain_graph(10, seed=3)
        model = build_model("resgcn", hidden_channels=16, n_layers=2)
        return model, g

    def test_singleton_ensemble_matches_member(self):
        from gcn_grabcut_tpu.models import stack_variables, is_ensemble
        model, g = self._model_and_graph()
        v = init_model(model, jax.random.PRNGKey(0), g)
        ens = stack_variables([v])
        assert is_ensemble(ens) and not is_ensemble(v)
        p1 = jax.nn.softmax(
            apply_model(model, v, g, train=False).astype(jnp.float32), -1)
        p2 = jax.nn.softmax(
            apply_model(model, ens, g, train=False).astype(jnp.float32), -1)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   atol=1e-5)

    def test_pair_ensemble_is_mean_probability(self):
        from gcn_grabcut_tpu.models import stack_variables
        model, g = self._model_and_graph()
        va = init_model(model, jax.random.PRNGKey(0), g)
        vb = init_model(model, jax.random.PRNGKey(1), g)
        pa = jax.nn.softmax(
            apply_model(model, va, g, train=False).astype(jnp.float32), -1)
        pb = jax.nn.softmax(
            apply_model(model, vb, g, train=False).astype(jnp.float32), -1)
        ens = stack_variables([va, vb])
        pe = jax.nn.softmax(
            apply_model(model, ens, g, train=False).astype(jnp.float32), -1)
        np.testing.assert_allclose(np.asarray(pe),
                                   np.asarray((pa + pb) / 2), atol=1e-5)

    def test_checkpoint_roundtrip_ensemble(self, tmp_path):
        from gcn_grabcut_tpu.train import (save_checkpoint,
                                           load_ensemble_from_checkpoints)
        model, g = self._model_and_graph()
        meta = dict(variant="resgcn",
                    model_kwargs=dict(hidden_channels=16, n_layers=2))
        paths = []
        for s in (0, 1, 2):
            v = init_model(model, jax.random.PRNGKey(s), g)
            p = tmp_path / f"m{s}.msgpack"
            save_checkpoint(p, v["params"], v["batch_stats"], meta)
            paths.append(p)
        mdl, ens, metas = load_ensemble_from_checkpoints(paths)
        assert len(metas) == 3
        logits = apply_model(mdl, ens, g, train=False)
        assert np.isfinite(np.asarray(logits)).all()
        # incompatible architecture refuses loudly
        v = init_model(build_model("resgcn", hidden_channels=8, n_layers=2),
                       jax.random.PRNGKey(9), g)
        bad = tmp_path / "bad.msgpack"
        save_checkpoint(bad, v["params"], v["batch_stats"],
                        dict(variant="resgcn",
                             model_kwargs=dict(hidden_channels=8,
                                               n_layers=2)))
        with pytest.raises(ValueError):
            load_ensemble_from_checkpoints([paths[0], bad])
