"""10k+-superpixel configuration (SURVEY §5.7): blocked prior contrast,
blocked non-local k-NN, and the end-to-end large-graph pipeline path.

The blocked kernels must reproduce the dense-path numbers (the dense
implementations are the oracles), and `pipeline.segment` must route
K > 2048 graphs through the banded-SpMM model path without materialising
dense K x K state.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from gcn_grabcut_tpu.ops.prior import (
    compute_auto_prior, _contrast_blocked)
from gcn_grabcut_tpu.ops.edges import (
    nonlocal_pairs_banded, nonlocal_budget)


class TestBlockedContrast:
    def test_matches_dense_formula(self):
        r = np.random.RandomState(0)
        k = 300
        ml = jnp.asarray(r.rand(k, 3) * 100, jnp.float32)
        ct = jnp.asarray(r.rand(k, 2), jnp.float32)
        aw = jnp.asarray(r.rand(k), jnp.float32)
        aw = aw / aw.sum()

        dense_cd = jnp.linalg.norm(ml[:, None, :] - ml[None, :, :], axis=2)
        dense_sd = jnp.linalg.norm(ct[:, None, :] - ct[None, :, :], axis=2)
        dense = jnp.sum(dense_cd * jnp.exp(-(dense_sd ** 2) / (2 * 0.4 ** 2))
                        * aw[None, :], axis=1)

        blocked = _contrast_blocked(ml, ct, aw, k, 0.4)
        np.testing.assert_allclose(np.asarray(blocked), np.asarray(dense),
                                   rtol=1e-5, atol=1e-5)

    def test_prior_large_k_path_finite(self):
        # K above LARGE_K_THRESHOLD exercises the blocked branch end to end.
        r = np.random.RandomState(1)
        H = W = 128
        k = 2500
        segments = jnp.asarray(r.randint(0, k, (H, W)), jnp.int32)
        lab = jnp.asarray(r.rand(H, W, 3) * 100, jnp.float32)
        prior = np.asarray(compute_auto_prior(segments, lab, k))
        assert prior.shape == (k, 3)
        assert np.isfinite(prior).all()
        assert (prior >= 0).all() and (prior <= 1).all()


class TestBandedNonlocal:
    def test_window_exclusion_and_validity(self):
        r = np.random.RandomState(2)
        k = 600
        ml = jnp.asarray(r.rand(k, 3) * 100, jnp.float32)
        valid = jnp.ones(k, jnp.float32)
        win = 25
        pairs, mask = nonlocal_pairs_banded(ml, valid, k, 4,
                                            exclude_window=win, block=256)
        assert pairs.shape == (nonlocal_budget(k, 4), 2)
        m = np.asarray(mask) > 0
        p = np.asarray(pairs)[m]
        assert len(p) > 0
        # No pair inside the exclusion window; all ids valid.
        assert (np.abs(p[:, 0] - p[:, 1]) > win).all()
        assert (p >= 0).all() and (p < k).all()

    def test_finds_colour_nearest(self):
        # Two far-apart indices with identical colour must be paired.
        r = np.random.RandomState(3)
        k = 300
        ml = r.rand(k, 3).astype(np.float32) * 100
        ml[250] = ml[10]        # exact colour twin, index distance 240
        pairs, mask = nonlocal_pairs_banded(
            jnp.asarray(ml), jnp.ones(k, jnp.float32), k, 2,
            exclude_window=20, block=128)
        m = np.asarray(mask) > 0
        p = {tuple(q) for q in np.asarray(pairs)[m].tolist()}
        assert (10, 250) in p

    def test_masked_nodes_excluded(self):
        r = np.random.RandomState(4)
        k = 200
        ml = jnp.asarray(r.rand(k, 3), jnp.float32)
        valid = jnp.ones(k, jnp.float32).at[50:100].set(0.0)
        pairs, mask = nonlocal_pairs_banded(ml, valid, k, 3,
                                            exclude_window=5, block=128)
        m = np.asarray(mask) > 0
        p = np.asarray(pairs)[m]
        assert not np.isin(p, np.arange(50, 100)).any()


class TestLargeVariants:
    def test_gcn_variant_matches_dense_on_spmm_path(self):
        """GCNTrimapNet through apply_large must match its dense forward."""
        import jax.random as jr
        import jax.numpy as jnp
        from gcn_grabcut_tpu import build_model, init_model
        from gcn_grabcut_tpu.models.factory import apply_model
        from gcn_grabcut_tpu.models.large import apply_large
        from gcn_grabcut_tpu.core.graph import make_graph_batch

        r = np.random.RandomState(2)
        K, E = 60, 200
        src = r.randint(0, K, E)
        dst = r.randint(0, K, E)
        g = make_graph_batch(
            x=r.randn(1, K, 19).astype(np.float32),
            edge_src=src[None], edge_dst=dst[None],
            edge_attr=r.rand(1, E, 5).astype(np.float32),
            node_mask=np.ones((1, K), np.float32),
            edge_mask=np.ones((1, E), np.float32))
        m = build_model("gcn", hidden_channels=16, n_layers=2)
        vs = init_model(m, jr.PRNGKey(0), g)
        dense_out = np.asarray(apply_model(m, vs, g, train=False))
        spmm_out = np.asarray(apply_large(m, vs, g))
        np.testing.assert_allclose(spmm_out, dense_out, rtol=2e-3,
                                   atol=2e-3)

    def test_gat_runs_at_large_k_through_pipeline(self):
        """GATv2 has no dense adjacency (edge-list segment ops, O(E)), so
        the pipeline routes it through its normal forward at K > 2048."""
        import jax.random as jr
        from gcn_grabcut_tpu import (GCNGrabCutPipeline,
                                     SuperpixelGraphConfig, build_graph,
                                     build_model, init_model)
        r = np.random.RandomState(7)
        img = (r.rand(224, 224, 3) * 255).astype(np.uint8)
        cfg = SuperpixelGraphConfig(n_segments=2600)
        g = build_graph(img, cfg)
        assert g.n_nodes > 2048
        m = build_model("gat", hidden_channels=16, n_layers=2)
        vs = init_model(m, jr.PRNGKey(0), g.graph)
        pipe = GCNGrabCutPipeline(m, vs, sp_config=cfg)
        probs = pipe.predict_probs(g)
        assert probs.shape == (g.n_nodes, 3)
        assert np.isfinite(probs).all()

    def test_unsupported_model_raises_clear_error(self):
        from gcn_grabcut_tpu.models.large import apply_large
        from gcn_grabcut_tpu.core.graph import make_graph_batch

        r = np.random.RandomState(3)
        K, E = 30, 80
        g = make_graph_batch(
            x=r.randn(1, K, 19).astype(np.float32),
            edge_src=r.randint(0, K, E)[None],
            edge_dst=r.randint(0, K, E)[None],
            edge_attr=r.rand(1, E, 5).astype(np.float32),
            node_mask=np.ones((1, K), np.float32),
            edge_mask=np.ones((1, E), np.float32))

        class NoLargePath:
            pass

        with pytest.raises(ValueError, match="large-graph forward"):
            apply_large(NoLargePath(), {}, g)


class TestLargePipeline:
    def test_segment_end_to_end_large_k(self):
        """Image → blocked fused build → banded-SpMM forward → GrabCut at
        K > 2048 (the scaled-down version of the 1536 px / 10k-segment
        configuration benched in tools/bench_large.py)."""
        import jax.random as jr
        from gcn_grabcut_tpu import (GCNGrabCutPipeline,
                                     SuperpixelGraphConfig, build_graph,
                                     build_model, init_model)

        r = np.random.RandomState(5)
        H = W = 320
        yy, xx = np.mgrid[0:H, 0:W]
        img = (r.rand(H, W, 3) * 80).astype(np.uint8)
        blob = ((yy - 160) ** 2 + (xx - 150) ** 2) < 90 ** 2
        img[blob] = (200 + r.rand(blob.sum(), 3) * 50).astype(np.uint8)

        cfg = SuperpixelGraphConfig(n_segments=2600)
        g = build_graph(img, cfg)
        assert g.n_nodes > 2048

        m = build_model("resgcn", hidden_channels=16, n_layers=2)
        vs = init_model(m, jr.PRNGKey(0), g.graph)
        pipe = GCNGrabCutPipeline(m, vs, sp_config=cfg)
        probs = pipe.predict_probs(g)
        assert probs.shape == (g.n_nodes, 3)
        assert np.isfinite(probs).all()

        res = pipe.segment(img)
        assert res.binary_mask.shape == (H, W)
        assert set(np.unique(res.binary_mask)) <= {0, 1}
