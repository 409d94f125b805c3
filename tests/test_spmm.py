"""Banded-dense SpMM: plan compilation + blocked algorithm correctness.

The XLA shifted-view path runs on any backend (it doubles as the interpret
oracle); the Pallas variant only lowers on real TPU hardware (covered by
tools/bench_spmm.py).  These tests validate the banded-dense plan
compilation against the scatter oracle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gcn_grabcut_tpu.ops.spmm import (
    spmm_plan, spmm_plan_device, banded_spmm, spmm_reference,
)


def _random_banded(n, e_local, e_far, seed=0, band=200):
    r = np.random.RandomState(seed)
    src_l = r.randint(0, n, e_local)
    dst_l = np.clip(src_l + r.randint(-band, band, e_local), 0, n - 1)
    src = np.concatenate([src_l, r.randint(0, n, e_far)])
    dst = np.concatenate([dst_l, r.randint(0, n, e_far)])
    w = r.rand(len(src)).astype(np.float32)
    return src, dst, w


class TestSpmmPlan:
    def test_weight_is_conserved(self):
        n = 640
        src, dst, w = _random_banded(n, 3000, 150)
        plan = spmm_plan(src, dst, w, n, block_rows=128, window=256)
        np.testing.assert_allclose(
            plan.band.sum() + plan.fb_weight.sum(), w.sum(), rtol=1e-5)

    def test_band_shape_and_window(self):
        n = 600
        src, dst, w = _random_banded(n, 500, 0)
        plan = spmm_plan(src, dst, w, n, block_rows=128, window=300)
        # window rounds up to a whole number of R-blocks; N pads to R.
        assert plan.window == 384 and plan.k_blocks == 3
        assert plan.n_nodes == 640
        assert plan.band.shape == (3, 640, 128)

    def test_fallback_sorted_by_dst(self):
        n = 1024
        src, dst, w = _random_banded(n, 500, 400, band=900)
        plan = spmm_plan(src, dst, w, n, block_rows=128, window=128)
        assert (np.diff(plan.fb_dst) >= 0).all()

    def test_zero_weight_edges_dropped(self):
        src = np.array([0, 1, 2])
        dst = np.array([1, 2, 3])
        w = np.array([1.0, 0.0, 1.0], np.float32)
        plan = spmm_plan(src, dst, w, 128, block_rows=128, window=128)
        assert plan.band.sum() + plan.fb_weight.sum() == 2.0

    def test_duplicate_edges_accumulate(self):
        src = np.array([3, 3, 3])
        dst = np.array([7, 7, 7])
        w = np.array([1.0, 2.0, 4.0], np.float32)
        plan = spmm_plan(src, dst, w, 128)
        x = jnp.zeros((128, 8)).at[3].set(1.0)
        out = banded_spmm(x, plan, interpret=True)
        np.testing.assert_allclose(np.asarray(out[7]), np.full(8, 7.0))


class TestBandedSpmm:
    @pytest.mark.parametrize("n,e_local,e_far", [
        (256, 1500, 50), (1024, 6000, 200), (700, 4000, 0),
    ])
    def test_matches_scatter_oracle(self, n, e_local, e_far):
        src, dst, w = _random_banded(n, e_local, e_far, seed=n)
        plan = spmm_plan(src, dst, w, n, block_rows=128, window=512)
        x = jnp.asarray(
            np.random.RandomState(1).randn(n, 64), jnp.float32)
        ref = spmm_reference(x, src, dst, w, n)
        out = banded_spmm(x, plan, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)

    def test_bf16_default_path_tolerance(self):
        """The TPU-default bf16 contraction stays within training-dtype
        error of the oracle (same XLA program the chip runs)."""
        n = 512
        src, dst, w = _random_banded(n, 3000, 100, seed=5)
        plan = spmm_plan(src, dst, w, n)
        x = jnp.asarray(np.random.RandomState(7).randn(n, 32), jnp.float32)
        ref = spmm_reference(x, src, dst, w, n)
        out = banded_spmm(x, plan, precision="default", backend="xla")
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(out - ref))) / scale < 2e-2

    def test_highest_precision_is_exact(self):
        n = 512
        src, dst, w = _random_banded(n, 3000, 100, seed=2)
        plan = spmm_plan(src, dst, w, n)
        x = jnp.asarray(np.random.RandomState(3).randn(n, 32), jnp.float32)
        ref = spmm_reference(x, src, dst, w, n)
        out = banded_spmm(x, plan, interpret=True, precision="highest")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_empty_graph(self):
        plan = spmm_plan(np.zeros(0, int), np.zeros(0, int),
                         np.zeros(0, np.float32), 128)
        x = jnp.ones((128, 32))
        out = banded_spmm(x, plan, interpret=True)
        assert float(jnp.abs(out).max()) == 0.0

    def test_all_edges_out_of_window(self):
        # Sources maximally far from destinations: everything falls back.
        n = 1024
        src = np.zeros(500, int)
        dst = np.full(500, n - 1)
        w = np.ones(500, np.float32)
        plan = spmm_plan(src, dst, w, n, block_rows=128, window=128)
        assert len(plan.fb_src) == 500
        x = jnp.asarray(np.random.RandomState(0).randn(n, 32), jnp.float32)
        ref = spmm_reference(x, src, dst, w, n)
        out = banded_spmm(x, plan, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)


class TestSpmmPlanDevice:
    def test_band_matches_host_plan(self):
        n = 900
        src, dst, w = _random_banded(n, 4000, 200, seed=11)
        host = spmm_plan(src, dst, w, n, block_rows=128, window=384)
        dev = spmm_plan_device(jnp.asarray(src), jnp.asarray(dst),
                               jnp.asarray(w), n, block_rows=128,
                               window=384)
        assert (dev.n_nodes, dev.k_blocks) == (host.n_nodes, host.k_blocks)
        np.testing.assert_allclose(np.asarray(dev.band), host.band,
                                   atol=1e-5)
        # Same out-of-window mass (the device fallback keeps all E slots
        # with in-window weights zeroed).
        np.testing.assert_allclose(float(jnp.sum(dev.fb_weight)),
                                   host.fb_weight.sum(), rtol=1e-5)
        assert (np.diff(np.asarray(dev.fb_dst)) >= 0).all()

    def test_matches_scatter_oracle(self):
        n = 700
        src, dst, w = _random_banded(n, 3000, 150, seed=13)
        plan = spmm_plan_device(jnp.asarray(src), jnp.asarray(dst),
                                jnp.asarray(w), n, block_rows=128,
                                window=512)
        x = jnp.asarray(np.random.RandomState(4).randn(n, 48), jnp.float32)
        ref = spmm_reference(x, src, dst, w, n)
        out = banded_spmm(x, plan, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)

    def test_masked_edges_contribute_nothing(self):
        # Zero-weight (masked / padded) edges are kept for static shapes
        # but must not change the product.
        n = 256
        src = np.array([1, 2, 3, 200])
        dst = np.array([2, 3, 4, 10])
        w = np.array([1.0, 0.0, 2.0, 0.0], np.float32)
        plan = spmm_plan_device(jnp.asarray(src), jnp.asarray(dst),
                                jnp.asarray(w), n, block_rows=128,
                                window=128)
        x = jnp.asarray(np.random.RandomState(1).randn(n, 16), jnp.float32)
        ref = spmm_reference(x, src, dst, w, n)
        out = banded_spmm(x, plan, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)

    def test_gcn_plans_device_match_host(self):
        from gcn_grabcut_tpu.models.large import (
            build_gcn_plans, build_gcn_plans_device)
        r = np.random.RandomState(3)
        n, e = 500, 3000
        src = r.randint(0, n, e)
        dst = np.clip(src + r.randint(-80, 80, e), 0, n - 1)
        mask = (r.rand(e) > 0.2).astype(np.float32)
        host = build_gcn_plans(src, dst, mask, n, window=384)
        dev = build_gcn_plans_device(jnp.asarray(src), jnp.asarray(dst),
                                     jnp.asarray(mask), n, window=384)
        x = jnp.asarray(r.randn(host[0].n_nodes, 32), jnp.float32)
        for hp, dp in zip(host, dev):
            np.testing.assert_allclose(np.asarray(dp.band), hp.band,
                                       atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(banded_spmm(x, dp, interpret=True)),
                np.asarray(banded_spmm(x, hp, interpret=True)), atol=1e-4)


class TestLargeGraphPath:
    def test_matches_dense_model_path(self):
        """ResGCNNet through SpMM aggregators must equal the dense
        adjacency path (the numerical contract that lets the 10k+-node
        configuration reuse the same trained weights)."""
        import jax
        from gcn_grabcut_tpu.core.graph import single_graph
        from gcn_grabcut_tpu.models import (
            build_model, init_model, apply_model)
        from gcn_grabcut_tpu.models.large import apply_large

        r = np.random.RandomState(0)
        n = 400
        x = r.randn(n, 19).astype(np.float32)
        src_l = r.randint(0, n, 2000)
        dst_l = np.clip(src_l + r.randint(-60, 60, 2000), 0, n - 1)
        keep = src_l != dst_l
        src = np.concatenate([src_l[keep], dst_l[keep]])
        dst = np.concatenate([dst_l[keep], src_l[keep]])
        attr = r.rand(len(src), 5).astype(np.float32)
        g = single_graph(x, src, dst, attr)

        m = build_model("resgcn", hidden_channels=32, n_layers=2)
        vs = init_model(m, jax.random.PRNGKey(0), g)
        dense_out = np.asarray(apply_model(m, vs, g, train=False))
        large_out = np.asarray(apply_large(m, vs, g, interpret=True))
        np.testing.assert_allclose(dense_out, large_out, atol=1e-4)
