"""GrabCut engine tests — analog of reference TestGrabCut
(tests/test.py:31-82) plus min-cut optimality checks against brute force.
"""

import itertools

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from gcn_grabcut_tpu import GrabCut, GrabCutConfig
from gcn_grabcut_tpu.ops.maxflow import grid_mincut, OFFSETS_4, OFFSETS_8
from gcn_grabcut_tpu.ops import gmm as gmm_ops


def _cut_cost(excess, caps, offsets, lab):
    src_cap = np.maximum(excess, 0)
    snk_cap = np.maximum(-excess, 0)
    H, W = excess.shape
    cost = np.sum(snk_cap[lab == 1]) + np.sum(src_cap[lab == 0])
    for c, (dy, dx) in zip(caps, offsets):
        for y in range(H):
            for x in range(W):
                qy, qx = y + dy, x + dx
                if 0 <= qy < H and 0 <= qx < W and lab[y, x] != lab[qy, qx]:
                    cost += c[y, x]
    return cost


class TestMinCut:
    @pytest.mark.parametrize("connectivity,offsets",
                             [(4, OFFSETS_4), (8, OFFSETS_8)])
    def test_optimal_vs_brute_force(self, connectivity, offsets):
        r = np.random.RandomState(3)
        for _ in range(4):
            H, W = 3, 3
            excess = (r.randn(H, W) * 3).astype(np.float32)
            caps = tuple(r.rand(H, W).astype(np.float32) for _ in offsets)
            fg = np.asarray(grid_mincut(
                jnp.asarray(excess), tuple(map(jnp.asarray, caps)),
                connectivity=connectivity))
            best = min(
                _cut_cost(excess, caps, offsets,
                          np.array(bits).reshape(H, W))
                for bits in itertools.product([0, 1], repeat=H * W))
            ours = _cut_cost(excess, caps, offsets, fg.astype(int))
            assert abs(ours - best) < 1e-4

    def test_all_source_and_all_sink(self):
        caps = tuple(jnp.ones((4, 4)) for _ in OFFSETS_4)
        fg = np.asarray(grid_mincut(jnp.full((4, 4), 5.0), caps,
                                    connectivity=4))
        assert fg.all()
        fg = np.asarray(grid_mincut(jnp.full((4, 4), -5.0), caps,
                                    connectivity=4))
        assert not fg.any()


class TestGMM:
    def test_fit_recovers_clusters(self):
        r = np.random.RandomState(0)
        a = r.randn(40, 40, 3) * 2 + np.array([10, 0, 0])
        b = r.randn(40, 40, 3) * 2 + np.array([-10, 5, 0])
        pix = jnp.asarray(np.concatenate([a, b], axis=0), jnp.float32)
        sel = jnp.ones((80, 40))
        comp = jnp.concatenate(
            [jnp.zeros((40, 40), jnp.int32), jnp.ones((40, 40), jnp.int32)])
        g = gmm_ops.fit_gmm(pix, sel, comp, 2)
        means = np.asarray(g["means"])
        np.testing.assert_allclose(means[0], [10, 0, 0], atol=0.5)
        np.testing.assert_allclose(means[1], [-10, 5, 0], atol=0.5)
        # log-prob should prefer the correct cluster
        lp = np.asarray(gmm_ops.gmm_log_prob(pix, g))
        assert np.isfinite(lp).all()

    def test_kmeans_deterministic(self):
        r = np.random.RandomState(1)
        pix = jnp.asarray(r.rand(16, 16, 3), jnp.float32)
        w = jnp.ones((16, 16))
        l1 = np.asarray(gmm_ops.kmeans(pix, w, 3, seed=0))
        l2 = np.asarray(gmm_ops.kmeans(pix, w, 3, seed=0))
        np.testing.assert_array_equal(l1, l2)


@pytest.fixture(scope="module")
def circle(circle_image):
    return circle_image


class TestGrabCut:
    def test_bbox_returns_binary(self, circle):
        img, gt = circle
        gc = GrabCut(img)
        mask = gc.run_with_bbox((20, 20, 88, 88))
        assert mask.shape == img.shape[:2]
        assert set(np.unique(mask)) <= {0, 1}
        m = np.logical_and(mask > 0, gt > 0).sum() / max(
            np.logical_or(mask > 0, gt > 0).sum(), 1)
        assert m > 0.85   # circle fixture is easy

    def test_trimap_mode(self, circle):
        img, gt = circle
        trimap = np.full(img.shape[:2], 2, np.uint8)
        cv2.circle(trimap, (64, 64), 44, 3, -1)
        cv2.circle(trimap, (64, 64), 20, 1, -1)
        trimap[:8, :] = 0
        gc = GrabCut(img)
        mask = gc.run_with_trimap(trimap)
        iou = np.logical_and(mask > 0, gt > 0).sum() / max(
            np.logical_or(mask > 0, gt > 0).sum(), 1)
        assert iou > 0.85

    @pytest.mark.parametrize("cs", ["rgb", "hsv", "lab"])
    def test_colour_spaces(self, circle, cs):
        img, _ = circle
        gc = GrabCut(img, GrabCutConfig(n_iter=2, color_space=cs))
        mask = gc.run_with_bbox((20, 20, 88, 88))
        assert set(np.unique(mask)) <= {0, 1}
        assert mask.sum() > 0

    def test_snapshot_history(self, circle):
        img, _ = circle
        gc = GrabCut(img, GrabCutConfig(n_iter=2))
        gc.run_with_bbox((20, 20, 88, 88))
        gc.refine(1)
        assert [s.tag for s in gc.history] == ["bbox_init", "refinement"]
        assert gc.history[0].fg_pixels + gc.history[0].bg_pixels == \
            img.shape[0] * img.shape[1]

    def test_overlay_and_rgba_shapes(self, circle):
        img, _ = circle
        gc = GrabCut(img, GrabCutConfig(n_iter=1))
        gc.run_with_bbox((20, 20, 88, 88))
        assert gc.overlay_mask().shape == img.shape
        assert gc.crop_foreground().shape == (*img.shape[:2], 4)

    def test_degenerate_trimap_no_crash(self, circle):
        img, _ = circle
        gc = GrabCut(img)
        mask = gc.run_with_trimap(np.full(img.shape[:2], 3, np.uint8))
        assert mask.all()
        assert gc.history[-1].tag == "trimap_degenerate"

    def test_shape_mismatch_raises(self, circle):
        img, _ = circle
        with pytest.raises(ValueError):
            GrabCut(img).run_with_trimap(np.zeros((10, 10), np.uint8))

    def test_refine_before_run_raises(self, circle):
        img, _ = circle
        with pytest.raises(RuntimeError):
            GrabCut(img).refine(1)

    def test_agreement_with_cv2(self, circle):
        """The TPU solver must produce masks equivalent to OpenCV's C++
        implementation on an easy fixture (IoU parity, not bit equality)."""
        img, _ = circle
        ours = GrabCut(img).run_with_bbox((20, 20, 88, 88))
        bgr = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
        cvmask = np.zeros(img.shape[:2], np.uint8)
        bgd = np.zeros((1, 65), np.float64)
        fgd = np.zeros((1, 65), np.float64)
        cv2.grabCut(bgr, cvmask, (20, 20, 88, 88), bgd, fgd, 5,
                    cv2.GC_INIT_WITH_RECT)
        theirs = np.where((cvmask == 1) | (cvmask == 3), 1, 0)
        inter = np.logical_and(ours > 0, theirs > 0).sum()
        union = np.logical_or(ours > 0, theirs > 0).sum()
        assert inter / max(union, 1) > 0.9


class TestMinCutLongDistance:
    def test_distant_seeds_still_optimal(self):
        """Regression: a bounded global-relabel cap used to mark far nodes
        sink-disconnected, yielding a silently suboptimal (13% worse) cut.
        The default cap now scales with the grid diameter."""
        from gcn_grabcut_tpu.native import (native_available,
                                            grid_mincut_native)
        if not native_available():
            pytest.skip("no C++ toolchain")
        r = np.random.RandomState(5)
        H = W = 96
        excess = (r.randn(H, W) * 0.5).astype(np.float32)
        excess[5:12, 5:12] = 500.0
        excess[-12:-5, -12:-5] = -500.0
        caps = tuple((r.rand(H, W) * 2 + 0.5).astype(np.float32)
                     for _ in OFFSETS_8)
        fg_j = np.asarray(grid_mincut(
            jnp.asarray(excess), tuple(map(jnp.asarray, caps)),
            connectivity=8))
        fg_n = grid_mincut_native(excess, caps, 8)
        c_j = _cut_cost_vec(excess, caps, fg_j.astype(int))
        c_n = _cut_cost_vec(excess, caps, fg_n.astype(int))
        assert abs(c_j - c_n) / c_n < 1e-4


def _cut_cost_vec(excess, caps, lab):
    src_cap = np.maximum(excess, 0)
    snk_cap = np.maximum(-excess, 0)
    H, W = excess.shape
    cost = np.sum(snk_cap[lab == 1]) + np.sum(src_cap[lab == 0])
    for c, (dy, dx) in zip(caps, OFFSETS_8):
        a = lab[max(0, dy):H + min(0, dy), max(0, dx):W + min(0, dx)]
        b = lab[max(0, -dy):H + min(0, -dy), max(0, -dx):W + min(0, -dx)]
        cc = c[max(0, -dy):H + min(0, -dy), max(0, -dx):W + min(0, -dx)]
        cost += np.sum(cc * (a != b))
    return cost


class TestMultilevelMinCut:
    @staticmethod
    def _smooth_instance(H, W, seed, gamma=50.0):
        """GrabCut-shaped energy: smooth blob + noise capacities."""
        r = np.random.RandomState(seed)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        cy = H * 0.5 + r.randn() * H * 0.1
        cx = W * 0.5 + r.randn() * W * 0.1
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        img = np.tanh((H * 0.25 - d) / (H * 0.05)) + r.randn(H, W) * 0.3
        caps = []
        for dy, dx in OFFSETS_8:
            sh = np.roll(img, (-dy, -dx), axis=(0, 1))
            dist = np.sqrt(dy * dy + dx * dx)
            caps.append(((gamma / dist)
                         * np.exp(-4.0 * (img - sh) ** 2)).astype(np.float32))
        lam = 9 * gamma
        excess = np.clip(img * 60 + r.randn(H, W) * 20,
                         -lam, lam).astype(np.float32)
        return excess, tuple(caps)

    @pytest.mark.parametrize("levels", [1, 2])
    def test_near_exact_on_grabcut_energies(self, levels):
        """The banded coarse-to-fine cut must agree with the exact solve on
        smooth (natural-image-like) energies: ≥99.5% pixel agreement and
        cut cost within 1%."""
        from gcn_grabcut_tpu.ops.maxflow import grid_mincut_multilevel
        for seed in range(3):
            excess, caps = self._smooth_instance(96, 96, seed)
            ej = jnp.asarray(excess)
            cj = tuple(map(jnp.asarray, caps))
            fg0 = np.asarray(grid_mincut(ej, cj, connectivity=8))
            fgm = np.asarray(grid_mincut_multilevel(
                ej, cj, connectivity=8, levels=levels))
            assert (fg0 == fgm).mean() > 0.995
            c0 = _cut_cost_vec(excess, caps, fg0.astype(int))
            cm = _cut_cost_vec(excess, caps, fgm.astype(int))
            assert cm <= c0 * 1.01 + 1e-6

    def test_coarsening_preserves_total_mass(self):
        """The 2x2 contraction is exact: block excess sums, and every fine
        boundary-crossing arc lands in exactly one coarse arc."""
        from gcn_grabcut_tpu.ops.maxflow import _coarsen_problem
        r = np.random.RandomState(0)
        H = W = 10
        excess = r.randn(H, W).astype(np.float32)
        caps = tuple(r.rand(H, W).astype(np.float32) for _ in OFFSETS_8)
        e_c, caps_c = _coarsen_problem(
            jnp.asarray(excess), tuple(map(jnp.asarray, caps)), 8)
        assert np.isclose(float(jnp.sum(e_c)), excess.sum(), atol=1e-4)
        # total coarse arc mass == total fine crossing-arc mass
        crossing = 0.0
        for c, (dy, dx) in zip(caps, OFFSETS_8):
            c = np.array(c)
            if dy == -1:
                c[0, :] = 0
            if dx == -1:
                c[:, 0] = 0
            if dx == 1:
                c[:, -1] = 0
            for y in range(H):
                for x in range(W):
                    qy, qx = y + dy, x + dx
                    if 0 <= qy < H and 0 <= qx < W and \
                            (y // 2, x // 2) != (qy // 2, qx // 2):
                        crossing += c[y, x]
        coarse_mass = sum(float(jnp.sum(c)) for c in caps_c)
        assert np.isclose(coarse_mass, crossing, rtol=1e-5)

    def test_trivial_uniform_sides(self):
        from gcn_grabcut_tpu.ops.maxflow import grid_mincut_multilevel
        caps = tuple(jnp.ones((16, 16)) for _ in OFFSETS_4)
        fg = np.asarray(grid_mincut_multilevel(
            jnp.full((16, 16), 5.0), caps, connectivity=4, levels=2))
        assert fg.all()
        fg = np.asarray(grid_mincut_multilevel(
            jnp.full((16, 16), -5.0), caps, connectivity=4, levels=2))
        assert not fg.any()

    def test_odd_shapes(self):
        from gcn_grabcut_tpu.ops.maxflow import grid_mincut_multilevel
        excess, caps = self._smooth_instance(95, 97, 1)
        ej = jnp.asarray(excess)
        cj = tuple(map(jnp.asarray, caps))
        fg0 = np.asarray(grid_mincut(ej, cj, connectivity=8))
        fgm = np.asarray(grid_mincut_multilevel(
            ej, cj, connectivity=8, levels=1))
        assert fgm.shape == (95, 97)
        assert (fg0 == fgm).mean() > 0.99


class TestFlowRecycling:
    def test_warm_start_matches_cold_after_terminal_change(self):
        """grid_mincut_stateful resumed after a terminal-capacity change
        must reach the same optimal cut as a cold solve of the new
        instance (Kohli-Torr flow recycling)."""
        from gcn_grabcut_tpu.ops.maxflow import (
            grid_mincut, grid_mincut_stateful, _fresh_residuals)
        r = np.random.RandomState(11)
        H = W = 48
        E0 = (r.randn(H, W) * 4).astype(np.float32)
        caps = tuple((r.rand(H, W) * 2 + 0.2).astype(np.float32)
                     for _ in OFFSETS_8)

        r_fwd, r_bwd = _fresh_residuals(
            tuple(map(jnp.asarray, caps)), OFFSETS_8)
        fg0, e_out, r_fwd, r_bwd = grid_mincut_stateful(
            jnp.asarray(E0), r_fwd, r_bwd, connectivity=8)

        # Perturb terminals and resume from the carried state.
        E1 = E0 + (r.randn(H, W) * 2).astype(np.float32)
        e0 = e_out + jnp.asarray(E1 - E0)
        fg_warm, _, _, _ = grid_mincut_stateful(
            e0, r_fwd, r_bwd, connectivity=8)

        fg_cold = grid_mincut(jnp.asarray(E1),
                              tuple(map(jnp.asarray, caps)),
                              connectivity=8)
        c_warm = _cut_cost_vec(E1, caps, np.asarray(fg_warm).astype(int))
        c_cold = _cut_cost_vec(E1, caps, np.asarray(fg_cold).astype(int))
        assert abs(c_warm - c_cold) <= 1e-3 * max(abs(c_cold), 1.0)
