"""Graph construction invariants — the analog of the reference's
TestGraphBuilder (reference: tests/test.py:87-155), adapted to the
fixed-shape, masked-node representation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gcn_grabcut_tpu import (
    build_graph, SuperpixelGraphConfig, N_NODE_FEATS, N_EDGE_FEATS,
)
from gcn_grabcut_tpu.ops import slic as slic_ops


@pytest.fixture(scope="module")
def graph(test_image):
    return build_graph(test_image, SuperpixelGraphConfig(n_segments=80))


class TestSlic:
    def test_labels_in_static_range(self, test_image):
        from gcn_grabcut_tpu.ops import image as im
        lab = im.rgb_to_lab(jnp.asarray(test_image, jnp.float32))
        seg = np.asarray(slic_ops.slic(lab, n_segments=80))
        K = slic_ops.slic_num_labels(*test_image.shape[:2], 80)
        assert seg.min() >= 0 and seg.max() < K
        assert seg.shape == test_image.shape[:2]

    def test_segments_are_locally_coherent(self):
        # On a smooth image, labels must form coherent blobs (no speckle).
        from gcn_grabcut_tpu.ops import image as im
        xx, yy = np.meshgrid(np.arange(128), np.arange(96))
        smooth = np.stack([xx * 2 % 256, yy * 2 % 256, (xx + yy) % 256],
                          -1).astype(np.uint8)
        lab = im.rgb_to_lab(jnp.asarray(smooth, jnp.float32))
        seg = np.asarray(slic_ops.slic(lab, n_segments=80))
        up = np.roll(seg, 1, 0)
        lf = np.roll(seg, 1, 1)
        assert ((seg == up) | (seg == lf)).mean() > 0.95

    def test_few_orphan_pixels(self, test_image):
        from gcn_grabcut_tpu.ops import image as im
        lab = im.rgb_to_lab(jnp.asarray(test_image, jnp.float32))
        seg = np.asarray(slic_ops.slic(lab, n_segments=80))
        p = np.pad(seg, 1, mode="edge")
        nb = [p[:-2, 1:-1], p[2:, 1:-1], p[1:-1, :-2], p[1:-1, 2:]]
        orphan = np.logical_and.reduce([seg != n for n in nb])
        assert orphan.mean() < 2e-3

    def test_every_label_connected(self, test_image):
        from gcn_grabcut_tpu.ops import image as im
        from scipy import ndimage
        lab = im.rgb_to_lab(jnp.asarray(test_image, jnp.float32))
        seg = np.asarray(slic_ops.slic(lab, n_segments=80))
        for l in range(seg.max() + 1):
            m = seg == l
            if m.any():
                assert ndimage.label(m)[1] == 1, f"label {l} disconnected"

    def test_roughly_uniform_sizes(self, test_image):
        from gcn_grabcut_tpu.ops import image as im
        lab = im.rgb_to_lab(jnp.asarray(test_image, jnp.float32))
        seg = np.asarray(slic_ops.slic(lab, n_segments=80))
        K = slic_ops.slic_num_labels(*test_image.shape[:2], 80)
        counts = np.bincount(seg.ravel(), minlength=K)
        # Average region ~HW/K pixels; no region should be gigantic.
        assert counts.max() < 8 * test_image.shape[0] * test_image.shape[1] / K


class TestUniqueCountsStatic:
    def test_matches_jnp_unique(self):
        """The sort+sorted-segment dedup must match jnp.unique exactly:
        ascending uniques, counts, sentinel handling, truncation, and
        empty-slot fill."""
        import jax.numpy as jnp
        from gcn_grabcut_tpu.ops.edges import unique_counts_static
        r = np.random.RandomState(0)
        sent = 10_000
        cases = [
            r.randint(0, 40, 500),                      # few uniques
            np.where(r.rand(300) < 0.7, sent,
                     r.randint(0, 40, 300)),            # sentinel-heavy
            r.randint(0, 5000, 2000),                   # overflow vs size
            np.full(16, sent),                          # all sentinel
        ]
        for codes in cases:
            codes = codes.astype(np.int32)
            for size in (8, 64, 256):
                u0, c0 = jnp.unique(jnp.asarray(codes), size=size,
                                    fill_value=sent, return_counts=True)
                u1, c1 = unique_counts_static(jnp.asarray(codes), size,
                                              sent)
                np.testing.assert_array_equal(np.asarray(u0),
                                              np.asarray(u1))
                np.testing.assert_array_equal(np.asarray(c0),
                                              np.asarray(c1))


class TestGraphBuild:
    def test_shapes_and_masks(self, graph, test_image):
        g = graph.graph
        K = graph.n_nodes
        assert g.x.shape == (1, K, N_NODE_FEATS)
        assert g.edge_attr.shape[2] == N_EDGE_FEATS
        assert g.edge_src.shape == g.edge_dst.shape == g.edge_mask.shape
        assert graph.segments.shape == test_image.shape[:2]
        # Every pixel's label is a valid (unmasked) node.
        mask = np.asarray(g.node_mask[0])
        assert mask[np.unique(graph.segments)].all()

    def test_features_finite_and_scaled(self, graph):
        x = np.asarray(graph.graph.x[0])
        assert np.isfinite(x).all()
        # Colour channels min-max normalised to [0, 1].
        assert x[:, 0:6].min() >= -1e-5 and x[:, 0:6].max() <= 1 + 1e-5

    def test_edges_valid_and_symmetric(self, graph):
        g = graph.graph
        src = np.asarray(g.edge_src[0])
        dst = np.asarray(g.edge_dst[0])
        em = np.asarray(g.edge_mask[0]) > 0
        K = graph.n_nodes
        assert em.sum() > 0
        assert src[em].max() < K and dst[em].max() < K
        assert (src[em] != dst[em]).all()
        # Stored symmetric: the set of (src, dst) equals the set of (dst, src).
        fwd = set(zip(src[em].tolist(), dst[em].tolist()))
        rev = set(zip(dst[em].tolist(), src[em].tolist()))
        assert fwd == rev

    def test_edge_attrs_in_range(self, graph):
        g = graph.graph
        ea = np.asarray(g.edge_attr[0])
        em = np.asarray(g.edge_mask[0]) > 0
        assert np.isfinite(ea).all()
        assert ea[em][:, 0].max() <= 1 + 1e-5   # delta-E normalised
        assert ea[em][:, 1].max() <= 1 + 1e-5   # centroid distance normalised
        assert set(np.unique(ea[em][:, 4])) <= {0.0, 1.0}  # non-local flag

    def test_nonlocal_edges_have_zero_shared_boundary(self, graph):
        ea = np.asarray(graph.graph.edge_attr[0])
        em = np.asarray(graph.graph.edge_mask[0]) > 0
        nl = ea[em][:, 4] > 0
        assert nl.any()
        assert (ea[em][nl][:, 2] == 0).all()

    def test_prior_in_unit_range(self, graph):
        pr = graph.prior
        assert np.isfinite(pr).all()
        assert pr.min() >= 0 and pr.max() <= 1 + 1e-5
        # fg-ness and bg-ness should not be identical fields.
        assert not np.allclose(pr[:, 0], pr[:, 1])

    def test_prior_peaks_on_contrasting_centre(self, circle_image):
        img, mask = circle_image
        rg = build_graph(img, SuperpixelGraphConfig(n_segments=100))
        K = rg.n_nodes
        counts = np.bincount(rg.segments.ravel(), minlength=K)
        fg_cov = np.bincount(rg.segments.ravel(),
                             weights=mask.ravel().astype(np.float64),
                             minlength=K) / np.maximum(counts, 1)
        fg_nodes = fg_cov > 0.8
        bg_nodes = fg_cov < 0.2
        assert fg_nodes.any() and bg_nodes.any()
        # Disc regions should carry a clearly higher fg prior than border bg.
        assert rg.prior[fg_nodes, 0].mean() > rg.prior[bg_nodes, 0].mean() + 0.2
        assert rg.prior[bg_nodes, 1].mean() > rg.prior[fg_nodes, 1].mean() + 0.2

    def test_connectivity_8_builds(self, test_image):
        rg = build_graph(test_image, SuperpixelGraphConfig(
            n_segments=60, connectivity=8))
        em = np.asarray(rg.graph.edge_mask[0])
        assert em.sum() > 0


class TestBoundaryConnectivityPrior:
    """Geodesic background cue (ops/prior.boundary_connectivity_bg) —
    the frame/low-key-robust opt-in replacing the border-colour model."""

    def test_chain_graph_distances(self):
        import jax.numpy as jnp
        from gcn_grabcut_tpu.ops.prior import boundary_connectivity_bg
        # 0 - 1 - 2 - 3 chain; node 0 is the border seed.  Edge LAB jumps:
        # 0-1 small (below floor), 1-2 huge, 2-3 small.
        mean_lab = jnp.asarray([[0., 0, 0], [5., 0, 0],
                                [60., 0, 0], [63., 0, 0]])
        pairs = jnp.asarray([[0, 1], [1, 2], [2, 3]], jnp.int32)
        mask = jnp.ones(3, jnp.float32)
        border = jnp.asarray([4., 0, 0, 0])
        valid = jnp.ones(4, jnp.float32)
        bg = np.asarray(boundary_connectivity_bg(
            pairs, mask, mean_lab, border, valid, 4, n_iters=8,
            geo_sigma=24.0, geo_floor=8.0))
        assert bg[0] == 1.0                       # seed at distance 0
        assert bg[1] > 0.99                       # below-floor hop is free
        assert bg[2] < 0.2 and bg[3] < 0.2        # behind the colour edge
        assert bg[2] >= bg[3] - 1e-6              # monotone along the path

    def test_masked_edges_do_not_leak(self):
        import jax.numpy as jnp
        from gcn_grabcut_tpu.ops.prior import boundary_connectivity_bg
        mean_lab = jnp.zeros((3, 3))
        pairs = jnp.asarray([[0, 1], [1, 2]], jnp.int32)
        mask = jnp.asarray([1.0, 0.0])            # 1-2 link is padding
        border = jnp.asarray([2., 0, 0])
        valid = jnp.ones(3, jnp.float32)
        bg = np.asarray(boundary_connectivity_bg(
            pairs, mask, mean_lab, border, valid, 3, n_iters=6))
        assert bg[1] > 0.99
        assert bg[2] < 1e-3                       # unreachable through padding

    def test_framed_low_key_photo_regression(self):
        """On a framed photo the border-colour model inverts (the frame IS
        the border); the geodesic cue must mark the interior background —
        colour-connected to the frame — as bg while the bright subject
        stays fg (VERDICT r4 Weak #5)."""
        import cv2
        H, W = 192, 256
        img = np.full((H, W, 3), 28, np.uint8)       # dark frame
        r = np.random.RandomState(0)
        # low-key interior: dark background with mild texture, near the
        # frame colour → geodesically connected to the border
        img[20:-20, 20:-20] = 38
        img[20:-20, 20:-20] += r.randint(0, 8, (H - 40, W - 40, 3),
                                         dtype=np.uint8)
        cv2.ellipse(img, (128, 96), (45, 34), 0, 0, 360, (235, 228, 220), -1)

        rg = build_graph(img, SuperpixelGraphConfig(
            n_segments=150, bg_connectivity=True))
        seg, pr = rg.segments, rg.prior
        obj = np.zeros((H, W), bool)
        cv2.ellipse(obj.view(np.uint8).reshape(H, W), (128, 96), (35, 26),
                    0, 0, 360, 1, -1)
        interior_bg = np.zeros((H, W), bool)
        interior_bg[30:60, 30:90] = True            # inside frame, off-object
        obj_ids = np.unique(seg[obj])
        bg_ids = np.setdiff1d(np.unique(seg[interior_bg]), obj_ids)
        assert pr[bg_ids, 1].mean() > pr[obj_ids, 1].mean() + 0.4
        assert pr[obj_ids, 0].mean() > pr[bg_ids, 0].mean() + 0.2

    def test_no_nonlocal_option(self, test_image):
        rg = build_graph(test_image, SuperpixelGraphConfig(
            n_segments=60, n_nonlocal=0))
        ea = np.asarray(rg.graph.edge_attr[0])
        em = np.asarray(rg.graph.edge_mask[0]) > 0
        assert (ea[em][:, 4] == 0).all()

    def test_node_areas_sum_to_one(self, graph):
        areas = graph.node_areas
        assert abs(areas.sum() - 1.0) < 1e-4
