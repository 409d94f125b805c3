"""Data-layer robustness: caching, corrupt-entry rebuild, decode failure
isolation, deterministic augmentation — the aux subsystems of SURVEY §5.3.
"""

import time

import cv2
import numpy as np
import pytest

from gcn_grabcut_tpu.data.dataset import (
    prepare_dataset, materialise, list_image_mask_pairs, augment_sample,
    make_synthetic_dataset,
)
from gcn_grabcut_tpu.graph_build import SuperpixelGraphConfig


@pytest.fixture()
def pair_dirs(tmp_path, circle_image):
    img, mask = circle_image
    (tmp_path / "imgs").mkdir()
    (tmp_path / "masks").mkdir()
    for i in range(3):
        cv2.imwrite(str(tmp_path / "imgs" / f"s{i}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(tmp_path / "masks" / f"s{i}.png"), mask * 255)
    # one image without a mask
    cv2.imwrite(str(tmp_path / "imgs" / "orphan.png"),
                cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return tmp_path / "imgs", tmp_path / "masks"


class TestDescriptors:
    def test_missing_masks_are_skipped(self, pair_dirs):
        imgs, masks = pair_dirs
        descs = list_image_mask_pairs(imgs, masks)
        assert len(descs) == 3
        assert all(d["aug_seed"] is None for d in descs)

    def test_aug_seeds_stable_across_calls(self, pair_dirs):
        imgs, masks = pair_dirs
        d1 = list_image_mask_pairs(imgs, masks, augment_copies=2, seed=7)
        d2 = list_image_mask_pairs(imgs, masks, augment_copies=2, seed=7)
        assert [d["aug_seed"] for d in d1] == [d["aug_seed"] for d in d2]
        # augmented copies present
        assert sum(d["aug_seed"] is not None for d in d1) == 6

    def test_materialise_descriptor_and_augmented_determinism(self,
                                                              pair_dirs):
        imgs, masks = pair_dirs
        descs = list_image_mask_pairs(imgs, masks, augment_copies=1, seed=3)
        aug = next(d for d in descs if d["aug_seed"] is not None)
        m1 = materialise(dict(aug))
        m2 = materialise(dict(aug))
        np.testing.assert_array_equal(m1["image"], m2["image"])
        np.testing.assert_array_equal(m1["gt_mask"], m2["gt_mask"])

    def test_materialise_unreadable_returns_none(self, tmp_path):
        out = materialise({"image_path": str(tmp_path / "nope.png"),
                           "mask_path": str(tmp_path / "nope_m.png")})
        assert out is None

    def test_materialise_degenerate_mask_dropped(self, tmp_path):
        img = np.full((64, 64, 3), 100, np.uint8)
        mask = np.zeros((64, 64), np.uint8)   # no foreground at all
        cv2.imwrite(str(tmp_path / "i.png"), img)
        cv2.imwrite(str(tmp_path / "m.png"), mask)
        out = materialise({"image_path": str(tmp_path / "i.png"),
                           "mask_path": str(tmp_path / "m.png")})
        assert out is None


class TestGraphCache:
    def test_cache_hit_and_corrupt_rebuild(self, tmp_path):
        samples = make_synthetic_dataset(n=2, size=64, seed=5)
        cfg = SuperpixelGraphConfig(n_segments=30)
        cache = tmp_path / "cache"

        r1 = prepare_dataset(samples, cfg, cache_dir=cache)
        files = sorted(cache.glob("*.npz"))
        assert len(files) == 2

        t0 = time.perf_counter()
        r2 = prepare_dataset(samples, cfg, cache_dir=cache)
        cached_time = time.perf_counter() - t0
        assert cached_time < 2.0          # loads, doesn't rebuild
        np.testing.assert_allclose(np.asarray(r1[0][0].x),
                                   np.asarray(r2[0][0].x))

        # Corrupt one entry → silently rebuilt, result still complete.
        files[0].write_bytes(b"garbage")
        r3 = prepare_dataset(samples, cfg, cache_dir=cache)
        assert len(r3) == 2
        np.testing.assert_allclose(np.asarray(r1[0][0].x),
                                   np.asarray(r3[0][0].x))

    def test_cache_key_respects_config(self, tmp_path):
        samples = make_synthetic_dataset(n=1, size=64, seed=5)
        cache = tmp_path / "cache"
        prepare_dataset(samples, SuperpixelGraphConfig(n_segments=30),
                        cache_dir=cache)
        prepare_dataset(samples, SuperpixelGraphConfig(n_segments=40),
                        cache_dir=cache)
        assert len(list(cache.glob("*.npz"))) == 2

    def test_bad_sample_is_isolated(self, tmp_path):
        samples = make_synthetic_dataset(n=2, size=64, seed=5)
        samples.insert(1, {"image_path": "/nonexistent.png",
                           "mask_path": "/nonexistent_m.png"})
        recs = prepare_dataset(samples, SuperpixelGraphConfig(n_segments=30))
        assert len(recs) == 2   # the bad one dropped, the rest survive


class TestAugmentation:
    def test_shapes_preserved_and_deterministic(self, circle_image):
        img, mask = circle_image
        a1 = augment_sample(img, mask, np.random.RandomState(9),
                            prob_flip=1.0, prob_rotate=1.0,
                            prob_color=1.0, prob_crop=1.0)
        a2 = augment_sample(img, mask, np.random.RandomState(9),
                            prob_flip=1.0, prob_rotate=1.0,
                            prob_color=1.0, prob_crop=1.0)
        assert a1[0].shape == img.shape and a1[1].shape == mask.shape
        np.testing.assert_array_equal(a1[0], a2[0])
        assert set(np.unique(a1[1])) <= {0, 1}


class TestPhotoSyntheticGenerator:
    def test_shapes_labels_and_determinism(self):
        from gcn_grabcut_tpu.data.dataset import make_photo_synthetic_dataset
        a = make_photo_synthetic_dataset(n=6, size=160, seed=5)
        b = make_photo_synthetic_dataset(n=6, size=160, seed=5)
        assert len(a) >= 4
        for s in a:
            assert s["image"].shape == (160, 160, 3)
            assert s["image"].dtype == np.uint8
            assert set(np.unique(s["gt_mask"])) <= {0, 1}
            fg = s["gt_mask"].mean()
            assert 0.005 < fg < 0.65
        # Seeded determinism (cache keys depend on pixel content).
        np.testing.assert_array_equal(a[0]["image"], b[0]["image"])
        np.testing.assert_array_equal(a[0]["gt_mask"], b[0]["gt_mask"])

    def test_real_texture_bank_and_family(self):
        """When bundled real photos exist (sklearn/matplotlib sample
        images), the generator's realtex family must draw on them
        deterministically; when absent the generator must still work."""
        from gcn_grabcut_tpu.data.dataset import (_real_texture_bank,
                                                  _real_texture_crop)
        bank = _real_texture_bank()
        assert isinstance(bank, tuple)
        for b in bank:
            assert b.ndim == 3 and b.dtype == np.uint8
        if bank:
            r1 = _real_texture_crop(np.random.RandomState(3), 96, bank)
            r2 = _real_texture_crop(np.random.RandomState(3), 96, bank)
            assert r1.shape == (96, 96, 3)
            assert r1.min() >= 0.0 and r1.max() <= 255.0
            np.testing.assert_array_equal(r1, r2)

    def test_framed_samples_have_background_borders(self):
        """The matte-frame variant must never label frame pixels foreground
        (the frame overwrites the image, so the mask is zeroed under it)."""
        from gcn_grabcut_tpu.data.dataset import make_photo_synthetic_dataset
        samples = make_photo_synthetic_dataset(n=40, size=128, seed=11)
        saw_frame = False
        for s in samples:
            img, mask = s["image"], s["gt_mask"]
            border = np.concatenate([
                img[0].ravel(), img[-1].ravel(),
                img[:, 0].ravel(), img[:, -1].ravel()]).astype(np.float32)
            # A matte frame is near-flat and near-black/white on every edge.
            if border.std() < 6 and (border.mean() < 30 or
                                     border.mean() > 220):
                saw_frame = True
                ring = np.zeros(mask.shape, bool)
                ring[:2], ring[-2:] = True, True
                ring[:, :2], ring[:, -2:] = True, True
                assert mask[ring].max() == 0
        assert saw_frame, "no framed sample generated in 40 draws (p=0.25)"
