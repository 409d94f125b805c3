"""Image-plane primitive parity vs OpenCV reference kernels.

The reference offloads these to cv2/skimage C kernels (reference:
src/gcn_grabcut/graph_builder.py:142-154, pipeline.py:71-100); our jnp
implementations must match them numerically.
"""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from gcn_grabcut_tpu.ops import image as im


@pytest.fixture(scope="module")
def rgb(test_image):
    return test_image.astype(np.float32)


class TestColourConversions:
    def test_gray_matches_cv2(self, rgb):
        ours = np.asarray(im.rgb_to_gray(jnp.asarray(rgb)))
        ref = cv2.cvtColor(rgb.astype(np.uint8), cv2.COLOR_RGB2GRAY)
        assert np.abs(ours - ref).max() < 1.0

    def test_lab_matches_cv2_float(self, rgb):
        ours = np.asarray(im.rgb_to_lab(jnp.asarray(rgb)))
        ref = cv2.cvtColor(rgb / 255.0, cv2.COLOR_RGB2Lab)
        assert np.abs(ours - ref).max() < 0.7
        assert ours[..., 0].min() >= 0 and ours[..., 0].max() <= 100.5

    def test_hsv_matches_cv2_float(self, rgb):
        ours = np.asarray(im.rgb_to_hsv(jnp.asarray(rgb)))
        ref = cv2.cvtColor(rgb / 255.0, cv2.COLOR_RGB2HSV)
        ref = ref.copy()
        ref[..., 0] /= 360.0  # cv2 float H is in degrees
        # Hue wraps at 1.0 — compare circularly.
        dh = np.abs(ours[..., 0] - ref[..., 0])
        dh = np.minimum(dh, 1.0 - dh)
        assert dh.max() < 1e-3
        assert np.abs(ours[..., 1:] - ref[..., 1:]).max() < 1e-3


class TestStencils:
    def test_sobel_matches_cv2(self, rgb):
        gray = cv2.cvtColor(rgb.astype(np.uint8), cv2.COLOR_RGB2GRAY)
        gray = gray.astype(np.float32)
        gx, gy = im.sobel(jnp.asarray(gray))
        ref_gx = cv2.Sobel(gray, cv2.CV_32F, 1, 0, ksize=3)
        ref_gy = cv2.Sobel(gray, cv2.CV_32F, 0, 1, ksize=3)
        # Interior must match exactly; borders depend on padding convention.
        assert np.abs(np.asarray(gx)[1:-1, 1:-1] - ref_gx[1:-1, 1:-1]).max() < 1e-3
        assert np.abs(np.asarray(gy)[1:-1, 1:-1] - ref_gy[1:-1, 1:-1]).max() < 1e-3

    @pytest.mark.parametrize("radius", [1, 4, 8])
    def test_box_filter_matches_cv2_blur(self, rgb, radius):
        gray = rgb[..., 0] / 255.0
        ours = np.asarray(im.box_filter(jnp.asarray(gray), radius))
        k = 2 * radius + 1
        ref = cv2.blur(gray, (k, k))
        assert np.abs(ours - ref).max() < 1e-4

    def test_guided_filter_matches_cv2_composition(self, rgb):
        guide = cv2.cvtColor(rgb.astype(np.uint8),
                             cv2.COLOR_RGB2GRAY).astype(np.float32) / 255.0
        src = (rgb[..., 2] > 128).astype(np.float32)
        ours = np.asarray(im.guided_filter(jnp.asarray(guide),
                                           jnp.asarray(src), 8, 1e-3))

        # Reference formulation (pipeline.py:71-100) re-expressed with cv2.
        k = (17, 17)
        mg, ms = cv2.blur(guide, k), cv2.blur(src, k)
        cov = cv2.blur(guide * src, k) - mg * ms
        var = cv2.blur(guide * guide, k) - mg * mg
        a = cov / (var + 1e-3)
        b = ms - a * mg
        ref = cv2.blur(a, k) * guide + cv2.blur(b, k)
        assert np.abs(ours - ref).max() < 1e-3

    def test_guided_filter_edge_aware(self):
        # A sharp guide edge must be preserved; a flat guide must smooth.
        H = W = 64
        guide = np.zeros((H, W), np.float32)
        guide[:, W // 2:] = 1.0
        src = np.zeros((H, W), np.float32)
        src[:, W // 2 - 4:] = 1.0  # misaligned step
        out = np.asarray(im.guided_filter(jnp.asarray(guide),
                                          jnp.asarray(src), 8, 1e-4))
        # Filtered step should snap toward the guide's edge position.
        assert out[32, W // 2 - 8] < 0.5
        assert out[32, W // 2 + 8] > 0.5
