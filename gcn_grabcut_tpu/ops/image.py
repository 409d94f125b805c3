"""Image-plane primitives in pure JAX: colour conversions, Sobel gradients,
box / guided filters.

The reference delegates all of these to OpenCV / scikit-image C kernels
(reference: src/gcn_grabcut/graph_builder.py:142-154 uses skimage rgb2lab /
rgb2hsv + cv2 Sobel; src/gcn_grabcut/pipeline.py:71-100 uses six cv2.blur
calls for the guided filter).  Here they are jnp stencils/reductions that fuse
into the surrounding jit regions and run on the VPU.

All functions take float32 `(H, W)` or `(H, W, 3)` arrays; colour conversions
match skimage/OpenCV conventions numerically so that downstream feature
layouts match the reference contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Colour conversions
# ---------------------------------------------------------------------------

def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """ITU-R BT.601 luma, matching cv2.cvtColor(..., COLOR_RGB2GRAY).

    Input uint8-range float (0..255) RGB; output (H, W) float32 0..255.
    """
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    """sRGB gamma decode; input in [0, 1]."""
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


# D65 reference white, matching skimage.color.rgb2lab defaults.
# Kept as numpy so importing this module never initialises a JAX backend
# (device selection must stay under the caller's control).
import numpy as _np  # noqa: E402

_XYZ_FROM_RGB = _np.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227],
], _np.float32)
_WHITE_D65 = _np.array([0.95047, 1.0, 1.08883], _np.float32)


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """CIELAB conversion matching skimage.color.rgb2lab (D65, 2° observer).

    Input RGB in 0..255 (uint8 range, float); output L in [0,100],
    a/b roughly [-128, 127].  The reference feeds this to SLIC and to all
    colour statistics (graph_builder.py:148).
    """
    rgb01 = jnp.clip(rgb.astype(jnp.float32) / 255.0, 0.0, 1.0)
    lin = srgb_to_linear(rgb01)
    xyz = jnp.einsum("...c,kc->...k", lin, _XYZ_FROM_RGB)
    xyz = xyz / _WHITE_D65

    eps = 0.008856  # (6/29)^3
    kappa = 7.787   # (1/3)*(29/6)^2
    f = jnp.where(xyz > eps, jnp.cbrt(xyz), kappa * xyz + 16.0 / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """HSV conversion matching skimage.color.rgb2hsv: all channels in [0, 1].

    Input RGB in 0..255 float.
    """
    rgb01 = rgb.astype(jnp.float32) / 255.0
    v = jnp.max(rgb01, axis=-1)
    mn = jnp.min(rgb01, axis=-1)
    delta = v - mn
    safe = jnp.where(delta == 0, 1.0, delta)
    r, g, b = rgb01[..., 0], rgb01[..., 1], rgb01[..., 2]
    h = jnp.where(
        v == r, (g - b) / safe,
        jnp.where(v == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe))
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    s = jnp.where(v == 0, 0.0, delta / jnp.where(v == 0, 1.0, v))
    return jnp.stack([h, s, v], axis=-1)


# ---------------------------------------------------------------------------
# Stencils
# ---------------------------------------------------------------------------

def _reflect101_pad(img: jnp.ndarray, r: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 padding (cv2 default): edge pixel not repeated."""
    return jnp.pad(img, [(r, r)] * 2 + [(0, 0)] * (img.ndim - 2),
                   mode="reflect")


def sobel(gray: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """3x3 Sobel gx, gy matching cv2.Sobel(ksize=3, BORDER_REFLECT_101).

    The reference computes the gradient magnitude plane once per image
    (graph_builder.py:152-154).
    """
    p = _reflect101_pad(gray[..., None], 1)[..., 0]

    def sh(dy, dx):
        return p[1 + dy:1 + dy + gray.shape[0], 1 + dx:1 + dx + gray.shape[1]]

    gx = (sh(-1, 1) + 2 * sh(0, 1) + sh(1, 1)
          - sh(-1, -1) - 2 * sh(0, -1) - sh(1, -1))
    gy = (sh(1, -1) + 2 * sh(1, 0) + sh(1, 1)
          - sh(-1, -1) - 2 * sh(-1, 0) - sh(-1, 1))
    return gx, gy


def gradient_magnitude(gray: jnp.ndarray) -> jnp.ndarray:
    gx, gy = sobel(gray)
    return jnp.sqrt(gx * gx + gy * gy)


def box_filter(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Mean filter with a (2r+1)^2 kernel, BORDER_REFLECT_101 — cv2.blur.

    Implemented as two cumulative-sum passes (integral image along each
    axis), O(1) per pixel independent of radius — the same complexity class
    the guided filter relies on (pipeline.py:71-100).
    """
    if radius <= 0:
        return img
    k = 2 * radius + 1
    x = _reflect101_pad(img[..., None] if img.ndim == 2 else img, radius)

    # Sliding-window sum along an axis via cumsum difference.
    def window_sum(a, axis, out_len):
        c = jnp.cumsum(a, axis=axis)
        upper = jax.lax.slice_in_dim(c, k - 1, k - 1 + out_len, axis=axis)
        lower = jnp.concatenate(
            [jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=axis)),
             jax.lax.slice_in_dim(c, 0, out_len - 1, axis=axis)], axis=axis)
        return upper - lower

    H, W = img.shape[:2]
    s = window_sum(x, 0, H)
    s = window_sum(s, 1, W)
    out = s / float(k * k)
    return out[..., 0] if img.ndim == 2 else out


def guided_filter(guide: jnp.ndarray, src: jnp.ndarray, radius: int = 8,
                  eps: float = 1e-3) -> jnp.ndarray:
    """He et al. 2010 guided filter, the box-filter formulation.

    Mirrors reference pipeline.py:71-100 exactly (six box filters).  `guide`
    is typically the grey image in [0,1]; `src` the projected probability
    plane.  Acts as an edge-aware upsampler for region-level posteriors.
    """
    mean_g = box_filter(guide, radius)
    mean_s = box_filter(src, radius)
    cov_gs = box_filter(guide * src, radius) - mean_g * mean_s
    var_g = box_filter(guide * guide, radius) - mean_g * mean_g
    a = cov_gs / (var_g + eps)
    b = mean_s - a * mean_g
    return box_filter(a, radius) * guide + box_filter(b, radius)


def resize_bilinear(img: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize via jax.image (host-side decode still uses cv2)."""
    shape = (out_hw[0], out_hw[1]) + img.shape[2:]
    return jax.image.resize(img.astype(jnp.float32), shape, method="bilinear")
