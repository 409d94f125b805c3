"""Test harness configuration.

All tests run on the CPU backend with 8 virtual devices so that sharding /
multi-chip code paths can be exercised without TPU hardware (the driver
separately dry-runs the multi-chip path).  The axon TPU plugin ignores the
JAX_PLATFORMS environment variable, so the platform is forced through
jax.config before any backend initialisation.
"""

import os
import sys

os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402
import numpy as np  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)


@pytest.fixture(scope="session")
def test_image():
    """Seeded random RGB noise with a coloured square (fast fixture)."""
    r = np.random.RandomState(0)
    img = r.randint(0, 255, (96, 128, 3), dtype=np.uint8)
    img[24:64, 40:96] = [200, 50, 40]
    return img


@pytest.fixture(scope="session")
def circle_image():
    """Dark background with a bright centred disc + its GT mask."""
    import cv2
    r = np.random.RandomState(1)
    img = r.randint(20, 90, (128, 128, 3), dtype=np.uint8)
    mask = np.zeros((128, 128), np.uint8)
    cv2.circle(img, (64, 64), 36, (220, 200, 60), -1)
    cv2.circle(mask, (64, 64), 36, 1, -1)
    noise = r.randint(-20, 20, img.shape).astype(np.int16)
    img = np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    return img, mask
