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

# ---------------------------------------------------------------------------
# XLA:CPU mmap-exhaustion guard (the round-4 "deterministic segfault").
#
# Every XLA:CPU compiled executable pins ~3 mmap regions for its JIT'd code,
# and they are only released when the executable is dropped from jax's
# caches.  A full single-process suite run compiles thousands of distinct
# programs (~270 new maps per test, measured), crossing the kernel's
# vm.max_map_count ceiling (65530 by default) after ~240 tests — the next
# compile's mmap fails and XLA segfaults inside backend_compile_and_load.
# Measured at the crash: maps=64941 at test start, fds/threads/RSS all flat.
# jax.clear_caches() releases the mappings completely (1393 -> 494 in a
# 300-compile probe), so we clear once the count nears the ceiling; the
# cost is a handful of recompiles right after each clear (~1-2 clears per
# full run).
# ---------------------------------------------------------------------------
_MAPS_SOFT_LIMIT = 40_000


def _map_count() -> int:
    try:
        with open(f"/proc/{os.getpid()}/maps") as f:
            return sum(1 for _ in f)
    except OSError:   # non-Linux: no /proc, and no map ceiling this low
        return 0


@pytest.fixture(autouse=True)
def _xla_mmap_guard():
    yield
    if _map_count() > _MAPS_SOFT_LIMIT:
        jax.clear_caches()


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
