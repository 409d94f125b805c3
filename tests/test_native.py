"""Native C++ max-flow: correctness vs brute force and vs the JAX solver."""

import itertools

import numpy as np
import pytest

from gcn_grabcut_tpu.native import native_available, grid_mincut_native
from gcn_grabcut_tpu.ops.maxflow import OFFSETS_4, OFFSETS_8

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")


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


@pytest.mark.parametrize("connectivity,offsets",
                         [(4, OFFSETS_4), (8, OFFSETS_8)])
def test_optimal_vs_brute_force(connectivity, offsets):
    r = np.random.RandomState(7)
    for _ in range(5):
        excess = (r.randn(3, 3) * 3).astype(np.float32)
        caps = tuple(r.rand(3, 3).astype(np.float32) for _ in offsets)
        fg = grid_mincut_native(excess, caps, connectivity)
        best = min(
            _cut_cost(excess, caps, offsets, np.array(b).reshape(3, 3))
            for b in itertools.product([0, 1], repeat=9))
        ours = _cut_cost(excess, caps, offsets, fg.astype(int))
        assert abs(ours - best) < 1e-4


def test_agrees_with_jax_solver():
    import jax.numpy as jnp
    from gcn_grabcut_tpu.ops.maxflow import grid_mincut
    r = np.random.RandomState(1)
    excess = (r.randn(32, 32) * 3).astype(np.float32)
    caps = tuple((r.rand(32, 32) * 2).astype(np.float32) for _ in OFFSETS_8)
    fg_n = grid_mincut_native(excess, caps, 8)
    fg_j = np.asarray(grid_mincut(jnp.asarray(excess),
                                  tuple(map(jnp.asarray, caps)),
                                  connectivity=8))
    c_n = _cut_cost(excess, caps, OFFSETS_8, fg_n.astype(int))
    c_j = _cut_cost(excess, caps, OFFSETS_8, fg_j.astype(int))
    assert abs(c_n - c_j) < 1e-2


def test_trivial_sides():
    caps = tuple(np.ones((4, 4), np.float32) for _ in OFFSETS_8)
    assert grid_mincut_native(np.full((4, 4), 5.0, np.float32),
                              caps, 8).all()
    assert not grid_mincut_native(np.full((4, 4), -5.0, np.float32),
                                  caps, 8).any()
