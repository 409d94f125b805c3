"""Banded SDDMM attention (ops/sddmm.py) vs the edge-list oracle.

The edge-list GATv2 path (models/layers.py GATv2Conv) is itself
torch-parity-tested (tools/parity_torch.py); these tests pin the banded
formulation to it: same parameters, same graph, per-node outputs equal to
fp32 tolerance, including out-of-window fallback edges, masked edges and
padded nodes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.random as jr

from gcn_grabcut_tpu.core.graph import make_graph_batch
from gcn_grabcut_tpu.ops.sddmm import gat_plan_device


def _random_graph(r, n_nodes, n_edges, n_pad_nodes=0, n_pad_edges=0,
                  local_frac=0.7, span=24):
    """Directed dedup'd edge list: mostly index-local plus far pairs."""
    seen = set()
    src, dst = [], []
    while len(src) < n_edges:
        s = r.randint(0, n_nodes)
        if r.rand() < local_frac:
            d = np.clip(s + r.randint(-span, span + 1), 0, n_nodes - 1)
        else:
            d = r.randint(0, n_nodes)
        if s == d or (s, d) in seen:
            continue
        seen.add((s, d))
        src.append(s)
        dst.append(d)
    N = n_nodes + n_pad_nodes
    E = n_edges + n_pad_edges
    es = np.zeros(E, np.int32)
    ed = np.zeros(E, np.int32)
    es[:n_edges], ed[:n_edges] = src, dst
    em = np.zeros(E, np.float32)
    em[:n_edges] = 1.0
    nm = np.zeros(N, np.float32)
    nm[:n_nodes] = 1.0
    attr = (r.rand(E, 5).astype(np.float32) - 0.3) * em[:, None]
    x = r.randn(N, 19).astype(np.float32) * nm[:, None]
    return make_graph_batch(
        x=x[None], edge_src=es[None], edge_dst=ed[None],
        edge_attr=attr[None], node_mask=nm[None], edge_mask=em[None])


class TestGatPlan:
    def test_band_holds_every_in_window_edge(self):
        r = np.random.RandomState(0)
        g = _random_graph(r, 90, 300, n_pad_nodes=6, n_pad_edges=40)
        plan = gat_plan_device(g.edge_src[0], g.edge_dst[0], g.edge_attr[0],
                               g.edge_mask[0], 96, block_rows=16, window=64)
        n_band = float(plan.mask_band.sum())
        n_fb = float(plan.fb_mask.sum())
        assert n_band + n_fb == 300.0
        assert int(plan.fb_overflow[0]) == 0
        # fallback list is destination-sorted where real
        fb_dst = np.asarray(plan.fb_dst)[np.asarray(plan.fb_mask) > 0]
        assert (np.diff(fb_dst) >= 0).all()
        # attrs land somewhere exactly once: total attr mass preserved
        total = float(plan.attr_band.sum()) + float(plan.fb_attr.sum())
        ref = float((g.edge_attr[0] * g.edge_mask[0][:, None]).sum())
        np.testing.assert_allclose(total, ref, rtol=1e-5)

    def test_overflow_counted_when_capacity_too_small(self):
        r = np.random.RandomState(1)
        g = _random_graph(r, 90, 300, local_frac=0.0)
        plan = gat_plan_device(g.edge_src[0], g.edge_dst[0], g.edge_attr[0],
                               g.edge_mask[0], 96, block_rows=16, window=32,
                               fb_capacity=16)
        assert int(plan.fb_overflow[0]) > 0


class TestBandedAttentionEquality:
    @pytest.mark.parametrize("window", [32, 64])
    def test_gatv2conv_banded_equals_edge_list(self, window):
        from gcn_grabcut_tpu.models.layers import GATv2Conv

        r = np.random.RandomState(2)
        g = _random_graph(r, 100, 400, n_pad_nodes=12, n_pad_edges=60)
        N = g.max_nodes
        x = jnp.asarray(r.randn(1, N, 24).astype(np.float32))
        m = GATv2Conv(features=8, heads=4)
        vs = m.init(jr.PRNGKey(0), x, g.edge_src, g.edge_dst, g.edge_attr,
                    g.edge_mask, g.node_mask)
        ref = m.apply(vs, x, g.edge_src, g.edge_dst, g.edge_attr,
                      g.edge_mask, g.node_mask)
        plan = gat_plan_device(g.edge_src[0], g.edge_dst[0], g.edge_attr[0],
                               g.edge_mask[0], N, block_rows=16,
                               window=window)
        assert int(plan.fb_overflow[0]) == 0
        out = m.apply(vs, x, g.edge_src, g.edge_dst, g.edge_attr,
                      g.edge_mask, g.node_mask, plan=plan,
                      plan_precision="highest")
        nm = np.asarray(g.node_mask[0]) > 0
        np.testing.assert_allclose(np.asarray(out)[0][nm],
                                   np.asarray(ref)[0][nm],
                                   rtol=2e-4, atol=2e-5)
        # default precision: bf16 window compute, fp32 softmax islands —
        # same result to bf16 tolerance
        out_bf = m.apply(vs, x, g.edge_src, g.edge_dst, g.edge_attr,
                         g.edge_mask, g.node_mask, plan=plan)
        scale = np.abs(np.asarray(ref)[0][nm]).max()
        assert np.abs(np.asarray(out_bf)[0][nm]
                      - np.asarray(ref)[0][nm]).max() < 0.05 * scale

    def test_full_model_banded_equals_edge_list(self):
        from gcn_grabcut_tpu import build_model, init_model
        from gcn_grabcut_tpu.models.large import (apply_large,
                                                  build_gat_plan_device)

        r = np.random.RandomState(3)
        g = _random_graph(r, 120, 500, n_pad_nodes=8, n_pad_edges=50)
        model = build_model("gat", hidden_channels=32, n_layers=2)
        vs = init_model(model, jr.PRNGKey(1), g)
        ref = model.apply(vs, g, train=False)
        plan = build_gat_plan_device(
            g.edge_src[0], g.edge_dst[0], g.edge_attr[0], g.edge_mask[0],
            g.max_nodes, window=64)
        assert int(plan.fb_overflow[0]) == 0
        out = apply_large(model, vs, g, plans=plan, precision="highest")
        nm = np.asarray(g.node_mask[0]) > 0
        np.testing.assert_allclose(np.asarray(out)[0][nm],
                                   np.asarray(ref)[0][nm],
                                   rtol=2e-4, atol=2e-4)

    def test_apply_large_routes_gat_without_plans(self):
        from gcn_grabcut_tpu import build_model, init_model
        from gcn_grabcut_tpu.models.large import apply_large

        r = np.random.RandomState(4)
        g = _random_graph(r, 80, 240)
        model = build_model("gat", hidden_channels=16, n_layers=2)
        vs = init_model(model, jr.PRNGKey(2), g)
        ref = model.apply(vs, g, train=False)
        out = apply_large(model, vs, g)   # default routing: bf16 windows
        nm = np.asarray(g.node_mask[0]) > 0
        scale = np.abs(np.asarray(ref)[0][nm]).max()
        assert np.abs(np.asarray(out)[0][nm]
                      - np.asarray(ref)[0][nm]).max() < 0.05 * scale


class TestOverflowGuard:
    def test_assumption_violating_graph_rebuilds_exact(self):
        """A graph whose out-of-window population exceeds the default
        fallback capacity (E//2 + 4096) must NOT silently drop attention
        edges through the production entry points: build_gat_plan_device
        checks fb_overflow once per plan build, warns, and rebuilds at
        exact capacity (VERDICT r3 weak #1)."""
        from gcn_grabcut_tpu import build_model, init_model
        from gcn_grabcut_tpu.models.large import (apply_large,
                                                  build_gat_plan_device)
        from gcn_grabcut_tpu.ops.sddmm import gat_plan_device

        # All-random long-range edges: with window=64 almost every edge is
        # out-of-window, far past E//2 + 4096.
        r = np.random.RandomState(7)
        g = _random_graph(r, 1200, 12000, local_frac=0.0)
        N = g.max_nodes

        with pytest.warns(RuntimeWarning, match="fallback capacity"):
            plan = build_gat_plan_device(
                g.edge_src[0], g.edge_dst[0], g.edge_attr[0],
                g.edge_mask[0], N, window=64)
        assert int(plan.fb_overflow[0]) == 0   # rebuilt at exact capacity

        exact = gat_plan_device(g.edge_src[0], g.edge_dst[0],
                                g.edge_attr[0], g.edge_mask[0], N,
                                window=64, fb_capacity=12000)
        model = build_model("gat", hidden_channels=16, n_layers=1)
        vs = init_model(model, jr.PRNGKey(5), g)
        out = apply_large(model, vs, g, plans=plan, precision="highest")
        ref = apply_large(model, vs, g, plans=exact, precision="highest")
        nm = np.asarray(g.node_mask[0]) > 0
        np.testing.assert_allclose(np.asarray(out)[0][nm],
                                   np.asarray(ref)[0][nm],
                                   rtol=2e-4, atol=2e-4)

    def test_sane_graph_does_not_warn(self):
        import warnings
        from gcn_grabcut_tpu.models.large import build_gat_plan_device

        r = np.random.RandomState(8)
        g = _random_graph(r, 120, 500)
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            plan = build_gat_plan_device(
                g.edge_src[0], g.edge_dst[0], g.edge_attr[0],
                g.edge_mask[0], g.max_nodes, window=512)
        assert int(plan.fb_overflow[0]) == 0
