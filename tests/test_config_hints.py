"""Config system, click/hint utilities, and graph export interop."""

import numpy as np
import pytest

from gcn_grabcut_tpu.config import FrameworkConfig
from gcn_grabcut_tpu.data.hints import sample_clicks, encode_user_hints
from gcn_grabcut_tpu import build_graph, SuperpixelGraphConfig


class TestConfig:
    def test_defaults(self):
        cfg = FrameworkConfig()
        assert cfg.superpixels.n_segments == 300
        assert cfg.grabcut.gamma == 50.0
        assert cfg.train.lr == 1e-3
        assert cfg.model.variant == "resgcn"

    def test_yaml_roundtrip(self, tmp_path):
        cfg = FrameworkConfig()
        cfg.train.lr = 5e-4
        cfg.save(tmp_path / "cfg.yaml")
        loaded = FrameworkConfig.load(tmp_path / "cfg.yaml")
        assert loaded.train.lr == 5e-4

    def test_json_roundtrip(self, tmp_path):
        cfg = FrameworkConfig()
        cfg.model.hidden_channels = 96
        cfg.save(tmp_path / "cfg.json")
        loaded = FrameworkConfig.load(tmp_path / "cfg.json")
        assert loaded.model.hidden_channels == 96

    def test_dotted_overrides(self):
        cfg = FrameworkConfig.load(
            overrides=["train.lr=3e-4", "superpixels.n_segments=500",
                       "inference.keep_largest=true"])
        assert cfg.train.lr == pytest.approx(3e-4)
        assert cfg.superpixels.n_segments == 500
        assert cfg.inference.keep_largest is True

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            FrameworkConfig.load(overrides=["train.nonsense=1"])

    def test_frozen_superpixel_config_still_overridable(self):
        cfg = FrameworkConfig.load(overrides=["superpixels.compactness=20"])
        assert cfg.superpixels.compactness == 20.0


class TestHints:
    def test_sample_clicks_inside_regions(self, circle_image):
        _, mask = circle_image
        rng = np.random.RandomState(0)
        fg, bg = sample_clicks(mask, n_fg=5, n_bg=5, rng=rng)
        assert len(fg) == 5 and len(bg) == 5
        for r, c in fg:
            assert mask[r, c] == 1
        for r, c in bg:
            assert mask[r, c] == 0

    def test_encode_user_hints(self):
        seg = np.zeros((10, 10), np.int32)
        seg[:, 5:] = 1
        hints = encode_user_hints(seg, [(2, 2)], [(2, 8)], n_nodes=4)
        assert hints.shape == (4, 3)
        assert hints[0, 0] == 1 and hints[0, 2] == 0   # FG click region
        assert hints[1, 1] == 1 and hints[1, 2] == 0   # BG click region
        assert hints[2, 2] == 1                        # untouched
        # Out-of-bounds clicks are ignored.
        h2 = encode_user_hints(seg, [(99, 99)], [], n_nodes=4)
        assert h2[:, 0].sum() == 0


class TestGraphExport:
    @pytest.fixture(scope="class")
    def rg(self, test_image):
        return build_graph(test_image, SuperpixelGraphConfig(n_segments=40))

    def test_node_input_shape(self, rg):
        x = rg.node_input()
        assert x.shape == (rg.n_nodes, 19)

    def test_to_networkx(self, rg):
        G = rg.to_networkx()
        assert G.number_of_nodes() == int(rg.node_mask.sum())
        assert G.number_of_edges() > 0
        some_node = next(iter(G.nodes))
        assert G.nodes[some_node]["feat"].shape == (19,)

    def test_to_torch(self, rg):
        import torch
        d = rg.to_torch()
        assert d["x"].dtype == torch.float32
        assert d["edge_index"].shape[0] == 2
        assert d["edge_attr"].shape[1] == 5
        assert d["edge_index"].max() < rg.n_nodes


class TestShippedCheckpoints:
    def test_flagship_checkpoints_load_and_predict(self):
        """The example checkpoints in examples/ must restore through the
        public loader and produce finite logits — guards the shipped
        artifacts against format drift."""
        from pathlib import Path
        import jax.numpy as jnp
        from gcn_grabcut_tpu import load_model_from_checkpoint, apply_model
        from gcn_grabcut_tpu.core.graph import make_graph_batch

        r = np.random.RandomState(0)
        K, E = 24, 60
        g = make_graph_batch(
            x=r.randn(1, K, 19).astype(np.float32),
            edge_src=r.randint(0, K, E)[None],
            edge_dst=r.randint(0, K, E)[None],
            edge_attr=r.rand(1, E, 5).astype(np.float32),
            node_mask=np.ones((1, K), np.float32),
            edge_mask=np.ones((1, E), np.float32))
        ex = Path(__file__).resolve().parent.parent / "examples"
        cks = sorted(ex.glob("*.msgpack"))
        assert cks, "no shipped checkpoints found"
        for ck in cks:
            model, variables, meta = load_model_from_checkpoint(str(ck))
            logits = np.asarray(
                apply_model(model, variables, g,
                            train=False).astype(jnp.float32))
            assert logits.shape == (1, K, 3), ck.name
            assert np.isfinite(logits).all(), ck.name
