"""InputNorm BatchNorm semantics + utils coverage."""

import jax
import jax.numpy as jnp
import numpy as np

from gcn_grabcut_tpu.models.layers import InputNorm
from gcn_grabcut_tpu.utils import StageTimer, profile_trace


class TestInputNorm:
    def _init(self, n_feats=4):
        m = InputNorm(n_feats, momentum=0.05)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 8, n_feats),
                        jnp.float32)
        mask = jnp.ones((1, 8))
        vs = m.init(jax.random.PRNGKey(0), x, mask, train=False)
        return m, vs, x, mask

    def test_train_whitens_valid_nodes(self):
        m, vs, x, mask = self._init()
        y, upd = m.apply(vs, x, mask, train=True, mutable=["batch_stats"])
        y = np.asarray(y)[0]
        assert abs(y.mean()) < 1e-4
        assert abs(y.std() - 1.0) < 0.05
        # Running stats moved toward the batch stats (momentum 0.05).
        rm = np.asarray(upd["batch_stats"]["mean"])
        assert not np.allclose(rm, 0.0)

    def test_padded_nodes_excluded_from_stats(self):
        m, vs, x, _ = self._init()
        mask = jnp.asarray([[1, 1, 1, 1, 0, 0, 0, 0]], jnp.float32)
        x_poison = x.at[0, 4:].set(1e6)   # garbage in padded slots
        y, upd = m.apply(vs, x_poison, mask, train=True,
                         mutable=["batch_stats"])
        rm = np.asarray(upd["batch_stats"]["mean"])
        assert np.abs(rm).max() < 100     # poison did not leak into stats

    def test_single_node_falls_back_to_running_stats(self):
        m, vs, x, _ = self._init()
        mask = jnp.asarray([[1, 0, 0, 0, 0, 0, 0, 0]], jnp.float32)
        y, upd = m.apply(vs, x, mask, train=True, mutable=["batch_stats"])
        # Running stats unchanged (init zeros/ones).
        np.testing.assert_allclose(
            np.asarray(upd["batch_stats"]["mean"]), 0.0, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(upd["batch_stats"]["var"]), 1.0, atol=1e-7)

    def test_eval_uses_running_stats(self):
        m, vs, x, mask = self._init()
        y1 = m.apply(vs, x, mask, train=False)
        y2 = m.apply(vs, x * 1.0, mask, train=False)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))


class TestUtils:
    def test_stage_timer(self):
        t = StageTimer()
        with t.stage("a"):
            pass
        with t.stage("a"):
            pass
        assert "a" in t.timing and t.timing["a"] >= 0

    def test_profile_trace_noop(self):
        with profile_trace(None):
            x = jnp.ones(4) + 1
        assert float(x.sum()) == 8.0

    def test_profile_trace_writes(self, tmp_path):
        with profile_trace(tmp_path / "prof"):
            (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
        assert any((tmp_path / "prof").rglob("*"))


class TestCompilationCacheGenerations:
    """AOT entries from a previous container generation must not be loaded
    (machine-feature mismatch can escalate to SIGILL)."""

    def test_tag_is_stable_and_filesystem_safe(self):
        from gcn_grabcut_tpu.utils import _cache_generation_tag
        tag = _cache_generation_tag()
        assert tag == _cache_generation_tag()
        assert tag.isalnum() and len(tag) == 12

    def test_stale_generation_entries_are_not_visible(self, tmp_path,
                                                      monkeypatch):
        import jax
        from gcn_grabcut_tpu import utils

        # Simulate an entry AOT-compiled by a previous container generation.
        stale_dir = tmp_path / "deadbeef0000"
        stale_dir.mkdir()
        (stale_dir / "xla_entry.bin").write_bytes(b"old-generation-aot")

        monkeypatch.setattr(utils, "_cache_generation_tag",
                            lambda: "aaaaaaaaaaaa")
        prev = jax.config.jax_compilation_cache_dir
        try:
            utils.setup_compilation_cache(tmp_path)
            active = jax.config.jax_compilation_cache_dir
            assert active == str(tmp_path / "aaaaaaaaaaaa")
            # Fresh namespace: the stale entry is outside it.
            assert not any((tmp_path / "aaaaaaaaaaaa").iterdir())
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)
