"""Loss semantics + trainer integration tests — the analog of the reference
TestTrainer (reference: tests/test.py:357-423).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcn_grabcut_tpu.train.losses import (
    focal_loss, label_smoothing_ce, trimap_loss,
)


def _logits_labels(n=20, seed=0):
    r = np.random.RandomState(seed)
    logits = jnp.asarray(r.randn(1, n, 3).astype(np.float32))
    labels = jnp.asarray(r.randint(0, 3, (1, n)))
    mask = jnp.ones((1, n), jnp.float32)
    return logits, labels, mask


class TestLossSemantics:
    def test_losses_positive(self):
        logits, labels, mask = _logits_labels()
        assert float(focal_loss(logits, labels, mask)) > 0
        assert float(label_smoothing_ce(logits, labels, mask)) > 0
        assert float(trimap_loss(logits, labels, mask)) > 0

    def test_area_weighting_penalises_large_regions_more(self):
        """A mistake on a large region must cost more than the same mistake
        on a sliver (reference tests/test.py:399-411)."""
        n = 10
        labels = jnp.zeros((1, n), jnp.int32)           # all BG
        mask = jnp.ones((1, n), jnp.float32)
        logits = jnp.tile(jnp.asarray([[3.0, 0.0, 0.0]]), (n, 1))[None]
        # Mistake on node 0 only.
        logits = logits.at[0, 0].set(jnp.asarray([0.0, 0.0, 3.0]))

        big = jnp.full((1, n), 0.05).at[0, 0].set(0.55)   # node 0 large
        small = jnp.full((1, n), 0.105).at[0, 0].set(0.055)

        l_big = float(trimap_loss(logits, labels, mask, area=big,
                                  dice_weight=0.0))
        l_small = float(trimap_loss(logits, labels, mask, area=small,
                                    dice_weight=0.0))
        assert l_big > l_small

    def test_dice_rewards_overlap(self):
        """Higher predicted FG coverage on true-FG regions → lower loss
        (reference tests/test.py:413-423)."""
        n = 8
        labels = jnp.asarray([[2] * 4 + [0] * 4])
        mask = jnp.ones((1, n), jnp.float32)
        fg_ratio = jnp.asarray([[1.0] * 4 + [0.0] * 4])

        good = jnp.asarray(
            [[[-2.0, -2.0, 2.0]] * 4 + [[2.0, -2.0, -2.0]] * 4])[0][None]
        bad = jnp.asarray(
            [[[2.0, -2.0, -2.0]] * 4 + [[-2.0, -2.0, 2.0]] * 4])[0][None]
        l_good = float(trimap_loss(good, labels, mask, fg_ratio=fg_ratio))
        l_bad = float(trimap_loss(bad, labels, mask, fg_ratio=fg_ratio))
        assert l_good < l_bad

    def test_zero_graph_weight_removes_contribution(self):
        logits, labels, mask = _logits_labels()
        l1 = float(trimap_loss(logits, labels, mask))
        # Duplicate the graph with weight 0 — loss must be unchanged.
        logits2 = jnp.concatenate([logits, logits * 7.0])
        labels2 = jnp.concatenate([labels, labels])
        mask2 = jnp.concatenate([mask, mask])
        gw = jnp.asarray([1.0, 0.0])
        l2 = float(trimap_loss(logits2, labels2, mask2, graph_weight=gw))
        np.testing.assert_allclose(l1, l2, rtol=1e-5)

    def test_padding_invariance(self):
        logits, labels, mask = _logits_labels(n=10)
        l1 = float(trimap_loss(logits, labels, mask))
        pad = lambda a, v: jnp.concatenate(
            [a, jnp.full((1, 6) + a.shape[2:], v, a.dtype)], axis=1)
        l2 = float(trimap_loss(pad(logits, 9.0), pad(labels, 1),
                               pad(mask, 0.0)))
        np.testing.assert_allclose(l1, l2, rtol=1e-5)


class TestTrainerIntegration:
    @pytest.fixture(scope="class")
    def prepared(self):
        from gcn_grabcut_tpu.data.dataset import (
            make_synthetic_dataset, prepare_dataset)
        from gcn_grabcut_tpu.graph_build import SuperpixelGraphConfig
        samples = make_synthetic_dataset(n=12, size=64, seed=7)
        recs = prepare_dataset(samples, SuperpixelGraphConfig(n_segments=40),
                               keep_segments=False)
        return [r[0] for r in recs]

    def test_three_epoch_fit(self, prepared, tmp_path_factory):
        from gcn_grabcut_tpu.train.trainer import Trainer, TrainConfig
        save_dir = tmp_path_factory.mktemp("ckpt")
        tr = Trainer("resgcn", dict(hidden_channels=32, n_layers=2),
                     TrainConfig(n_epochs=3, batch_size=4, bf16=False,
                                 verbose=False, save_every=100),
                     save_dir=save_dir)
        hist = tr.fit(prepared[:9], prepared[9:])
        assert len(hist["train_loss"]) == 3
        assert hist["train_loss"][-1] < hist["train_loss"][0]
        assert (save_dir / "final_model.msgpack").exists()
        assert (save_dir / "history.json").exists()

        # Checkpoint reload gives identical predictions.
        from gcn_grabcut_tpu.train.checkpoints import (
            load_model_from_checkpoint)
        from gcn_grabcut_tpu.models import apply_model
        m, vs, meta = load_model_from_checkpoint(
            save_dir / "final_model.msgpack")
        out1 = apply_model(m, vs, prepared[0], train=False)
        out2 = tr.model.apply(
            {"params": tr.state.params,
             "batch_stats": tr.state.batch_stats},
            prepared[0], train=False)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   atol=1e-5)
        assert meta["variant"] == "resgcn"

    def test_empty_split_raises(self):
        from gcn_grabcut_tpu.train.trainer import Trainer, TrainConfig
        tr = Trainer("resgcn", dict(hidden_channels=16, n_layers=1),
                     TrainConfig(n_epochs=1, bf16=False, verbose=False))
        with pytest.raises(RuntimeError, match="no training graphs"):
            tr.fit([])

    def test_mesh_fit_matches_single_device(self, prepared,
                                            tmp_path_factory):
        """Data-parallel fit() over a 4-device mesh reproduces the
        single-device history (up to float reduction order)."""
        from gcn_grabcut_tpu.train.trainer import Trainer, TrainConfig
        from gcn_grabcut_tpu.parallel.mesh import make_mesh

        def run(mesh, tag):
            tr = Trainer("resgcn", dict(hidden_channels=32, n_layers=2),
                         TrainConfig(n_epochs=2, batch_size=4, bf16=False,
                                     verbose=False, save_every=100, seed=3),
                         save_dir=tmp_path_factory.mktemp(tag), mesh=mesh)
            return tr.fit(prepared[:8], prepared[9:])

        mesh = make_mesh(n_data=4, n_graph=1)
        h_mesh = run(mesh, "dp")
        h_solo = run(None, "solo")
        np.testing.assert_allclose(h_mesh["train_loss"],
                                   h_solo["train_loss"], rtol=2e-4)
        np.testing.assert_allclose(h_mesh["val_score"],
                                   h_solo["val_score"], rtol=2e-3, atol=2e-4)

    def test_mesh_fit_rounds_batch_to_axis(self, prepared,
                                           tmp_path_factory):
        """A batch size not divisible by the data axis is rounded and the
        wrapped remainder carries zero weight — training still works."""
        from gcn_grabcut_tpu.train.trainer import Trainer, TrainConfig
        from gcn_grabcut_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n_data=4, n_graph=1)
        tr = Trainer("resgcn", dict(hidden_channels=32, n_layers=2),
                     TrainConfig(n_epochs=1, batch_size=6, bf16=False,
                                 verbose=False, save_every=100),
                     save_dir=tmp_path_factory.mktemp("dp_rnd"), mesh=mesh)
        assert tr._batch_size(9) == 4
        hist = tr.fit(prepared[:9], prepared[9:])
        assert np.isfinite(hist["train_loss"]).all()

    def test_bf16_training_is_finite(self, prepared, tmp_path_factory):
        from gcn_grabcut_tpu.train.trainer import Trainer, TrainConfig
        tr = Trainer("resgcn", dict(hidden_channels=32, n_layers=2),
                     TrainConfig(n_epochs=2, batch_size=4, bf16=True,
                                 verbose=False, save_every=100),
                     save_dir=tmp_path_factory.mktemp("ckpt_bf16"))
        hist = tr.fit(prepared[:9], prepared[9:])
        assert all(np.isfinite(hist["train_loss"]))
        leaves = jax.tree.leaves(tr.state.params)
        assert all(bool(jnp.isfinite(x).all()) for x in leaves)


class TestTrainerVariants:
    @pytest.fixture(scope="class")
    def graphs(self):
        from gcn_grabcut_tpu.data.dataset import (
            make_synthetic_dataset, prepare_dataset)
        from gcn_grabcut_tpu.graph_build import SuperpixelGraphConfig
        samples = make_synthetic_dataset(n=6, size=64, seed=17)
        recs = prepare_dataset(samples, SuperpixelGraphConfig(n_segments=30),
                               keep_segments=False)
        return [r[0] for r in recs]

    @pytest.mark.parametrize("loss_fn", ["focal", "smooth_ce", "ce"])
    def test_all_loss_functions_train(self, graphs, loss_fn, tmp_path):
        from gcn_grabcut_tpu.train.trainer import Trainer, TrainConfig
        tr = Trainer("resgcn", dict(hidden_channels=16, n_layers=1),
                     TrainConfig(n_epochs=1, batch_size=4, bf16=False,
                                 loss_fn=loss_fn, verbose=False,
                                 save_every=100),
                     save_dir=tmp_path)
        hist = tr.fit(graphs)
        assert np.isfinite(hist["train_loss"][0])

    @pytest.mark.parametrize("sched", ["onecycle", "plateau", "none"])
    def test_all_schedulers_train(self, graphs, sched, tmp_path):
        from gcn_grabcut_tpu.train.trainer import Trainer, TrainConfig
        tr = Trainer("resgcn", dict(hidden_channels=16, n_layers=1),
                     TrainConfig(n_epochs=2, batch_size=4, bf16=False,
                                 scheduler=sched, verbose=False,
                                 save_every=100),
                     save_dir=tmp_path)
        hist = tr.fit(graphs[:4], graphs[4:])
        assert len(hist["train_loss"]) == 2

    def test_sgdr_schedule_shape(self):
        from gcn_grabcut_tpu.train.trainer import sgdr_schedule
        import jax.numpy as jnp
        sched = sgdr_schedule(1e-3, t0=10, t_mult=2, steps_per_epoch=1)
        lr0 = float(sched(jnp.int32(0)))
        lr9 = float(sched(jnp.int32(9)))
        lr10 = float(sched(jnp.int32(10)))   # warm restart
        assert lr0 == pytest.approx(1e-3, rel=1e-3)
        assert lr9 < 0.1 * lr0               # near the end of the cycle
        assert lr10 == pytest.approx(1e-3, rel=1e-3)  # restarted
        lr29 = float(sched(jnp.int32(29)))   # end of second cycle (len 20)
        assert lr29 < 0.1 * lr0

    def test_prior_dropout_trains_finite(self, graphs, tmp_path):
        """prior_dropout zeroes the 3 prior input channels per graph with
        the given probability (anti-over-trust regulariser, round 5)."""
        from gcn_grabcut_tpu.train.trainer import Trainer, TrainConfig
        tr = Trainer("resgcn", dict(hidden_channels=16, n_layers=1),
                     TrainConfig(n_epochs=1, batch_size=4, bf16=False,
                                 prior_dropout=0.5, verbose=False,
                                 save_every=100),
                     save_dir=tmp_path)
        hist = tr.fit(graphs)
        assert np.isfinite(hist["train_loss"][0])

    def test_sgd_optimizer_trains(self, graphs, tmp_path):
        from gcn_grabcut_tpu.train.trainer import Trainer, TrainConfig
        tr = Trainer("resgcn", dict(hidden_channels=16, n_layers=1),
                     TrainConfig(n_epochs=1, batch_size=4, bf16=False,
                                 optimizer="sgd", verbose=False,
                                 save_every=100),
                     save_dir=tmp_path)
        hist = tr.fit(graphs)
        assert np.isfinite(hist["train_loss"][0])


class TestGlobalValIoU:
    def test_eval_epoch_equals_single_pass_global_iou(self, request):
        """_eval_epoch must reproduce the reference's model-selection
        contract: ONE global per-class IoU over the concatenated validation
        set (reference trainer.py:342-345), not a mean of per-batch IoUs —
        including when the last batch wraps with zero-weight duplicates."""
        import jax.numpy as jnp
        from gcn_grabcut_tpu.data.dataset import (
            make_synthetic_dataset, prepare_dataset)
        from gcn_grabcut_tpu.graph_build import SuperpixelGraphConfig
        from gcn_grabcut_tpu.train.trainer import (
            Trainer, TrainConfig, per_class_iou)

        samples = make_synthetic_dataset(n=13, size=64, seed=11)
        recs = prepare_dataset(samples, SuperpixelGraphConfig(n_segments=40),
                               keep_segments=False)
        graphs = [r[0] for r in recs]
        train, val = graphs[:6], graphs[6:]   # 7 val graphs, batch 4: wraps

        tr = Trainer("resgcn", dict(hidden_channels=16, n_layers=1),
                     TrainConfig(n_epochs=1, batch_size=4, bf16=False,
                                 verbose=False, save_every=100))
        tr.fit(train, val)

        val_data = tr._bucket(list(val))
        vm = tr._eval_epoch(val_data)

        # Single-pass oracle: all 7 graphs through the model at once.
        logits = tr.model.apply(
            {"params": tr.state.params, "batch_stats": tr.state.batch_stats},
            val_data, train=False)
        preds = jnp.argmax(logits, axis=-1)
        ious = np.asarray(per_class_iou(preds, val_data.y,
                                        val_data.node_mask))
        np.testing.assert_allclose(
            [vm["iou_bg"], vm["iou_unk"], vm["iou_fg"]], ious, atol=1e-5)
        np.testing.assert_allclose(vm["score"], 0.5 * (ious[0] + ious[2]),
                                   atol=1e-5)
