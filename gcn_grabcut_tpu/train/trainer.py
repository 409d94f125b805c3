"""Training engine: one pjit-able train step, optax optimisation with
layer-wise LR decay, SGDR/one-cycle/plateau schedules, model selection and
early stopping on validation IoU.

TPU-native counterpart of the reference Trainer
(src/gcn_grabcut/trainer.py:73-418):

* the whole optimisation step (forward, loss, backward, clip, update,
  batch-stats update) is a single jit'd function over dense GraphBatches;
* mixed precision is bf16 compute (no loss scaling needed on TPU — the
  reference needs CUDA GradScaler, trainer.py:144);
* layer-wise LR decay is an optax gradient transformation over parameter
  group labels (the reference builds torch param_groups, model.py:559-590);
* graphs are bucketed to a common static budget and batches are gathers
  from one stacked array — the last partial batch wraps around with zero
  graph-weights instead of recompiling at a new shape;
* distribution is first-class (the reference is single-device, SURVEY
  §2.9/§5.8): pass a `jax.sharding.Mesh` and the same jit'd step runs
  data-parallel — parameters/optimiser state replicated, the graph-batch
  axis sharded over the mesh's "data" axis, gradient psums and the masked
  eval reductions inserted by XLA.  Losses and metrics are bitwise
  independent of the mesh up to float reduction order.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..core.graph import GraphBatch, stack_graphs, pad_graph, CLASS_BG, CLASS_FG, CLASS_UNK
from ..models.factory import build_model
from ..models.resgcn import resgcn_lr_label, resgcn_group_scales
from .losses import make_loss_fn
from . import checkpoints as ckpt_io


@dataclasses.dataclass
class TrainConfig:
    """Mirror of the reference TrainConfig (trainer.py:48-71)."""
    n_epochs: int = 60
    lr: float = 1e-3
    weight_decay: float = 1e-4
    optimizer: str = "adamw"            # adamw | sgd
    scheduler: str = "cosine_warm"      # cosine_warm | onecycle | plateau | none
    loss_fn: str = "trimap"             # trimap | focal | smooth_ce | ce
    focal_gamma: float = 2.0
    dice_weight: float = 0.5
    label_smoothing: float = 0.1
    class_weights: tuple = (1.5, 0.8, 1.5)
    batch_size: int = 8
    bf16: bool = True                   # bf16 compute on TPU (AMP analog)
    grad_clip: float = 1.0
    early_stop_patience: int = 15
    t0: int = 10
    t_mult: int = 2
    val_every: int = 1
    save_every: int = 5
    verbose: bool = True
    seed: int = 0
    log_dir: Optional[str] = None     # TensorBoard scalars when set
    # Per-graph probability of zeroing the 3 prior input channels during
    # training.  The training-free prior is a heuristic that fails on
    # statistics the generator can't cover (e.g. vegetation masses that are
    # geodesically isolated from the border); corruption forces the model
    # to also learn image-feature evidence instead of over-trusting a
    # too-consistent prior (round-5 finding: a bg-connectivity-trained
    # model marked a whole bush FG because its bgness was low).  0 = off
    # (reference parity — the reference has no such mechanism).
    prior_dropout: float = 0.0


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, lr_scale):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def scale_by_group(labels: Any, scales: dict[str, float]
                   ) -> optax.GradientTransformation:
    """Multiply each parameter's update by its group's LR scale."""
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        out = jax.tree.map(lambda u, l: u * scales[l], updates, labels)
        return out, state
    return optax.GradientTransformation(init_fn, update_fn)


def sgdr_schedule(base_lr: float, t0: int, t_mult: int,
                  steps_per_epoch: int) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Cosine annealing with warm restarts, stepped per epoch (the reference
    steps CosineAnnealingWarmRestarts once per epoch, trainer.py:323-324)."""
    # Precompute restart boundaries for a generous horizon (avoiding int32
    # overflow of the geometric period growth).
    boundaries, period, start = [], t0, 0
    while start < 1_000_000:
        boundaries.append((start, period))
        start += period
        period = min(period * max(t_mult, 1), 2_000_000)

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        lr = base_lr
        for s, p in boundaries:
            frac = jnp.clip((epoch - s) / p, 0.0, 1.0)
            in_seg = (epoch >= s) & (epoch < s + p)
            seg_lr = 0.5 * base_lr * (1 + jnp.cos(jnp.pi * frac))
            lr = jnp.where(in_seg, seg_lr, lr)
        return lr
    return schedule


def make_optimizer(cfg: TrainConfig, params, variant: str, n_layers: int,
                   steps_per_epoch: int):
    if cfg.scheduler == "cosine_warm":
        schedule = sgdr_schedule(cfg.lr, cfg.t0, cfg.t_mult, steps_per_epoch)
    elif cfg.scheduler == "onecycle":
        schedule = optax.cosine_onecycle_schedule(
            transition_steps=max(cfg.n_epochs * steps_per_epoch, 1),
            peak_value=cfg.lr, pct_start=0.1)
    else:  # plateau (host-controlled lr_scale) or none
        schedule = cfg.lr

    chain = [optax.clip_by_global_norm(cfg.grad_clip)]
    if cfg.optimizer == "sgd":
        chain += [optax.add_decayed_weights(cfg.weight_decay),
                  optax.trace(decay=0.9, nesterov=True)]
    else:
        chain += [optax.scale_by_adam(),
                  optax.add_decayed_weights(cfg.weight_decay)]

    if variant == "resgcn":
        labels = jax.tree.map_with_path(
            lambda path, _: resgcn_lr_label(
                tuple(getattr(k, "key", k) for k in path), n_layers),
            params)
        chain.append(scale_by_group(labels, resgcn_group_scales(n_layers)))

    chain.append(optax.scale_by_learning_rate(schedule))
    schedule_fn = schedule if callable(schedule) else (lambda step: schedule)
    return optax.chain(*chain), schedule_fn


def per_class_counts(preds: jnp.ndarray, labels: jnp.ndarray,
                     mask: jnp.ndarray, n_classes: int = 3) -> jnp.ndarray:
    """(n_classes, 3) [tp, fp, fn] counts over valid nodes.

    Kept as raw counts so the caller can accumulate them ACROSS batches and
    compute one global per-class IoU, matching the reference's
    model-selection contract — it concatenates every validation prediction
    before computing IoU (reference trainer.py:342-345); a mean of
    per-batch IoUs is biased by batch composition."""
    counts = []
    for c in range(n_classes):
        p = (preds == c) & (mask > 0)
        g = (labels == c) & (mask > 0)
        counts.append(jnp.stack([jnp.sum(p & g), jnp.sum(p & ~g),
                                 jnp.sum(~p & g)]))
    return jnp.stack(counts).astype(jnp.float32)


def per_class_iou(preds: jnp.ndarray, labels: jnp.ndarray,
                  mask: jnp.ndarray, n_classes: int = 3) -> jnp.ndarray:
    """(n_classes,) IoU over valid nodes (reference trainer.py:421-428)."""
    c = per_class_counts(preds, labels, mask, n_classes)
    return c[:, 0] / (c[:, 0] + c[:, 1] + c[:, 2] + 1e-8)


class Trainer:
    """Full training engine over prepared GraphBatches.

    Parameters
    ----------
    model_variant : "resgcn" | "gcn" | "gat"
    model_kwargs  : forwarded to build_model
    config        : TrainConfig
    save_dir      : checkpoint directory
    mesh          : optional jax.sharding.Mesh with a "data" axis — enables
                    data-parallel training: the batch's graph axis is
                    sharded over "data", state is replicated, and the batch
                    size is rounded to a multiple of the axis size.
    """

    def __init__(self, model_variant: str = "resgcn",
                 model_kwargs: Optional[dict] = None,
                 config: Optional[TrainConfig] = None,
                 save_dir: str | Path = "checkpoints",
                 mesh=None):
        self.cfg = config or TrainConfig()
        self.mesh = mesh
        self._n_data = int(mesh.shape["data"]) if mesh is not None else 1
        self.variant = model_variant
        self.model_kwargs = dict(model_kwargs or {})
        if self.cfg.bf16:
            self.model_kwargs.setdefault("dtype", jnp.bfloat16)
        self.model = build_model(model_variant, **self.model_kwargs)
        self.n_layers = self.model_kwargs.get("n_layers", 6)
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)

        self.loss_fn = make_loss_fn(
            self.cfg.loss_fn, gamma=self.cfg.focal_gamma,
            dice_weight=self.cfg.dice_weight,
            label_smoothing=self.cfg.label_smoothing,
            class_weights=list(self.cfg.class_weights))

        self.history = {
            "train_loss": [], "val_loss": [], "val_acc": [],
            "val_iou_bg": [], "val_iou_unk": [], "val_iou_fg": [],
            "val_score": [], "lr": [],
        }
        self._best_score = -float("inf")
        self._patience = 0
        self._lr_scale = 1.0           # plateau scheduler state
        self._plateau_wait = 0
        self._plateau_best = float("inf")
        self._schedule = None
        self.state: Optional[TrainState] = None

        self._tb = None
        if self.cfg.log_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(self.cfg.log_dir)
            except ImportError:
                print("[Trainer] tensorboard unavailable; skipping TB "
                      "logging.")

    # ------------------------------------------------------------------

    def _bucket(self, graphs: Sequence[GraphBatch]) -> GraphBatch:
        """Pad all graphs to a common (N, E) budget and stack them."""
        n_max = max(g.max_nodes for g in graphs)
        e_max = max(g.max_edges for g in graphs)
        return stack_graphs([pad_graph(g, n_max, e_max) for g in graphs])

    def _init_state(self, example: GraphBatch, steps_per_epoch: int):
        rng = jax.random.PRNGKey(self.cfg.seed)
        variables = self.model.init({"params": rng}, example, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx, self._schedule = make_optimizer(
            self.cfg, params, self.variant, self.n_layers, steps_per_epoch)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=batch_stats, opt_state=tx.init(params), tx=tx)

        model, loss_fn = self.model, self.loss_fn
        prior_dropout = float(self.cfg.prior_dropout)

        def train_step(state: TrainState, batch: GraphBatch,
                       graph_weight, rng, lr_scale):
            if prior_dropout > 0:
                from ..core.graph import N_PRIOR_FEATS
                rng, rng_prior = jax.random.split(rng)
                keep = jax.random.bernoulli(
                    rng_prior, 1.0 - prior_dropout,
                    (batch.x.shape[0], 1, 1)).astype(batch.x.dtype)
                x = jnp.concatenate(
                    [batch.x[..., :-N_PRIOR_FEATS],
                     batch.x[..., -N_PRIOR_FEATS:] * keep], axis=-1)
                batch = batch.replace(x=x)

            def loss(params):
                logits, upd = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch, train=True, rngs={"dropout": rng},
                    mutable=["batch_stats"])
                l = loss_fn(logits, batch.y, batch.node_mask,
                            area=batch.node_area, fg_ratio=batch.fg_ratio,
                            graph_weight=graph_weight)
                return l, upd["batch_stats"]

            (l, new_stats), grads = jax.value_and_grad(
                loss, has_aux=True)(state.params)
            state = state.apply_gradients(grads, lr_scale)
            state = state.replace(batch_stats=new_stats)
            return state, l

        def eval_step(state: TrainState, batch: GraphBatch, graph_weight):
            logits = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch, train=False)
            l = loss_fn(logits, batch.y, batch.node_mask,
                        area=batch.node_area, fg_ratio=batch.fg_ratio,
                        graph_weight=graph_weight)
            preds = jnp.argmax(logits, axis=-1)
            mask = batch.node_mask * graph_weight[:, None]
            correct = jnp.sum((preds == batch.y) * mask)
            total = jnp.maximum(jnp.sum(mask), 1.0)
            # Raw tp/fp/fn counts: _eval_epoch accumulates them globally
            # (reference trainer.py:342-345 semantics — NOT per-batch IoUs).
            counts = per_class_counts(preds, batch.y, mask)
            return l, correct / total, counts, jnp.sum(mask)

        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._eval_step = jax.jit(eval_step)

        if self.mesh is not None:
            from ..parallel.mesh import replicate
            self.state = replicate(self.state, self.mesh)

    def _batch_size(self, n: int) -> int:
        """Static per-step graph count: capped by the dataset, rounded to a
        multiple of the mesh's data axis so every shard is non-empty."""
        bs = min(max(1, self.cfg.batch_size), max(n, 1))
        if self._n_data > 1:
            bs = max(self._n_data, (bs // self._n_data) * self._n_data)
        return bs

    def _batches(self, data: GraphBatch, rng: np.random.RandomState,
                 shuffle: bool):
        """Yield (batch, graph_weight) with a static batch size; the last
        batch wraps with zero-weight duplicates."""
        n = data.n_graphs
        bs = self._batch_size(n)
        order = rng.permutation(n) if shuffle else np.arange(n)
        sharding = None
        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding
            sharding = batch_sharding(self.mesh)
        for i in range(0, n, bs):
            idx = order[i:i + bs]
            w = np.ones(bs, np.float32)
            if len(idx) < bs:
                w[len(idx):] = 0.0
                idx = np.concatenate([idx, np.resize(order, bs - len(idx))])
            batch = jax.tree.map(lambda a: jnp.take(a, jnp.asarray(idx),
                                                    axis=0), data)
            w = jnp.asarray(w)
            if sharding is not None:
                batch = jax.tree.map(
                    lambda a: jax.device_put(a, sharding), batch)
                w = jax.device_put(w, sharding)
            yield batch, w

    # ------------------------------------------------------------------

    def fit(self, train_graphs: Sequence[GraphBatch],
            val_graphs: Optional[Sequence[GraphBatch]] = None,
            resume_from: Optional[str] = None) -> dict:
        """Train; `resume_from` restores a checkpoint (model + optimiser)
        and continues from its saved epoch."""
        cfg = self.cfg
        if not train_graphs:
            raise RuntimeError(
                "no training graphs were prepared — check the image and "
                "mask directories, and the preparation warnings above")
        if val_graphs is not None and len(val_graphs) == 0:
            raise RuntimeError(
                "no validation graphs were prepared; model selection would "
                "have nothing to rank")

        train_data = self._bucket(list(train_graphs))
        val_data = self._bucket(list(val_graphs)) if val_graphs else None
        if val_data is not None:
            # Align val budget with train budget for one compiled signature.
            n_max = max(train_data.max_nodes, val_data.max_nodes)
            e_max = max(train_data.max_edges, val_data.max_edges)
            train_data = pad_graph(train_data, n_max, e_max)
            val_data = pad_graph(val_data, n_max, e_max)

        n = train_data.n_graphs
        bs = self._batch_size(n)
        steps_per_epoch = (n + bs - 1) // bs

        example = jax.tree.map(lambda a: a[:min(bs, n)], train_data)
        self._init_state(example, steps_per_epoch)

        start_epoch = 1
        if resume_from is not None:
            meta = self.load(resume_from, weights_only=False)
            start_epoch = int(meta.get("epoch", 0)) + 1
            if meta.get("score") is not None:
                self._best_score = float(meta["score"])
            print(f"[Trainer] Resumed from {resume_from} "
                  f"(epoch {start_epoch - 1}, score {meta.get('score')})")

        rng_np = np.random.RandomState(cfg.seed)
        drop_rng = jax.random.PRNGKey(cfg.seed + 1)

        for epoch in range(start_epoch, cfg.n_epochs + 1):
            t0 = time.time()
            total, nb = 0.0, 0
            for batch, w in self._batches(train_data, rng_np, shuffle=True):
                drop_rng, step_rng = jax.random.split(drop_rng)
                self.state, loss = self._train_step(
                    self.state, batch, w, step_rng,
                    jnp.float32(self._lr_scale))
                total += float(loss)
                nb += 1
            train_loss = total / max(nb, 1)
            self.history["train_loss"].append(train_loss)
            self.history["lr"].append(self._current_lr())

            if val_data is not None and epoch % cfg.val_every == 0:
                vm = self._eval_epoch(val_data)
                for k in ("loss", "acc", "iou_bg", "iou_unk", "iou_fg",
                          "score"):
                    self.history[f"val_{k}"].append(vm[k])
                self._plateau_update(vm["loss"])

                if self._tb:
                    self._tb.add_scalar("val/loss", vm["loss"], epoch)
                    self._tb.add_scalar("val/acc", vm["acc"], epoch)
                    self._tb.add_scalar("val/iou_fg", vm["iou_fg"], epoch)
                    self._tb.add_scalar("val/score", vm["score"], epoch)

                if vm["score"] > self._best_score:
                    self._best_score = vm["score"]
                    self._patience = 0
                    self.save("best_model.msgpack", epoch=epoch,
                              score=vm["score"])
                else:
                    self._patience += 1

                if cfg.verbose and epoch % 5 == 0:
                    print(f"Epoch {epoch:3d}/{cfg.n_epochs} | "
                          f"train_loss={train_loss:.4f} | "
                          f"val_loss={vm['loss']:.4f} | "
                          f"val_acc={vm['acc']:.4f} | "
                          f"IoU_fg={vm['iou_fg']:.4f} | "
                          f"score={vm['score']:.4f} | "
                          f"lr={self._current_lr():.2e} | "
                          f"{time.time() - t0:.1f}s")

                if self._patience >= cfg.early_stop_patience:
                    print(f"[Trainer] Early stopping at epoch {epoch} "
                          f"(no improvement for {cfg.early_stop_patience} "
                          "epochs).")
                    break
            elif cfg.verbose and epoch % 5 == 0:
                print(f"Epoch {epoch:3d}/{cfg.n_epochs} | "
                      f"train_loss={train_loss:.4f} | "
                      f"lr={self._current_lr():.2e}")

            if self._tb:
                self._tb.add_scalar("train/loss", train_loss, epoch)
                self._tb.add_scalar("train/lr", self._current_lr(), epoch)

            if epoch % cfg.save_every == 0:
                self.save(f"epoch_{epoch:04d}.msgpack", epoch=epoch)

        self.save("final_model.msgpack", epoch=cfg.n_epochs)
        self._save_history()
        if self._tb:
            self._tb.close()
        return self.history

    def _eval_epoch(self, val_data: GraphBatch) -> dict:
        rng_np = np.random.RandomState(0)
        total_l, total_correct, total_nodes = 0.0, 0.0, 0.0
        count_acc = np.zeros((3, 3))
        nb = 0
        for batch, w in self._batches(val_data, rng_np, shuffle=False):
            l, acc, counts, nn = self._eval_step(self.state, batch, w)
            total_l += float(l)
            total_correct += float(acc) * float(nn)
            total_nodes += float(nn)
            count_acc += np.asarray(counts)
            nb += 1
        # One GLOBAL per-class IoU over the whole validation set (tp/fp/fn
        # accumulated across batches; wrapped partial-batch duplicates carry
        # zero graph_weight) — the reference concatenates all predictions
        # first (trainer.py:342-345), so mean-of-batch-IoUs would deviate
        # from its checkpoint-selection / early-stop contract.
        ious = count_acc[:, 0] / (count_acc.sum(axis=1) + 1e-8)
        return {
            "loss": total_l / max(nb, 1),
            "acc": total_correct / max(total_nodes, 1),
            "iou_bg": float(ious[CLASS_BG]),
            "iou_unk": float(ious[CLASS_UNK]),
            "iou_fg": float(ious[CLASS_FG]),
            # Selection on the two decided classes, not val loss
            # (reference trainer.py:352-361).
            "score": float(0.5 * (ious[CLASS_FG] + ious[CLASS_BG])),
        }

    # ------------------------------------------------------------------

    def _plateau_update(self, val_loss: float):
        if self.cfg.scheduler != "plateau":
            return
        if val_loss < self._plateau_best - 1e-6:
            self._plateau_best = val_loss
            self._plateau_wait = 0
        else:
            self._plateau_wait += 1
            if self._plateau_wait > 5:
                self._lr_scale *= 0.5
                self._plateau_wait = 0

    def _current_lr(self) -> float:
        base = self.cfg.lr
        if self.state is not None and self._schedule is not None:
            base = float(self._schedule(int(self.state.step)))
        return float(base * self._lr_scale)

    def save(self, filename: str, epoch: int = 0,
             score: Optional[float] = None):
        """Checkpoint with full training state (model + optimiser + config),
        like the reference `_save` (trainer.py:386-400)."""
        ckpt_io.save_checkpoint(
            self.save_dir / filename,
            params=self.state.params,
            batch_stats=self.state.batch_stats,
            opt_state=self.state.opt_state,
            meta=dict(epoch=epoch, score=score, variant=self.variant,
                      model_kwargs={k: v for k, v in
                                    self.model_kwargs.items()
                                    if k != "dtype"},
                      config=dataclasses.asdict(self.cfg)))

    def load(self, filename: str, weights_only: bool = True) -> dict:
        """Restore a checkpoint; with weights_only=False the optimiser
        state resumes too (reference trainer.py:402-412)."""
        path = Path(filename)
        if not path.is_absolute() and not path.exists():
            path = self.save_dir / filename
        params, batch_stats, meta = ckpt_io.load_checkpoint(path)
        if self.state is None:
            raise RuntimeError("call fit() or _init_state() before load()")
        self.state = self.state.replace(params=params,
                                        batch_stats=batch_stats)
        if not weights_only:
            opt = ckpt_io.load_opt_state(path, self.state.opt_state)
            if opt is not None:
                self.state = self.state.replace(opt_state=opt)
        return meta

    def _save_history(self):
        path = self.save_dir / "history.json"
        with open(path, "w") as f:
            json.dump(self.history, f, indent=2)
        print(f"[Trainer] History saved → {path}")
