"""Checkpoint I/O: msgpack-serialised pytrees with JSON metadata.

The reference persists torch state-dicts plus optimizer/scheduler/config
(src/gcn_grabcut/trainer.py:386-412) and recovers architecture
hyper-parameters from state-dict key shapes at load time
(inference.py:81-86).  Here the metadata (variant, model kwargs, train
config, epoch, score) is stored explicitly alongside the weights, and files
are written atomically (tmp + os.replace) like the reference's graph cache
(dataset.py:432-441).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str | Path, params: Any, batch_stats: Any,
                    meta: Optional[dict] = None,
                    opt_state: Any = None) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
        "meta_json": np.frombuffer(
            json.dumps(meta or {}).encode(), dtype=np.uint8).copy(),
    }
    if opt_state is not None:
        payload["opt_state"] = serialization.to_state_dict(
            jax.device_get(opt_state))
    blob = serialization.msgpack_serialize(payload)
    tmp = path.with_suffix(f".{os.getpid()}.tmp")
    try:
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    except BaseException:
        tmp.unlink(missing_ok=True)
        raise


def load_checkpoint(path: str | Path):
    """Returns (params, batch_stats, meta dict)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = json.loads(bytes(payload["meta_json"]).decode())
    return payload["params"], payload["batch_stats"], meta


def load_ensemble_from_checkpoints(paths, dtype=None):
    """Load M architecture-compatible checkpoints as one inference
    ensemble: (model, ensemble_variables, metas).

    The returned variables bundle (models.factory.stack_variables) runs all
    members in a single vmapped jit and averages class probabilities —
    see stack_variables for why this is near-free on this backend.  All
    checkpoints must share variant + model kwargs (the first file's
    metadata builds the module)."""
    from ..models.factory import build_model, stack_variables
    paths = [Path(p) for p in paths]
    if not paths:
        raise ValueError("load_ensemble_from_checkpoints needs >= 1 path")
    metas, var_list = [], []
    for p in paths:
        params, batch_stats, meta = load_checkpoint(p)
        metas.append(meta)
        var_list.append({"params": params, "batch_stats": batch_stats})
    ref_kw = metas[0].get("model_kwargs", {})
    ref_variant = metas[0].get("variant", "resgcn")

    def shape_kw(kw):
        # Keys that change parameter shapes; regularisation-only kwargs
        # (dropout) may legitimately differ between training runs.
        keys = ("in_channels", "edge_channels", "hidden_channels",
                "n_layers", "n_classes", "n_heads")
        return {k: kw[k] for k in keys if k in kw}

    for p, m in zip(paths[1:], metas[1:]):
        if (m.get("variant", "resgcn") != ref_variant
                or shape_kw(m.get("model_kwargs", {})) != shape_kw(ref_kw)):
            raise ValueError(
                f"checkpoint {p} is architecture-incompatible with "
                f"{paths[0]} ({m.get('variant')}/{m.get('model_kwargs')} "
                f"vs {ref_variant}/{ref_kw})")
    kwargs = dict(ref_kw)
    if dtype is not None:
        kwargs["dtype"] = dtype
    model = build_model(ref_variant, **kwargs)
    return model, stack_variables(var_list), metas


def load_model_auto(spec, dtype=None):
    """CLI-facing loader: `spec` is one checkpoint path or a
    comma-separated list (or a sequence of paths).  A single path loads a
    plain model; several load the vmapped inference ensemble — so the
    README-recommended 6-checkpoint configuration is reachable from every
    product CLI (`cli.evaluate`, `cli.serve`, `cli.inference`).

    Returns (model, variables, meta) with `meta["ensemble_size"]` set."""
    if isinstance(spec, (str, Path)):
        paths = [p for p in str(spec).split(",") if p]
    else:
        paths = [str(p) for p in spec]
    if len(paths) == 1:
        model, variables, meta = load_model_from_checkpoint(paths[0],
                                                            dtype=dtype)
        meta = dict(meta, ensemble_size=1)
        return model, variables, meta
    model, variables, metas = load_ensemble_from_checkpoints(paths,
                                                             dtype=dtype)
    meta = dict(metas[0], ensemble_size=len(paths))
    return model, variables, meta


def load_opt_state(path: str | Path, target: Any):
    """Restore the optimiser state onto a freshly-initialised `target`
    pytree (None if the checkpoint has no optimiser state)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if "opt_state" not in payload:
        return None
    return serialization.from_state_dict(target, payload["opt_state"])


def load_model_from_checkpoint(path: str | Path, dtype=None):
    """Rebuild (model, variables, meta) from a checkpoint's own metadata —
    the analog of the reference's shape-recovery trick (inference.py:81-86),
    without needing to infer shapes."""
    from ..models.factory import build_model
    params, batch_stats, meta = load_checkpoint(path)
    kwargs = dict(meta.get("model_kwargs", {}))
    if dtype is not None:
        kwargs["dtype"] = dtype
    model = build_model(meta.get("variant", "resgcn"), **kwargs)
    variables = {"params": params, "batch_stats": batch_stats}
    return model, variables, meta
