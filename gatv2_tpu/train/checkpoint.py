"""Checkpoint / resume: params + optimizer state + epoch counter.

The reference has no checkpointing beyond text-dump debug hooks
(save_array_to_file / load_float_array, GATv2_node_based.cu:53-68,39-49).
This module provides atomic npz checkpoints. Resume restores the epoch
counter so Adam's epoch-indexed bias correction (E:908-911) continues with
the correct `t`.
"""

from __future__ import annotations

import json
import os
import pathlib
import tempfile
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any, prefix: str):
    leaves, treedef = jax.tree.flatten(tree)
    return {f"{prefix}{i}": np.asarray(l) for i, l in enumerate(leaves)}, treedef


def save(directory: str, params: Any, opt_state: Any, epoch: int) -> pathlib.Path:
    d = pathlib.Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    p_flat, p_def = _flatten(params, "p")
    o_flat, o_def = _flatten(opt_state, "o")
    meta = {
        "epoch": int(epoch),
        "params_treedef": str(p_def),
        "opt_treedef": str(o_def),
    }
    path = d / f"ckpt_{epoch:08d}.npz"
    # atomic write: tmp file + rename (np.savez keeps names ending in .npz)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz")
    os.close(fd)
    np.savez(tmp, __meta__=json.dumps(meta), **p_flat, **o_flat)
    os.replace(tmp, path)
    return path


def _unflatten_like(template: Any, flat: dict[str, np.ndarray], prefix: str) -> Any:
    leaves, treedef = jax.tree.flatten(template)
    new_leaves = [flat[f"{prefix}{i}"] for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new_leaves)


def restore(path: str | pathlib.Path, params_template: Any, opt_template: Any):
    """Restore into the structure of the given templates."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        flat = {k: z[k] for k in z.files if k != "__meta__"}
    params = _unflatten_like(params_template, flat, "p")
    opt_state = _unflatten_like(opt_template, flat, "o")
    return params, opt_state, meta["epoch"]


def latest_path(directory: str) -> pathlib.Path | None:
    d = pathlib.Path(directory)
    if not d.is_dir():
        return None
    ckpts = sorted(d.glob("ckpt_*.npz"))
    return ckpts[-1] if ckpts else None


def restore_latest(directory: str, params_template: Any = None, opt_template: Any = None):
    """Restore the newest checkpoint; returns (params, opt_state, epoch) or None.

    Without templates, reconstructs generic nested structure is impossible, so
    callers that pass templates get exact pytrees; the Trainer path passes its
    freshly-initialized params/opt_state as templates via `restore_into`.
    """
    path = latest_path(directory)
    if path is None:
        return None
    if params_template is None:
        raise ValueError("restore_latest requires templates; use restore_into")
    return restore(path, params_template, opt_template)


def restore_into(directory: str, trainer) -> bool:
    """Restore newest checkpoint into a Trainer in place. True if restored."""
    path = latest_path(directory)
    if path is None:
        return False
    params, opt_state, epoch = restore(path, trainer.params, trainer.opt_state)
    trainer.params = jax.tree.map(lambda x: jax.numpy.asarray(x), params)
    trainer.opt_state = jax.tree.map(lambda x: jax.numpy.asarray(x), opt_state)
    trainer.epoch = epoch
    return True
