"""Checkpoint / resume: params + optimizer state + epoch counter.

The reference has no checkpointing beyond text-dump debug hooks
(save_array_to_file / load_float_array, GATv2_node_based.cu:53-68,39-49).
This module provides atomic npz checkpoints. Resume restores the epoch
counter so Adam's epoch-indexed bias correction (E:908-911) continues with
the correct `t`.

Restore validates the stored pytree structure and per-leaf shapes against
the caller's templates and fails with an actionable message on mismatch
(e.g. resuming with a different --num-layers/--heads); the saved metadata
carries a model/train-config fingerprint for the same reason. Restoring
into a sharded trainer re-places every leaf with the template's sharding
(NamedSharding survives resume — see restore_into).
"""

from __future__ import annotations

import dataclasses
import hashlib
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


def run_meta(model_config: Any = None, train_config: Any = None) -> dict:
    """Fingerprint of the configs that must match between save and resume."""
    meta: dict[str, Any] = {}
    if model_config is not None:
        d = dataclasses.asdict(model_config)
        # execution knobs (precision tier, remat, dtypes) may differ between
        # the saving and resuming runs without changing what the params mean
        skip = {"matmul_precision", "remat", "compute_dtype", "param_dtype"}
        meta["model_config"] = {k: d[k] for k in sorted(d) if k not in skip}
    if train_config is not None:
        d = dataclasses.asdict(train_config)
        # only fields whose change breaks a resume: the optimizer family
        # (moment semantics) and the minibatch shape (step-count/bias
        # correction). Execution knobs like impl/precision may legitimately
        # differ between the saving and resuming runs.
        keep = ("optimizer", "batch_size", "fanouts")
        meta["train_config"] = {k: d[k] for k in keep if k in d}
    blob = json.dumps(meta, sort_keys=True, default=str)
    meta["config_hash"] = hashlib.sha256(blob.encode()).hexdigest()[:16]
    return meta


def save(
    directory: str, params: Any, opt_state: Any, epoch: int, *, meta: dict | None = None
) -> pathlib.Path:
    d = pathlib.Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    p_flat, p_def = _flatten(params, "p")
    o_flat, o_def = _flatten(opt_state, "o")
    full_meta = {
        "epoch": int(epoch),
        "params_treedef": str(p_def),
        "opt_treedef": str(o_def),
        **(meta or {}),
    }
    path = d / f"ckpt_{epoch:08d}.npz"
    # atomic write: tmp file + rename (np.savez keeps names ending in .npz)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz")
    os.close(fd)
    np.savez(tmp, __meta__=json.dumps(full_meta), **p_flat, **o_flat)
    os.replace(tmp, path)
    return path


class CheckpointMismatch(ValueError):
    """Stored checkpoint does not match the restore templates."""


def _unflatten_like(
    template: Any, flat: dict[str, np.ndarray], prefix: str, *, what: str, path
) -> Any:
    leaves, treedef = jax.tree.flatten(template)
    stored = sorted(
        (k for k in flat if k.startswith(prefix) and k[len(prefix):].isdigit()),
        key=lambda k: int(k[len(prefix):]),
    )
    if len(stored) != len(leaves):
        raise CheckpointMismatch(
            f"{path}: checkpoint stores {len(stored)} {what} tensors but the "
            f"current run expects {len(leaves)} — the model/optimizer "
            f"configuration changed since the checkpoint was written"
        )
    new_leaves = []
    for i, tmpl in enumerate(leaves):
        arr = flat[f"{prefix}{i}"]
        tshape = tuple(np.shape(tmpl))
        if tuple(arr.shape) != tshape:
            raise CheckpointMismatch(
                f"{path}: {what} tensor #{i} has stored shape {tuple(arr.shape)}"
                f" but the current run expects {tshape} — check --num-layers/"
                f"--heads/--outdims (and the dataset's class/feature counts) "
                f"against the checkpointed run"
            )
        new_leaves.append(arr)
    return jax.tree.unflatten(treedef, new_leaves)


def restore(path: str | pathlib.Path, params_template: Any, opt_template: Any):
    """Restore into the structure of the given templates (validated).

    An EMPTY template (no leaves, e.g. `{}`) opts that group out of both
    validation and restoration — predict.py loads weights this way without
    caring about the checkpointed optimizer state."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        flat = {k: z[k] for k in z.files if k != "__meta__"}

    def _restore_group(tmpl, prefix, key, what):
        if not jax.tree.leaves(tmpl):
            return tmpl  # caller skips this group (e.g. predict: opt state)
        want = str(jax.tree.flatten(tmpl)[1])
        if meta.get(key, want) != want:
            raise CheckpointMismatch(
                f"{path}: stored {key} differs from the current run's "
                f"structure.\n  stored:  {meta.get(key)}\n  current: {want}\n"
                f"The checkpoint was written by a different model/optimizer "
                f"configuration."
            )
        return _unflatten_like(tmpl, flat, prefix, what=what, path=path)

    params = _restore_group(params_template, "p", "params_treedef", "parameter")
    opt_state = _restore_group(opt_template, "o", "opt_treedef", "optimizer")
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


def _put_like(template_leaf, value: np.ndarray):
    """Re-place a restored leaf with the template's device placement, so a
    sharded trainer (NamedSharding over a mesh) resumes sharded instead of
    silently collapsing to single-device arrays."""
    sharding = getattr(template_leaf, "sharding", None)
    if sharding is not None:
        return jax.device_put(value, sharding)
    return jax.numpy.asarray(value)


def read_meta(path: str | pathlib.Path) -> dict:
    """The checkpoint's stored metadata (epoch, treedefs, config blobs)."""
    with np.load(path, allow_pickle=False) as z:
        return json.loads(str(z["__meta__"]))


def restore_into(directory: str, trainer, *, expect_meta: dict | None = None) -> bool:
    """Restore newest checkpoint into a Trainer in place. True if restored.

    expect_meta (a run_meta() dict for the CURRENT run): when both it and
    the stored checkpoint carry a config fingerprint, a mismatch raises
    CheckpointMismatch naming the differing fields — shapes can coincide
    while semantics differ (e.g. resuming an edge-variant checkpoint as
    --variant node, or with a different --batch-size, which corrupts the
    Adam step count)."""
    path = latest_path(directory)
    if path is None:
        return False
    if expect_meta is not None and "config_hash" in expect_meta:
        stored = read_meta(path)
        # JSON round-trip the current fingerprint (tuples -> lists) so the
        # diff listing compares like with like
        expect_meta = json.loads(json.dumps(expect_meta, default=str))
        if "config_hash" in stored and (
            stored["config_hash"] != expect_meta["config_hash"]
        ):
            diffs = []
            for group in ("model_config", "train_config"):
                a, b = stored.get(group, {}), expect_meta.get(group, {})
                for k in sorted(set(a) | set(b)):
                    if a.get(k) != b.get(k):
                        diffs.append(f"{group}.{k}: stored={a.get(k)!r} "
                                     f"current={b.get(k)!r}")
            raise CheckpointMismatch(
                f"{path}: checkpoint was written by a different "
                f"configuration:\n  " + "\n  ".join(diffs)
            )
    params, opt_state, epoch = restore(path, trainer.params, trainer.opt_state)
    trainer.params = jax.tree.map(_put_like, trainer.params, params)
    trainer.opt_state = jax.tree.map(_put_like, trainer.opt_state, opt_state)
    trainer.epoch = epoch
    return True
