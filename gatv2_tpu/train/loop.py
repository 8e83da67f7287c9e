"""Training driver: jit-compiled full-graph train step + epoch loop.

Replaces the reference's `main()` epoch loop (GATv2_edge_based.cu:1370-1642),
which launches ~20 kernels per epoch with a cudaDeviceSynchronize after each.
Here the whole epoch body — forward, loss, backward, optional clip, update —
is ONE jit-compiled XLA program; the only host crossing per epoch is
fetching the (loss, accuracy) scalars for printing, matching the reference's
console contract:

    Epoch 1
    Avg Loss: 1.791234, Accuracy: 54.32%  total time: 6372.27 ms
    (README.md:128-133)
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from gatv2_tpu.config import ModelConfig, TrainConfig
from gatv2_tpu.data.graph import Graph
from gatv2_tpu.models import gatv2
from gatv2_tpu.train import optim


def make_train_step(
    model_config: ModelConfig,
    train_config: TrainConfig,
    *,
    edge_tiles: Any = None,
    donate: bool = True,
    num_valid: int | None = None,
) -> Callable:
    """Builds jit(train_step)(params, opt_state, t, features, src, dst, labels)
    -> (params, opt_state, loss, acc). num_valid: real node count when the
    node dim is padded (labels on padding rows must be -1)."""

    def step(params, opt_state, t, features, src, dst, labels, et):
        grad_fn = jax.value_and_grad(gatv2.loss_fn, has_aux=True)
        (loss, acc), grads = grad_fn(
            params,
            features,
            src,
            dst,
            labels,
            model_config,
            impl=train_config.impl,
            edge_tiles=et,
            num_valid=num_valid,
        )
        params, opt_state = optim.apply_updates(
            params, grads, opt_state, t, train_config
        )
        return params, opt_state, loss, acc

    donate_argnums = (0, 1) if donate else ()
    jstep = jax.jit(step, donate_argnums=donate_argnums)
    # edge_tiles ride as a jit ARGUMENT (EdgeTiles is a pytree): baked-in
    # closure constants would inline 100s of MB of edge metadata into the HLO
    return lambda *args: jstep(*args, edge_tiles)


def make_multi_epoch_runner(
    model_config: ModelConfig,
    train_config: TrainConfig,
    num_epochs: int,
    *,
    edge_tiles: Any = None,
    num_valid: int | None = None,
) -> Callable:
    """K epochs as ONE device program via lax.scan — the TPU-idiomatic epoch
    loop (no host round-trip per epoch, unlike the reference's fully
    synchronous loop with ~20 cudaDeviceSynchronize per epoch, SURVEY.md §3.1).

    Returns jit(run)(params, opt_state, t0, features, src, dst, labels)
    -> (params, opt_state, losses[K], accs[K]); t0 is the number of epochs
    already completed (Adam bias correction continues from t0+1).
    """

    def epoch_body(carry, t, et):
        params, opt_state = carry
        grad_fn = jax.value_and_grad(gatv2.loss_fn, has_aux=True)

        def run(features, src, dst, labels):
            (loss, acc), grads = grad_fn(
                params,
                features,
                src,
                dst,
                labels,
                model_config,
                impl=train_config.impl,
                edge_tiles=et,
                num_valid=num_valid,
            )
            new_params, new_opt = optim.apply_updates(
                params, grads, opt_state, t, train_config
            )
            return (new_params, new_opt), (loss, acc)

        return run

    def runner(params, opt_state, t0, features, src, dst, labels, et):
        def body(carry, t):
            return epoch_body(carry, t, et)(features, src, dst, labels)

        ts = t0 + 1 + jnp.arange(num_epochs, dtype=jnp.int32)
        (params, opt_state), (losses, accs) = jax.lax.scan(
            body, (params, opt_state), ts
        )
        return params, opt_state, losses, accs

    jrunner = jax.jit(runner, donate_argnums=(0, 1))
    return lambda *args: jrunner(*args, edge_tiles)


def make_split_eval_step(
    model_config: ModelConfig,
    train_config: TrainConfig,
    *,
    edge_tiles: Any = None,
) -> Callable:
    """jit(eval)(params, features, src, dst, labels, *masks) -> per-mask
    accuracies from ONE full-graph forward."""
    from gatv2_tpu.models.gatv2 import model_forward

    def eval_step(params, features, src, dst, labels, *masks_et):
        masks, et = masks_et[:-1], masks_et[-1]
        logits = model_forward(
            params, features, src, dst, model_config,
            impl=train_config.impl, edge_tiles=et,
        )
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        hit = (pred == labels).astype(jnp.float32)
        return tuple(
            jnp.sum(jnp.where(m, hit, 0.0)) / jnp.maximum(jnp.sum(m), 1)
            for m in masks
        )

    jeval = jax.jit(eval_step)
    return lambda params, features, src, dst, labels, *masks: jeval(
        params, features, src, dst, labels, *masks, edge_tiles
    )


def make_eval_step(
    model_config: ModelConfig, train_config: TrainConfig, *, edge_tiles: Any = None
) -> Callable:
    def eval_step(params, features, src, dst, labels, et):
        return gatv2.loss_fn(
            params,
            features,
            src,
            dst,
            labels,
            model_config,
            impl=train_config.impl,
            edge_tiles=et,
        )

    jeval = jax.jit(eval_step)
    return lambda *args: jeval(*args, edge_tiles)


class Trainer:
    """Full-graph trainer with the reference's observable behavior.

    With `splits` (data.splits.Splits) the loss is masked to train nodes and
    val/test accuracy is evaluated from the same full-graph forward — the
    evaluation protocol the reference lacks (its README.md:134 calls test
    evaluation future work)."""

    def __init__(
        self,
        graph: Graph,
        model_config: ModelConfig,
        train_config: TrainConfig,
        *,
        log_fn: Callable[[str], None] = print,
        metrics_sink: Any = None,
        splits: Any = None,
    ):
        self.graph = graph
        self.model_config = model_config
        self.train_config = train_config
        self.log = log_fn
        self.metrics_sink = metrics_sink
        self.splits = splits

        if train_config.impl in ("pallas", "sell"):
            # edges travel via edge_tiles; don't ship the COO arrays
            # (~0.5GB at OGBN-Products scale)
            self.src = jnp.zeros(1, jnp.int32)
            self.dst = jnp.zeros(1, jnp.int32)
        else:
            pe = graph.padded_edges(128)
            self.src = jnp.asarray(pe.src)
            self.dst = jnp.asarray(pe.dst)

        seed = train_config.seed
        if seed is None:
            seed = int(time.time())  # reference seeds with time(NULL), E:1305
        self.key = jax.random.PRNGKey(seed)
        self.params = gatv2.init_params_for_variant(model_config, self.key)
        self.opt_state = optim.init_opt_state(self.params, train_config.optimizer)
        self.epoch = 0  # completed epochs
        num_valid = None
        feats, labels = graph.features, graph.labels
        self._full_labels = None
        if splits is not None:
            self._full_labels = labels
            labels = splits.masked_labels(labels, "train")
            num_valid = int(splits.train.sum())
        edge_tiles = None
        if train_config.impl == "pallas":
            from gatv2_tpu.ops.pallas_attention import setup_full_graph

            edge_tiles, feats, labels, pad_valid = setup_full_graph(
                graph, model_config.heads, model_config.out_dims,
                labels=labels,  # possibly split-masked above
            )
            if pad_valid is not None and num_valid is None:
                num_valid = pad_valid
        elif train_config.impl == "sell":
            from gatv2_tpu.ops.sell_attention import setup_full_graph_sell

            edge_tiles, feats, labels, pad_valid = setup_full_graph_sell(
                graph, model_config.heads, model_config.out_dims,
                labels=labels,
            )
            if pad_valid is not None and num_valid is None:
                num_valid = pad_valid
        self.features = jnp.asarray(feats)
        self.labels = jnp.asarray(labels)
        self._step = make_train_step(
            model_config, train_config, edge_tiles=edge_tiles,
            num_valid=num_valid,
        )
        self._split_eval = None
        if splits is not None:
            self._split_eval = make_split_eval_step(
                model_config, train_config, edge_tiles=edge_tiles
            )
            n_all = self.features.shape[0]

            def padmask(m):
                out = np.zeros(n_all, bool)
                out[: m.shape[0]] = m
                return jnp.asarray(out)

            self._masks = tuple(
                padmask(m) for m in (splits.train, splits.val, splits.test)
            )
            full = np.full(n_all, -1, np.int32)
            full[: graph.num_nodes] = self._full_labels
            self._eval_labels = jnp.asarray(full)

    def run(self, epochs: int | None = None) -> dict[str, float]:
        epochs = epochs if epochs is not None else self.train_config.epochs
        last = {}
        for _ in range(epochs):
            self.epoch += 1
            t0 = time.perf_counter()
            self.params, self.opt_state, loss, acc = self._step(
                self.params,
                self.opt_state,
                jnp.asarray(self.epoch, jnp.int32),
                self.features,
                self.src,
                self.dst,
                self.labels,
            )
            loss = float(loss)
            acc = float(acc)
            dt_ms = (time.perf_counter() - t0) * 1e3
            self.log(f"Epoch {self.epoch}")
            self.log(
                f"Avg Loss: {loss:.6f}, Accuracy: {acc * 100.0:.2f}%  "
                f"total time: {dt_ms:.2f} ms"
            )
            last = {"epoch": self.epoch, "loss": loss, "accuracy": acc, "ms": dt_ms}
            if self._split_eval is not None:
                accs = self.evaluate()
                self.log(
                    f"Train/Val/Test Accuracy: {accs['train'] * 100:.2f}% / "
                    f"{accs['val'] * 100:.2f}% / {accs['test'] * 100:.2f}%"
                )
                last.update({f"{k}_accuracy": v for k, v in accs.items()})
            if self.metrics_sink is not None:
                self.metrics_sink.write(last)
        return last

    def evaluate(self) -> dict[str, float]:
        """Accuracy on the train/val/test splits from one full forward."""
        if self._split_eval is None:
            raise ValueError("Trainer built without splits")
        accs = self._split_eval(
            self.params, self.features, self.src, self.dst,
            self._eval_labels, *self._masks,
        )
        return {k: float(v) for k, v in zip(("train", "val", "test"), accs)}
