"""Minibatch (sampled-subgraph) training, single-device and data-parallel.

Pairs with data.sampling.NeighborSampler. The loss is computed over seed
nodes only (labels are -1 elsewhere); Adam bias correction is indexed by the
global STEP count here (the full-graph path indexes by epoch to match the
reference, train/optim.py).

Data parallelism: one sampled subgraph per device along the 'data' mesh
axis; parameters replicated, gradients psum'd — the autodiff transpose of
the replicated-capture shard_map inserts the psum.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gatv2_tpu.config import ModelConfig, TrainConfig
from gatv2_tpu.data.sampling import MiniBatch, NeighborSampler, prefetch
from gatv2_tpu.models import gatv2
from gatv2_tpu.train import optim


def make_minibatch_step(
    model_config: ModelConfig, train_config: TrainConfig, *,
    donate: bool = True, device_gather: bool = False,
) -> Callable:
    """jit(step)(params, opt_state, t, features, src, dst, labels, num_seeds
    [, edge_tiles]) -> (params, opt_state, loss, acc). With impl='pallas'
    the per-batch EdgeTiles ride as a jit argument — fixed shapes, so every
    batch reuses one compiled step.

    device_gather=True: the `features` argument becomes (feat_table,
    node_ids) — the FULL graph's features stay device-resident and the
    batch's rows are gathered on device (jnp.take). Per-batch transfer
    drops from O(max_nodes x F) floats to O(max_nodes) ids, and the host
    feature gather disappears from the pipeline entirely."""

    def step(params, opt_state, t, features, src, dst, labels, num_seeds,
             edge_tiles=None):
        if device_gather:
            feat_table, node_ids = features
            features = jnp.take(feat_table, node_ids, axis=0, mode="clip")
        grad_fn = jax.value_and_grad(gatv2.loss_fn, has_aux=True)
        (loss, acc), grads = grad_fn(
            params, features, src, dst, labels, model_config,
            impl=train_config.impl, num_valid=num_seeds,
            edge_tiles=edge_tiles,
        )
        params, opt_state = optim.apply_updates(
            params, grads, opt_state, t, train_config
        )
        return params, opt_state, loss, acc

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_dp_minibatch_step(
    model_config: ModelConfig,
    train_config: TrainConfig,
    mesh: Mesh,
    *,
    axis_name: str = "data",
    donate: bool = True,
    tiles_template=None,  # one batch's EdgeTiles: enables the Pallas path
    #   (the step then takes stacked per-device tiles as its last argument)
    device_gather: bool = False,  # features arg becomes (feat_table
    #   [N, F] replicated, node_ids [ndev, max_nodes] sharded); rows are
    #   gathered on device per shard
) -> Callable:
    """Data-parallel step: every array arg carries a leading per-device dim
    (stacked subgraphs), sharded over `axis_name`. The loss/accuracy are
    SEED-WEIGHTED across devices (psum of per-device sums / psum of seed
    counts), so a padding batch with num_seeds=0 contributes nothing — to
    either the printed metrics or the gradient."""

    def sharded_loss_body(params, features, src, dst, labels, num_seeds, et_sh):
        # each device sees leading dim 1: drop it
        et = (
            jax.tree.map(lambda x: x[0], et_sh) if et_sh is not None else None
        )
        n = num_seeds[0]
        if device_gather:
            feat_table, node_ids = features
            feats = jnp.take(feat_table, node_ids[0], axis=0, mode="clip")
        else:
            feats = features[0]
        loss, acc = gatv2.loss_fn(
            params, feats, src[0], dst[0], labels[0], model_config,
            impl=train_config.impl, num_valid=jnp.maximum(n, 1),
            edge_tiles=et,
        )
        w = n.astype(jnp.float32)
        total = jnp.maximum(jax.lax.psum(w, axis_name), 1.0)
        loss = jax.lax.psum(loss * w, axis_name) / total
        acc = jax.lax.psum(acc * w, axis_name) / total
        return loss, acc

    et_specs = (
        jax.tree.map(
            lambda x: P(axis_name, *([None] * np.asarray(x).ndim)),
            tiles_template,
        )
        if tiles_template is not None
        else None
    )
    feat_specs = (
        (P(), P(axis_name, None))  # (replicated table, sharded node ids)
        if device_gather
        else P(axis_name, None, None)
    )
    sharded_loss = jax.shard_map(
        sharded_loss_body,
        mesh=mesh,
        # pallas_call outputs carry no varying-mesh-axes metadata yet
        check_vma=False,
        in_specs=(
            P(),  # params (replicated)
            feat_specs,
            P(axis_name, None),  # src
            P(axis_name, None),  # dst
            P(axis_name, None),  # labels
            P(axis_name),  # num_seeds
            et_specs,
        ),
        out_specs=(P(), P()),
    )

    def step(params, opt_state, t, features, src, dst, labels, num_seeds,
             tiles=None):
        (loss, acc), grads = jax.value_and_grad(
            lambda p: sharded_loss(
                p, features, src, dst, labels, num_seeds, tiles
            ),
            has_aux=True,
        )(params)
        params, opt_state = optim.apply_updates(
            params, grads, opt_state, t, train_config
        )
        return params, opt_state, loss, acc

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def stack_batches(
    batches: list[MiniBatch], mesh: Mesh, *, axis_name: str = "data",
    feat_table=None,  # device-resident [N, F] table -> device-gather mode
):
    """Stack per-device MiniBatches and place them sharded over the mesh.
    With `feat_table` (device-gather mode) the first element is
    (feat_table, stacked node_ids) — per-step transfer is ids, not rows.
    When the batches carry EdgeTiles (emit_tiles sampler mode — identical
    shapes across batches by construction), the stacked tiles pytree is
    returned as a sixth element."""
    src = np.stack([b.src for b in batches])
    dst = np.stack([b.dst for b in batches])
    labels = np.stack([b.labels for b in batches])
    seeds = np.asarray([b.num_seeds for b in batches], np.int32)
    s3 = NamedSharding(mesh, P(axis_name, None, None))
    s2 = NamedSharding(mesh, P(axis_name, None))
    s1 = NamedSharding(mesh, P(axis_name))
    if feat_table is not None:
        ids = np.stack([b.node_ids for b in batches])
        feats = (feat_table, jax.device_put(ids, s2))
    else:
        feats = jax.device_put(np.stack([b.features for b in batches]), s3)
    out = (
        feats,
        jax.device_put(src, s2),
        jax.device_put(dst, s2),
        jax.device_put(labels, s2),
        jax.device_put(seeds, s1),
    )
    if batches[0].tiles is None:
        return out
    tiles = jax.tree.map(
        lambda *leaves: jax.device_put(
            np.stack([np.asarray(l) for l in leaves]),
            NamedSharding(
                mesh, P(axis_name, *([None] * np.asarray(leaves[0]).ndim))
            ),
        ),
        *[b.tiles for b in batches],
    )
    return out + (tiles,)


class MinibatchTrainer:
    """Sampled-subgraph trainer with the reference's console contract
    (per-epoch 'Avg Loss / Accuracy / total time' lines; loss and accuracy
    are seed-weighted averages over the epoch's batches)."""

    def __init__(
        self,
        graph,
        model_config: ModelConfig,
        train_config: TrainConfig,
        *,
        log_fn: Callable[[str], None] = print,
        metrics_sink=None,
        splits=None,
    ):
        import time

        import numpy as np

        from gatv2_tpu.data.sampling import NeighborSampler
        from gatv2_tpu.models import gatv2 as _g

        self.graph = graph
        self.model_config = model_config
        self.train_config = train_config
        self.log = log_fn
        self.metrics_sink = metrics_sink
        self.splits = splits
        fanouts = train_config.fanouts or tuple(
            [10] * model_config.num_layers
        )
        if len(fanouts) != model_config.num_layers:
            raise ValueError(
                f"--fanouts needs {model_config.num_layers} entries, got "
                f"{len(fanouts)}"
            )
        seed = train_config.seed
        if seed is None:
            seed = int(time.time())
        self._seed = seed
        # with splits: only train nodes seed batches (no val/test leakage)
        seed_nodes = np.nonzero(splits.train)[0] if splits is not None else None
        self.sampler = NeighborSampler(
            graph,
            train_config.batch_size,
            fanouts,
            seed=seed,
            engine=train_config.sampler_engine,
            seed_nodes=seed_nodes,
            emit_tiles=(
                train_config.impl
                if train_config.impl in ("pallas", "sell")
                else False
            ),
            budget=train_config.sample_budget,
            gather_features=(train_config.feature_residency == "host"),
        )
        self.params = _g.init_params_for_variant(model_config, jax.random.PRNGKey(seed))
        self.opt_state = optim.init_opt_state(self.params, train_config.optimizer)
        self.epoch = 0
        self.step_count = 0
        # 'device' (default): the full feature matrix lives on device once
        # and batches carry ids; 'host': per-batch host gather + row upload
        # (for graphs whose feature matrix exceeds device memory)
        self._device_gather = train_config.feature_residency == "device"
        if self._device_gather:
            self._feat_table = jnp.asarray(graph.features)
        self._step = make_minibatch_step(
            model_config, train_config, device_gather=self._device_gather
        )
        self._eval_step = None
        self._exact_eval = None

    def sync_step_count(self) -> None:
        """After checkpoint resume (which restores `epoch`): rebuild the
        Adam step counter so bias correction continues, instead of
        restarting at t=1 with warm moments."""
        self.step_count = self.epoch * self.sampler.batches_per_epoch()

    def evaluate(self, which: str = "test") -> float:
        """Accuracy on a split via sampled-subgraph inference: every node of
        the split seeds exactly one batch; accuracy is seed-weighted."""
        from gatv2_tpu.models import gatv2 as _g

        if self.splits is None:
            raise ValueError("MinibatchTrainer built without splits")
        # one sampler per split, cached: rebuilding would re-run probe
        # batches and (with probe-sized budgets) recompile the eval step
        if not hasattr(self, "_eval_samplers"):
            self._eval_samplers = {}
        sampler = self._eval_samplers.get(which)
        if sampler is None:
            nodes = np.nonzero(getattr(self.splits, which))[0]
            sampler = NeighborSampler(
                self.graph,
                self.train_config.batch_size,
                self.sampler.fanouts,
                seed=self._seed + 1,
                engine=self.train_config.sampler_engine,
                seed_nodes=nodes,
                emit_tiles=(
                    self.train_config.impl
                    if self.train_config.impl in ("pallas", "sell")
                    else False
                ),
                budget=self.train_config.sample_budget,
                gather_features=(
                    self.train_config.feature_residency == "host"
                ),
            )
            self._eval_samplers[which] = sampler
        if self._eval_step is None:
            mc, tc = self.model_config, self.train_config
            dg = self._device_gather

            def ev(params, features, src, dst, labels, num_seeds, et=None):
                if dg:
                    feat_table, node_ids = features
                    features = jnp.take(feat_table, node_ids, axis=0, mode="clip")
                logits = _g.model_forward(
                    params, features, src, dst, mc, impl=tc.impl,
                    edge_tiles=et,
                )
                _, acc = _g.loss_and_accuracy(logits, labels, num_seeds)
                return acc

            self._eval_step = jax.jit(ev)
        correct = 0.0
        total = 0
        for b in prefetch(sampler, depth=2):
            feats_arg = (
                (self._feat_table, jnp.asarray(b.node_ids))
                if self._device_gather
                else jnp.asarray(b.features)
            )
            acc = self._eval_step(
                self.params,
                feats_arg,
                jnp.asarray(b.src),
                jnp.asarray(b.dst), jnp.asarray(b.labels),
                jnp.asarray(b.num_seeds, jnp.int32),
                b.tiles,
            )
            correct += float(acc) * b.num_seeds
            total += b.num_seeds
        return correct / max(total, 1)

    def evaluate_exact(self) -> dict[str, float]:
        """Split accuracies from ONE exact full-graph forward: every node
        aggregates its FULL in-neighborhood, the reference's evaluation
        semantics (all-N-nodes exact eval, GATv2_edge_based.cu:514-550).
        Deterministic — independent of sampler fanouts, seeds, and RNG
        stream consumption, unlike the sampled-subgraph `evaluate()` (kept
        as the fast stochastic option). Memory: large graphs run through
        the same chunked-kernel full-graph path the full-graph Trainer
        uses (setup_full_graph auto-chunking)."""
        from gatv2_tpu.train.loop import make_split_eval_step

        if self.splits is None:
            raise ValueError("MinibatchTrainer built without splits")
        if self._exact_eval is None:
            graph, mc, tc = self.graph, self.model_config, self.train_config
            feats = graph.features
            edge_tiles = None
            if tc.impl == "pallas":
                from gatv2_tpu.ops.pallas_attention import setup_full_graph

                edge_tiles, feats, _, _ = setup_full_graph(
                    graph, mc.heads, mc.out_dims
                )
            elif tc.impl == "sell":
                from gatv2_tpu.ops.sell_attention import (
                    setup_full_graph_sell,
                )

                edge_tiles, feats, _, _ = setup_full_graph_sell(
                    graph, mc.heads, mc.out_dims
                )
            n_all = feats.shape[0]

            def padmask(m):
                out = np.zeros(n_all, bool)
                out[: m.shape[0]] = m
                return jnp.asarray(out)

            full = np.full(n_all, -1, np.int32)
            full[: graph.num_nodes] = graph.labels
            if tc.impl in ("pallas", "sell"):
                src = dst = jnp.zeros(1, jnp.int32)
            else:
                pe = graph.padded_edges(128)
                src, dst = jnp.asarray(pe.src), jnp.asarray(pe.dst)
            self._exact_eval = (
                make_split_eval_step(mc, tc, edge_tiles=edge_tiles),
                jnp.asarray(feats), src, dst, jnp.asarray(full),
                tuple(
                    padmask(m)
                    for m in (
                        self.splits.train, self.splits.val, self.splits.test
                    )
                ),
            )
        step, feats, src, dst, labels, masks = self._exact_eval
        accs = step(self.params, feats, src, dst, labels, *masks)
        return {k: float(v) for k, v in zip(("train", "val", "test"), accs)}

    def run(self, epochs: int | None = None) -> dict:
        import time

        epochs = epochs if epochs is not None else self.train_config.epochs
        last = {}
        for _ in range(epochs):
            self.epoch += 1
            t0 = time.perf_counter()
            loss_sum = 0.0
            correct_sum = 0.0
            seeds_total = 0
            for b in prefetch(self.sampler, depth=2):
                self.step_count += 1
                feats_arg = (
                    (self._feat_table, jnp.asarray(b.node_ids))
                    if self._device_gather
                    else jnp.asarray(b.features)
                )
                self.params, self.opt_state, loss, acc = self._step(
                    self.params,
                    self.opt_state,
                    jnp.asarray(self.step_count, jnp.int32),
                    feats_arg,
                    jnp.asarray(b.src),
                    jnp.asarray(b.dst),
                    jnp.asarray(b.labels),
                    jnp.asarray(b.num_seeds, jnp.int32),
                    b.tiles,
                )
                loss_sum += float(loss) * b.num_seeds
                correct_sum += float(acc) * b.num_seeds
                seeds_total += b.num_seeds
            dt_ms = (time.perf_counter() - t0) * 1e3
            avg_loss = loss_sum / max(seeds_total, 1)
            avg_acc = correct_sum / max(seeds_total, 1)
            self.log(f"Epoch {self.epoch}")
            self.log(
                f"Avg Loss: {avg_loss:.6f}, Accuracy: {avg_acc * 100.0:.2f}%  "
                f"total time: {dt_ms:.2f} ms"
            )
            last = {
                "epoch": self.epoch,
                "loss": avg_loss,
                "accuracy": avg_acc,
                "ms": dt_ms,
                "batches": self.sampler.batches_per_epoch(),
            }
            if self.metrics_sink is not None:
                self.metrics_sink.write(last)
        return last


class DataParallelMinibatchTrainer(MinibatchTrainer):
    """Sampled-subgraph training data-parallel over a 'data' mesh axis:
    each device trains on its own sampled subgraph per step; gradients are
    combined seed-weighted by the autodiff transpose of the psum in
    make_dp_minibatch_step. Reached from the CLI via --mesh N --batch-size B.

    The epoch's batch stream is grouped into N-device super-steps; a
    trailing partial group is padded with zero-seed dummies (num_seeds=0,
    all labels -1) that contribute nothing to metrics or gradients.
    """

    def __init__(
        self,
        graph,
        model_config: ModelConfig,
        train_config: TrainConfig,
        num_devices: int,
        *,
        log_fn: Callable[[str], None] = print,
        metrics_sink=None,
        splits=None,
    ):
        super().__init__(
            graph, model_config, train_config,
            log_fn=log_fn, metrics_sink=metrics_sink, splits=splits,
        )
        from gatv2_tpu.parallel.mesh import make_mesh

        self.mesh = make_mesh(num_devices, axis_name="data")
        self.ndev = num_devices
        if self._device_gather:
            # commit the table REPLICATED over the data mesh once — an
            # uncommitted single-device array would be re-broadcast to every
            # device on every super-step (round-2 review finding)
            self._feat_table = jax.device_put(
                np.asarray(graph.features),
                NamedSharding(self.mesh, P()),
            )
        self._dp_step = None  # built lazily (pallas needs a tiles template)

    def _pad_group(self, group: list[MiniBatch]) -> list[MiniBatch]:
        import dataclasses as _dc

        while len(group) < self.ndev:
            b0 = group[0]
            group.append(
                _dc.replace(
                    b0,
                    labels=np.full_like(b0.labels, -1),
                    num_seeds=0,
                )
            )
        return group

    def run(self, epochs: int | None = None) -> dict:
        import time

        epochs = epochs if epochs is not None else self.train_config.epochs
        last = {}
        for _ in range(epochs):
            self.epoch += 1
            t0 = time.perf_counter()
            loss_sum = 0.0
            correct_sum = 0.0
            seeds_total = 0
            group: list[MiniBatch] = []

            def flush(group):
                nonlocal loss_sum, correct_sum, seeds_total
                group = self._pad_group(group)
                if self._dp_step is None:
                    self._dp_step = make_dp_minibatch_step(
                        self.model_config, self.train_config, self.mesh,
                        tiles_template=group[0].tiles,
                        device_gather=self._device_gather,
                    )
                self.step_count += 1
                stacked = stack_batches(
                    group, self.mesh,
                    feat_table=(
                        self._feat_table if self._device_gather else None
                    ),
                )
                self.params, self.opt_state, loss, acc = self._dp_step(
                    self.params, self.opt_state,
                    jnp.asarray(self.step_count, jnp.int32), *stacked,
                )
                n = sum(b.num_seeds for b in group)
                loss_sum += float(loss) * n
                correct_sum += float(acc) * n
                seeds_total += n

            for b in prefetch(self.sampler, depth=2 * self.ndev):
                group.append(b)
                if len(group) == self.ndev:
                    flush(group)
                    group = []
            if group:
                flush(group)
            dt_ms = (time.perf_counter() - t0) * 1e3
            avg_loss = loss_sum / max(seeds_total, 1)
            avg_acc = correct_sum / max(seeds_total, 1)
            self.log(f"Epoch {self.epoch}")
            self.log(
                f"Avg Loss: {avg_loss:.6f}, Accuracy: {avg_acc * 100.0:.2f}%  "
                f"total time: {dt_ms:.2f} ms"
            )
            last = {
                "epoch": self.epoch,
                "loss": avg_loss,
                "accuracy": avg_acc,
                "ms": dt_ms,
                "devices": self.ndev,
            }
            if self.metrics_sink is not None:
                self.metrics_sink.write(last)
        return last

    def sync_step_count(self) -> None:
        steps_per_epoch = -(-self.sampler.batches_per_epoch() // self.ndev)
        self.step_count = self.epoch * steps_per_epoch

    def evaluate(self, which: str = "test") -> float:
        # params are replicated over the data mesh; pull a local copy so the
        # single-device eval path runs without mesh placement constraints
        params_mesh = self.params
        self.params = jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x)), params_mesh
        )
        try:
            return super().evaluate(which)
        finally:
            self.params = params_mesh

    def evaluate_exact(self) -> dict[str, float]:
        params_mesh = self.params
        self.params = jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x)), params_mesh
        )
        try:
            return super().evaluate_exact()
        finally:
            self.params = params_mesh
