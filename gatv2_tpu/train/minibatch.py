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
from gatv2_tpu.data.sampling import MiniBatch
from gatv2_tpu.models import gatv2
from gatv2_tpu.train import optim


def make_minibatch_step(
    model_config: ModelConfig, train_config: TrainConfig, *, donate: bool = True
) -> Callable:
    """jit(step)(params, opt_state, t, features, src, dst, labels, num_seeds)
    -> (params, opt_state, loss, acc)."""

    def step(params, opt_state, t, features, src, dst, labels, num_seeds):
        grad_fn = jax.value_and_grad(gatv2.loss_fn, has_aux=True)
        (loss, acc), grads = grad_fn(
            params, features, src, dst, labels, model_config,
            impl=train_config.impl, num_valid=num_seeds,
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
) -> Callable:
    """Data-parallel step: every array arg carries a leading per-device dim
    (stacked subgraphs), sharded over `axis_name`. Loss/acc are averaged and
    grads psum'd across the mesh."""
    ndev = mesh.shape[axis_name]

    def local_loss(params, features, src, dst, labels, num_seeds):
        loss, acc = gatv2.loss_fn(
            params, features, src, dst, labels, model_config,
            impl=train_config.impl, num_valid=num_seeds,
        )
        return loss, acc

    def sharded_loss_body(params, features, src, dst, labels, num_seeds):
        # each device sees leading dim 1: drop it
        loss, acc = local_loss(
            params, features[0], src[0], dst[0], labels[0], num_seeds[0]
        )
        loss = jax.lax.pmean(loss, axis_name)
        acc = jax.lax.pmean(acc, axis_name)
        return loss, acc

    sharded_loss = jax.shard_map(
        sharded_loss_body,
        mesh=mesh,
        in_specs=(
            P(),
            P(axis_name, None, None),
            P(axis_name, None),
            P(axis_name, None),
            P(axis_name, None),
            P(axis_name),
        ),
        out_specs=(P(), P()),
    )

    def step(params, opt_state, t, features, src, dst, labels, num_seeds):
        (loss, acc), grads = jax.value_and_grad(
            lambda p: sharded_loss(p, features, src, dst, labels, num_seeds),
            has_aux=True,
        )(params)
        params, opt_state = optim.apply_updates(
            params, grads, opt_state, t, train_config
        )
        return params, opt_state, loss, acc

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def stack_batches(batches: list[MiniBatch], mesh: Mesh, *, axis_name: str = "data"):
    """Stack per-device MiniBatches and place them sharded over the mesh."""
    feats = np.stack([b.features for b in batches])
    src = np.stack([b.src for b in batches])
    dst = np.stack([b.dst for b in batches])
    labels = np.stack([b.labels for b in batches])
    seeds = np.asarray([b.num_seeds for b in batches], np.int32)
    s3 = NamedSharding(mesh, P(axis_name, None, None))
    s2 = NamedSharding(mesh, P(axis_name, None))
    s1 = NamedSharding(mesh, P(axis_name))
    return (
        jax.device_put(feats, s3),
        jax.device_put(src, s2),
        jax.device_put(dst, s2),
        jax.device_put(labels, s2),
        jax.device_put(seeds, s1),
    )
