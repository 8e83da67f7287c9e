"""Sharded full-graph training: shard_map over the 'graph' mesh axis.

Design (SURVEY.md §2.5 'SP/CP' row — the reference has no distributed path
at all, this is new capability):

  - node features / labels / edge arrays are sharded on axis 0 over the
    'graph' axis (see parallel/partition.py for the layout);
  - model parameters are REPLICATED; their gradients are psum'd by the
    autodiff transpose of the replicated capture (shard_map handles this);
  - per layer, each device computes its nodes' projections zs/zd locally
    (dense MXU matmuls on [N/S, F] blocks), then `all_gather`s the src-side
    projections over ICI — the halo exchange. Attention scores, segment
    softmax, and aggregation all stay LOCAL because every edge lives on its
    destination's shard;
  - loss/accuracy are local sums + one psum, normalized by the REAL node
    count (padding nodes carry label -1 and are masked).

Differentiation happens OUTSIDE shard_map (jax.value_and_grad of a function
whose body is shard_map'ped), so XLA transposes the all_gather into a
reduce_scatter in the backward pass automatically.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gatv2_tpu.config import ModelConfig, TrainConfig
from gatv2_tpu.models import gatv2
from gatv2_tpu.ops.segment import segment_softmax, segment_sum
from gatv2_tpu.parallel.partition import PartitionedGraph
from gatv2_tpu.train import optim


def _sharded_layer(
    layer_params,
    x_loc: jax.Array,  # [n_loc, F] this shard's node features
    src_g: jax.Array,  # [e_loc] global src ids for this shard's edges
    dst_l: jax.Array,  # [e_loc] local dst ids (n_loc = padding)
    *,
    axis_name: str,
    is_last: bool,
    negative_slope: float,
    variant: str,
    precision=None,
) -> jax.Array:
    w_src, w_dst, a = layer_params["w_src"], layer_params["w_dst"], layer_params["a"]
    n_loc = x_loc.shape[0]
    zs_loc = jnp.einsum("nf,hdf->nhd", x_loc, w_src, precision=precision)
    zd_loc = jnp.einsum("nf,hdf->nhd", x_loc, w_dst, precision=precision)
    # halo exchange: src projections of ALL nodes (one collective per layer)
    zs_all = jax.lax.all_gather(zs_loc, axis_name, axis=0, tiled=True)

    zs_e = jnp.take(zs_all, src_g, axis=0)  # [e_loc, H, D]
    zd_e = jnp.take(zd_loc, jnp.minimum(dst_l, n_loc - 1), axis=0)
    s = jax.nn.leaky_relu(zs_e + zd_e, negative_slope)
    e = jnp.einsum("ehd,hd->eh", s, a, precision=precision)
    alpha = segment_softmax(e, dst_l, n_loc)
    h = segment_sum(alpha[:, :, None] * zs_e, dst_l, n_loc)  # [n_loc, H, D]

    if not is_last:
        return jax.nn.leaky_relu(h, negative_slope).reshape(n_loc, -1)
    if variant == "edge":
        return jnp.mean(jax.nn.leaky_relu(h, negative_slope), axis=1)
    return jax.nn.leaky_relu(jnp.mean(h, axis=1), negative_slope)


def make_sharded_loss_fn(
    model_config: ModelConfig,
    mesh: Mesh,
    num_real_nodes: int,
    *,
    axis_name: str = "graph",
) -> Callable:
    """Returns loss_fn(params, features, src, dst_local, labels) -> (loss, acc)
    where the data arguments are globally-shaped arrays sharded on axis 0."""

    def body(params, x_loc, src_g, dst_l, labels_loc):
        x = x_loc
        for l, layer_params in enumerate(params["layers"]):
            x = _sharded_layer(
                layer_params,
                x,
                src_g,
                dst_l,
                axis_name=axis_name,
                is_last=(l == model_config.num_layers - 1),
                negative_slope=model_config.negative_slope,
                variant=model_config.variant,
                precision=model_config.precision,
            )
        logits = jnp.matmul(x, params["w_o"].T, precision=model_config.precision)
        # local masked sums, then one psum (padding nodes have label -1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        valid = labels_loc >= 0
        safe = jnp.where(valid, labels_loc, 0)
        nll = -jnp.take_along_axis(logp, safe[:, None].astype(jnp.int32), axis=1)[:, 0]
        correct = jnp.argmax(logits, axis=-1).astype(jnp.int32) == safe
        loss_sum = jnp.sum(jnp.where(valid, nll, 0.0))
        correct_sum = jnp.sum(jnp.where(valid, correct, False).astype(jnp.float32))
        loss = jax.lax.psum(loss_sum, axis_name) / num_real_nodes
        acc = jax.lax.psum(correct_sum, axis_name) / num_real_nodes
        return loss, acc

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(),  # params replicated
            P(axis_name, None),  # features
            P(axis_name),  # src
            P(axis_name),  # dst_local
            P(axis_name),  # labels
        ),
        out_specs=(P(), P()),
    )


def make_sharded_train_step(
    model_config: ModelConfig,
    train_config: TrainConfig,
    mesh: Mesh,
    num_real_nodes: int,
    *,
    axis_name: str = "graph",
    donate: bool = True,
) -> Callable:
    """jit(step)(params, opt_state, t, features, src, dst_local, labels)
    -> (params, opt_state, loss, acc), with data sharded over the mesh."""
    loss_fn = make_sharded_loss_fn(
        model_config, mesh, num_real_nodes, axis_name=axis_name
    )

    def step(params, opt_state, t, features, src, dst_l, labels):
        (loss, acc), grads = jax.value_and_grad(
            lambda p: loss_fn(p, features, src, dst_l, labels), has_aux=True
        )(params)
        params, opt_state = optim.apply_updates(
            params, grads, opt_state, t, train_config
        )
        return params, opt_state, loss, acc

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_sharded_eval_step(
    model_config: ModelConfig, mesh: Mesh, num_real_nodes: int, *, axis_name: str = "graph"
) -> Callable:
    loss_fn = make_sharded_loss_fn(
        model_config, mesh, num_real_nodes, axis_name=axis_name
    )
    return jax.jit(loss_fn)


def device_put_partitioned(
    pg: PartitionedGraph, mesh: Mesh, *, axis_name: str = "graph"
):
    """Place partitioned arrays with their graph-axis shardings."""
    shard0 = NamedSharding(mesh, P(axis_name, None))
    shard1 = NamedSharding(mesh, P(axis_name))
    return (
        jax.device_put(pg.features, shard0),
        jax.device_put(pg.src, shard1),
        jax.device_put(pg.dst_local, shard1),
        jax.device_put(pg.labels, shard1),
    )
