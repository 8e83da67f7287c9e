"""impl='sell' minibatch training: per-batch fixed-geometry SELL layouts.

The sampler attaches a SellTiles pytree per batch, built with the proven
worst-case geometry (ops/sell_attention.sell_minibatch_geometry) so every
batch's tiles have identical shapes/static aux — one compiled step for the
whole stream, like the pallas EdgeTiles path. Round-4 VERDICT task 7: the
fastest full-graph kernel family was the only one that could not run
sampled-subgraph training (cli.py used to reject the combination).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gatv2_tpu.config import ModelConfig, TrainConfig
from gatv2_tpu.data.sampling import NeighborSampler
from gatv2_tpu.models.gatv2 import init_params, loss_fn
from gatv2_tpu.ops.sell_attention import (
    prepare_minibatch_sell_tiles,
    sell_minibatch_geometry,
)
from gatv2_tpu.train import optim
from gatv2_tpu.train.minibatch import make_minibatch_step


def _cfg(graph):
    return ModelConfig(
        num_layers=2, heads=(2, 1), out_dims=(8, 8),
        num_classes=graph.num_classes, in_dim=graph.feature_dim,
    )


def _tile_signature(tiles):
    leaves, treedef = jax.tree.flatten(tiles)
    return treedef, [(l.shape, l.dtype) for l in leaves]


def test_sell_minibatch_tiles_static_and_numpy(learnable_graph):
    """Every batch's SellTiles: identical treedef + leaf shapes/dtypes
    (one jit cache entry) and numpy leaves (no device transfer in the
    sampler thread)."""
    sampler = NeighborSampler(
        learnable_graph, batch_size=64, fanouts=(4, 4), seed=0,
        emit_tiles="sell",
    )
    batches = list(sampler)
    assert len(batches) >= 2
    sig0 = _tile_signature(batches[0].tiles)
    for b in batches[1:]:
        assert _tile_signature(b.tiles) == sig0
    for leaf in jax.tree.leaves(batches[0].tiles):
        assert isinstance(leaf, np.ndarray)
    # forced-split static aux is uniform (it changes traced code paths)
    assert batches[0].tiles.dst.split and batches[0].tiles.srcs.split


def test_minibatch_sell_matches_xla(learnable_graph):
    """impl='sell' minibatch loss/acc match impl='xla' on the same batch
    (sell kernels auto-interpret on the CPU backend)."""
    g = learnable_graph
    config = _cfg(g)
    sampler = NeighborSampler(
        g, batch_size=64, fanouts=(4, 4), seed=0, emit_tiles="sell",
        gather_features=True,
    )
    b = next(iter(sampler))
    assert b.tiles is not None

    params = init_params(config, jax.random.PRNGKey(0))
    args = (
        jnp.asarray(b.features), jnp.asarray(b.src), jnp.asarray(b.dst),
        jnp.asarray(b.labels),
    )
    lx, ax = loss_fn(params, *args, config, impl="xla", num_valid=b.num_seeds)
    ls, as_ = loss_fn(
        params, *args, config, impl="sell", edge_tiles=b.tiles,
        num_valid=b.num_seeds,
    )
    np.testing.assert_allclose(float(ls), float(lx), rtol=1e-5)
    np.testing.assert_allclose(float(as_), float(ax), atol=1e-6)


def test_sell_minibatch_training_learns(learnable_graph):
    """A few sell minibatch steps through make_minibatch_step reduce the
    loss (grad flow through the custom-VJP SELL backward on per-batch
    layouts)."""
    g = learnable_graph
    config = _cfg(g)
    tc = TrainConfig(optimizer="adam", lr=0.01, seed=0, impl="sell",
                     batch_size=64, fanouts=(4, 4))
    sampler = NeighborSampler(
        g, batch_size=64, fanouts=(4, 4), seed=0, emit_tiles="sell",
        gather_features=True,
    )
    params = init_params(config, jax.random.PRNGKey(0))
    opt_state = optim.init_opt_state(params, "adam")
    step = make_minibatch_step(config, tc, donate=False)
    losses = []
    t = 0
    for _ in range(3):
        for b in sampler:
            t += 1
            params, opt_state, loss, _ = step(
                params, opt_state, jnp.asarray(t, jnp.int32),
                jnp.asarray(b.features), jnp.asarray(b.src),
                jnp.asarray(b.dst), jnp.asarray(b.labels),
                jnp.asarray(b.num_seeds, jnp.int32), b.tiles,
            )
            losses.append(float(loss))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_sell_geometry_bounds_hub_batch():
    """Adversarial degree profiles fit the fixed geometry: a hub receiving
    every edge (forces virtual-row splitting) and a flat all-degree-1
    batch both build without raising, with identical shapes."""
    max_nodes, max_edges = 256, 512
    fixed = sell_minibatch_geometry(max_nodes, max_edges)

    # hub: every edge lands on node 0
    src = np.arange(max_edges, dtype=np.int32) % max_nodes
    dst = np.zeros(max_edges, np.int32)
    t_hub = prepare_minibatch_sell_tiles(src, dst, max_edges, max_nodes, fixed)

    # flat: one edge per dst
    src2 = np.zeros(max_edges, np.int32)
    dst2 = np.arange(max_edges, dtype=np.int32) % max_nodes
    order = np.argsort(dst2, kind="stable")
    t_flat = prepare_minibatch_sell_tiles(
        src2[order], dst2[order], max_edges, max_nodes, fixed
    )

    assert _tile_signature(t_hub) == _tile_signature(t_flat)

    # zero-edge batch (seeds with no sampled neighbors)
    t_empty = prepare_minibatch_sell_tiles(
        np.zeros(max_edges, np.int32), np.full(max_edges, max_nodes, np.int32),
        0, max_nodes, fixed,
    )
    assert _tile_signature(t_empty) == _tile_signature(t_hub)


def test_native_sell_emission_matches_python(learnable_graph):
    """C++ emit_sell_tiles (native/sampler.cpp) is byte-identical to the
    numpy prepare_minibatch_sell_tiles fixed-geometry path — same contract
    the pallas pipeline's emit_tiles has."""
    from gatv2_tpu.utils import native_loader

    if not native_loader.available() and not native_loader.build():
        pytest.skip("native library unavailable")

    g = learnable_graph
    s = NeighborSampler(
        g, batch_size=16, fanouts=(4, 4), seed=1, engine="native",
        emit_tiles="sell",
    )
    b = s.sample(np.arange(16))
    assert b.tiles is not None  # native path produced them

    py = prepare_minibatch_sell_tiles(
        b.src, b.dst, b.num_edges, s.max_nodes, s._sell_fixed
    )
    nat_leaves, nat_def = jax.tree.flatten(b.tiles)
    py_leaves, py_def = jax.tree.flatten(py)
    assert nat_def == py_def  # identical static aux
    for pl_, nl in zip(py_leaves, nat_leaves):
        a_, b_ = np.asarray(pl_), np.asarray(nl)
        assert a_.shape == b_.shape and a_.dtype == b_.dtype
        assert (a_ == b_).all()

    # the hub/zero-edge adversarial profiles agree too
    max_nodes, max_edges = 256, 512
    fixed = sell_minibatch_geometry(max_nodes, max_edges)
    from gatv2_tpu.ops.sell_attention import (
        DEFAULT_SPLIT_CAP,
        sell_tiles_from_native,
    )

    for num_edges, mk in (
        (512, lambda: (np.arange(512, dtype=np.int32) % 256,
                       np.zeros(512, np.int32))),
        (0, lambda: (np.zeros(512, np.int32),
                     np.full(512, 256, np.int32))),
    ):
        src, dst = mk()
        raw = native_loader.emit_sell_tiles(
            src, dst, num_edges, max_nodes, DEFAULT_SPLIT_CAP, fixed
        )
        nat = sell_tiles_from_native(raw, max_nodes, fixed)
        ref = prepare_minibatch_sell_tiles(
            src, dst, num_edges, max_nodes, fixed
        )
        for pl_, nl in zip(jax.tree.leaves(ref), jax.tree.leaves(nat)):
            assert (np.asarray(pl_) == np.asarray(nl)).all()


def test_sell_dp_minibatch_stack_and_step(learnable_graph):
    """Data-parallel sell minibatch: stacked per-device SellTiles shard
    over the mesh and one super-step runs (2 virtual CPU devices)."""
    from gatv2_tpu.parallel.mesh import make_mesh
    from gatv2_tpu.train.minibatch import (
        make_dp_minibatch_step,
        stack_batches,
    )

    g = learnable_graph
    config = _cfg(g)
    tc = TrainConfig(optimizer="adam", lr=0.01, seed=0, impl="sell",
                     batch_size=32, fanouts=(4, 4))
    mesh = make_mesh(2, axis_name="data")
    sampler = NeighborSampler(
        g, batch_size=32, fanouts=(4, 4), seed=0, emit_tiles="sell",
        gather_features=True,
    )
    it = iter(sampler)
    group = [next(it), next(it)]
    params = init_params(config, jax.random.PRNGKey(0))
    opt_state = optim.init_opt_state(params, "adam")
    step = make_dp_minibatch_step(
        config, tc, mesh, tiles_template=group[0].tiles, donate=False
    )
    stacked = stack_batches(group, mesh)
    params, opt_state, loss, acc = step(
        params, opt_state, jnp.asarray(1, jnp.int32), *stacked
    )
    assert np.isfinite(float(loss))

    # seed-weighted metrics: replacing one batch with a zero-seed dummy
    # reproduces the other's single-device loss
    b0 = group[0]
    dummy = dataclasses.replace(
        b0, labels=np.full_like(b0.labels, -1), num_seeds=0
    )
    stacked2 = stack_batches([b0, dummy], mesh)
    _, _, loss2, _ = step(
        init_params(config, jax.random.PRNGKey(0)),
        optim.init_opt_state(params, "adam"),
        jnp.asarray(1, jnp.int32), *stacked2,
    )
    lx, _ = loss_fn(
        init_params(config, jax.random.PRNGKey(0)),
        jnp.asarray(b0.features), jnp.asarray(b0.src), jnp.asarray(b0.dst),
        jnp.asarray(b0.labels), config, impl="sell", edge_tiles=b0.tiles,
        num_valid=b0.num_seeds,
    )
    np.testing.assert_allclose(float(loss2), float(lx), rtol=1e-5)
