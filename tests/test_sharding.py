"""Multi-chip path on the 8-device virtual CPU mesh: the sharded step must
match the single-device step numerically, and train end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gatv2_tpu.config import ModelConfig, TrainConfig
from gatv2_tpu.models.gatv2 import init_params, loss_fn
from gatv2_tpu.parallel.mesh import make_mesh
from gatv2_tpu.parallel.partition import partition_graph
from gatv2_tpu.parallel.sharded import (
    device_put_partitioned,
    make_sharded_eval_step,
    make_sharded_train_step,
)
from gatv2_tpu.train import optim


def _cfg(graph, variant="edge"):
    return ModelConfig(
        num_layers=2,
        heads=(2, 2),
        out_dims=(8, 6),
        num_classes=graph.num_classes,
        in_dim=graph.feature_dim,
        variant=variant,
    )


@pytest.mark.parametrize("balance", ["edges", "nodes"])
def test_partition_covers_all_edges(learnable_graph, balance):
    pg = partition_graph(learnable_graph, 8, balance=balance)
    # every real edge appears exactly once with the right destination
    src = pg.src.reshape(8, -1)
    dst = pg.dst_local.reshape(8, -1)

    def slot_to_global(slot):
        s, off = divmod(int(slot), pg.nodes_per_shard)
        return int(pg.node_bounds[s]) + off

    seen = []
    for s in range(8):
        real = dst[s] < pg.nodes_per_shard
        for e in np.where(real)[0]:
            seen.append(
                (slot_to_global(src[s][e]), dst[s][e] + int(pg.node_bounds[s]))
            )
    want = sorted(zip(learnable_graph.src, learnable_graph.dst))
    assert sorted(seen) == [tuple(map(int, w)) for w in want]
    # node scatter round-trips through slot ids
    vals = np.arange(learnable_graph.num_nodes, dtype=np.int32)
    scat = pg.scatter_nodes(vals, -1)
    assert (scat[pg.slot_of(vals)] == vals).all()


def test_edge_balanced_partition_on_powerlaw():
    """On a power-law graph, equal node blocks leave a >2x edge skew that
    the edge-balanced boundaries flatten to ~1x (VERDICT round-1 item 3)."""
    from gatv2_tpu.data.synthetic import random_graph

    rng = np.random.default_rng(0)
    n = 4096
    # heavy-tailed in-degrees concentrated on low node ids
    deg = np.minimum((rng.pareto(1.0, n) * 4).astype(np.int64), 400)
    deg[: n // 64] += 200  # hub block
    row_ptr = np.zeros(n + 1, np.int64)
    np.cumsum(deg, out=row_ptr[1:])
    col_idx = rng.integers(0, n, int(row_ptr[-1]))
    from gatv2_tpu.data.graph import Graph

    g = Graph(
        features=np.zeros((n, 4), np.float32),
        row_ptr=row_ptr,
        col_idx=col_idx,
        labels=np.zeros(n, np.int32),
    )
    pg_nodes = partition_graph(g, 8, balance="nodes")
    pg_edges = partition_graph(g, 8, balance="edges")

    def ratio(pg):
        c = pg.edge_counts
        return c.max() / max(c.min(), 1)

    assert ratio(pg_nodes) > 2.0  # the skew the old layout suffered
    assert ratio(pg_edges) < 1.2
    # balanced partition wastes far less edge padding
    assert pg_edges.edges_per_shard * 8 < pg_nodes.edges_per_shard * 8 * 0.7


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_loss_matches_single_device(learnable_graph, ndev):
    g = learnable_graph
    config = _cfg(g)
    params = init_params(config, jax.random.PRNGKey(0))

    # single-device reference
    pe = g.padded_edges(128)
    loss_ref, acc_ref = loss_fn(
        params,
        jnp.asarray(g.features),
        jnp.asarray(pe.src),
        jnp.asarray(pe.dst),
        jnp.asarray(g.labels),
        config,
    )

    mesh = make_mesh(ndev)
    pg = partition_graph(g, ndev)
    feats, src, dst_l, labels = device_put_partitioned(pg, mesh)
    eval_step = make_sharded_eval_step(config, mesh, pg.num_real_nodes)
    loss_sh, acc_sh = eval_step(params, feats, src, dst_l, labels)

    assert float(loss_sh) == pytest.approx(float(loss_ref), rel=1e-5)
    assert float(acc_sh) == pytest.approx(float(acc_ref), abs=1e-6)


def test_sharded_grads_match_single_device(learnable_graph):
    g = learnable_graph
    config = _cfg(g)
    params = init_params(config, jax.random.PRNGKey(1))

    pe = g.padded_edges(128)
    grads_ref = jax.grad(
        lambda p: loss_fn(
            p,
            jnp.asarray(g.features),
            jnp.asarray(pe.src),
            jnp.asarray(pe.dst),
            jnp.asarray(g.labels),
            config,
        )[0]
    )(params)

    mesh = make_mesh(4)
    pg = partition_graph(g, 4)
    feats, src, dst_l, labels = device_put_partitioned(pg, mesh)
    from gatv2_tpu.parallel.sharded import make_sharded_loss_fn

    sharded_loss = make_sharded_loss_fn(config, mesh, pg.num_real_nodes)
    grads_sh = jax.grad(
        lambda p: sharded_loss(p, feats, src, dst_l, labels)[0]
    )(params)

    for a, b in zip(jax.tree.leaves(grads_ref), jax.tree.leaves(grads_sh)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
        )


def test_sharded_training_learns(learnable_graph):
    g = learnable_graph
    config = _cfg(g)
    tc = TrainConfig(optimizer="adam", lr=0.01, seed=0)
    mesh = make_mesh(8)
    pg = partition_graph(g, 8)
    feats, src, dst_l, labels = device_put_partitioned(pg, mesh)

    params = init_params(config, jax.random.PRNGKey(0))
    opt_state = optim.init_opt_state(params, "adam")
    step = make_sharded_train_step(config, tc, mesh, pg.num_real_nodes)

    loss0 = None
    for epoch in range(1, 16):
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(epoch, jnp.int32),
            feats, src, dst_l, labels,
        )
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < loss0
    assert float(acc) > 0.5


def test_sharded_multi_epoch_runner_matches_stepwise(learnable_graph):
    """The scaling bench's lax.scan runner (bench.py --mesh) reproduces K
    sequential sharded steps exactly — same params stream, same losses."""
    from gatv2_tpu.parallel.sharded import make_sharded_multi_epoch_runner

    g = learnable_graph
    config = _cfg(g)
    tc = TrainConfig(optimizer="adam", lr=0.01, seed=0)
    mesh = make_mesh(4)
    pg = partition_graph(g, 4)
    feats, src, dst_l, labels = device_put_partitioned(pg, mesh)

    step = make_sharded_train_step(
        config, tc, mesh, pg.num_real_nodes, donate=False
    )
    params = init_params(config, jax.random.PRNGKey(0))
    opt_state = optim.init_opt_state(params, "adam")
    losses_seq = []
    for epoch in range(1, 4):
        params, opt_state, loss, _ = step(
            params, opt_state, jnp.asarray(epoch, jnp.int32),
            feats, src, dst_l, labels,
        )
        losses_seq.append(float(loss))

    runner = make_sharded_multi_epoch_runner(
        config, tc, mesh, pg.num_real_nodes, 3
    )
    params2 = init_params(config, jax.random.PRNGKey(0))
    opt2 = optim.init_opt_state(params2, "adam")
    params2, opt2, losses, accs = runner(
        params2, opt2, jnp.asarray(0, jnp.int32), feats, src, dst_l, labels
    )
    np.testing.assert_allclose(np.asarray(losses), losses_seq, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


@pytest.mark.parametrize("graph_shards,head_shards", [(4, 2), (2, 4), (1, 8)])
def test_head_tp_matches_single_device(learnable_graph, graph_shards, head_shards):
    """2-D ('graph', 'head') mesh: head tensor parallelism reproduces the
    single-device loss/grads. Layer head counts (2, 2): sharded when
    divisible by head_shards, else computed replicated."""
    from gatv2_tpu.parallel.sharded import (
        device_put_params,
        make_sharded_loss_fn,
    )

    g = learnable_graph
    config = _cfg(g)
    params = init_params(config, jax.random.PRNGKey(2))
    pe = g.padded_edges(128)
    loss_ref, acc_ref = loss_fn(
        params,
        jnp.asarray(g.features),
        jnp.asarray(pe.src),
        jnp.asarray(pe.dst),
        jnp.asarray(g.labels),
        config,
    )
    grads_ref = jax.grad(
        lambda p: loss_fn(
            p,
            jnp.asarray(g.features),
            jnp.asarray(pe.src),
            jnp.asarray(pe.dst),
            jnp.asarray(g.labels),
            config,
        )[0]
    )(params)

    mesh = make_mesh(graph_shards * head_shards, head_shards=head_shards)
    pg = partition_graph(g, graph_shards)
    feats, src, dst_l, labels = device_put_partitioned(pg, mesh)
    params_sh = device_put_params(params, config, mesh)
    sharded_loss = make_sharded_loss_fn(config, mesh, pg.num_real_nodes)
    loss_sh, acc_sh = jax.jit(sharded_loss)(params_sh, feats, src, dst_l, labels)
    assert float(loss_sh) == pytest.approx(float(loss_ref), rel=1e-5)
    assert float(acc_sh) == pytest.approx(float(acc_ref), abs=1e-6)

    grads_sh = jax.jit(
        jax.grad(lambda p: sharded_loss(p, feats, src, dst_l, labels)[0])
    )(params_sh)
    for a, b in zip(jax.tree.leaves(grads_ref), jax.tree.leaves(grads_sh)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
        )


def test_head_tp_training_learns(learnable_graph):
    from gatv2_tpu.parallel.sharded import device_put_params

    g = learnable_graph
    config = _cfg(g)
    tc = TrainConfig(optimizer="adam", lr=0.01, seed=0)
    mesh = make_mesh(8, head_shards=2)
    pg = partition_graph(g, 4)
    feats, src, dst_l, labels = device_put_partitioned(pg, mesh)
    params = device_put_params(init_params(config, jax.random.PRNGKey(0)), config, mesh)
    opt_state = optim.init_opt_state(params, "adam")
    step = make_sharded_train_step(config, tc, mesh, pg.num_real_nodes)
    loss0 = None
    for epoch in range(1, 16):
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(epoch, jnp.int32),
            feats, src, dst_l, labels,
        )
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < loss0
    assert float(acc) > 0.5


@pytest.mark.parametrize("graph_shards,head_shards", [(4, 1), (2, 2)])
def test_sharded_pallas_matches_single_device(learnable_graph, graph_shards, head_shards):
    """Fused bipartite Pallas kernels inside shard_map (interpret mode on
    the CPU mesh) reproduce the single-device loss and gradients."""
    from gatv2_tpu.parallel.partition import prepare_partitioned_tiles
    from gatv2_tpu.parallel.sharded import (
        device_put_params,
        make_sharded_loss_fn,
    )

    g = learnable_graph
    config = _cfg(g)
    params = init_params(config, jax.random.PRNGKey(3))
    pe = g.padded_edges(128)
    loss_ref, acc_ref = loss_fn(
        params,
        jnp.asarray(g.features),
        jnp.asarray(pe.src),
        jnp.asarray(pe.dst),
        jnp.asarray(g.labels),
        config,
    )
    grads_ref = jax.grad(
        lambda p: loss_fn(
            p,
            jnp.asarray(g.features),
            jnp.asarray(pe.src),
            jnp.asarray(pe.dst),
            jnp.asarray(g.labels),
            config,
        )[0]
    )(params)

    mesh = make_mesh(graph_shards * head_shards, head_shards=head_shards)
    pg = partition_graph(g, graph_shards)
    tiles = prepare_partitioned_tiles(pg)
    feats, src, dst_l, labels = device_put_partitioned(pg, mesh)
    params_sh = device_put_params(params, config, mesh)
    sharded_loss = make_sharded_loss_fn(
        config, mesh, pg.num_real_nodes, impl="pallas", edge_tiles=tiles,
        interpret=True,
    )
    loss_sh, acc_sh = jax.jit(sharded_loss)(params_sh, feats, src, dst_l, labels)
    assert float(loss_sh) == pytest.approx(float(loss_ref), rel=1e-5)
    assert float(acc_sh) == pytest.approx(float(acc_ref), abs=1e-6)

    grads_sh = jax.jit(
        jax.grad(lambda p: sharded_loss(p, feats, src, dst_l, labels)[0])
    )(params_sh)
    for a, b in zip(jax.tree.leaves(grads_ref), jax.tree.leaves(grads_sh)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=2e-6
        )


@pytest.mark.parametrize("graph_shards,head_shards", [(4, 1), (2, 2)])
def test_sharded_sell_matches_single_device(
    learnable_graph, graph_shards, head_shards
):
    """SELL kernels inside shard_map (bipartite per-shard layouts, fixed
    column counts) reproduce the single-device loss and gradients."""
    from gatv2_tpu.parallel.partition import prepare_partitioned_sell_tiles
    from gatv2_tpu.parallel.sharded import (
        device_put_params,
        make_sharded_loss_fn,
    )

    g = learnable_graph
    config = _cfg(g)
    params = init_params(config, jax.random.PRNGKey(3))
    pe = g.padded_edges(128)
    loss_ref, acc_ref = loss_fn(
        params,
        jnp.asarray(g.features),
        jnp.asarray(pe.src),
        jnp.asarray(pe.dst),
        jnp.asarray(g.labels),
        config,
    )
    grads_ref = jax.grad(
        lambda p: loss_fn(
            p,
            jnp.asarray(g.features),
            jnp.asarray(pe.src),
            jnp.asarray(pe.dst),
            jnp.asarray(g.labels),
            config,
        )[0]
    )(params)

    mesh = make_mesh(graph_shards * head_shards, head_shards=head_shards)
    pg = partition_graph(g, graph_shards)
    from gatv2_tpu.parallel.partition import halo_exchange_plan

    plan = halo_exchange_plan(pg) if graph_shards > 1 else None
    if plan is not None and plan.halo_size >= pg.padded_num_nodes:
        plan = None
    tiles = prepare_partitioned_sell_tiles(pg, halo_plan=plan)
    feats, src, dst_l, labels = device_put_partitioned(pg, mesh)
    params_sh = device_put_params(params, config, mesh)
    sharded_loss = make_sharded_loss_fn(
        config, mesh, pg.num_real_nodes, impl="sell", edge_tiles=tiles,
        halo_plan=plan, interpret=True,
    )
    loss_sh, acc_sh = jax.jit(sharded_loss)(
        params_sh, feats, src, dst_l, labels
    )
    assert float(loss_sh) == pytest.approx(float(loss_ref), rel=1e-5)
    assert float(acc_sh) == pytest.approx(float(acc_ref), abs=1e-6)

    grads_sh = jax.jit(
        jax.grad(lambda p: sharded_loss(p, feats, src, dst_l, labels)[0])
    )(params_sh)
    for a, b in zip(jax.tree.leaves(grads_ref), jax.tree.leaves(grads_sh)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=2e-6
        )


def test_sharded_trainer_console_and_learning(learnable_graph, capsys):
    """The --mesh CLI path: ShardedTrainer trains and keeps the reference's
    console contract."""
    from gatv2_tpu.parallel.sharded import ShardedTrainer

    g = learnable_graph
    config = _cfg(g)
    tc = TrainConfig(optimizer="adam", lr=0.02, seed=0, epochs=0)
    logs = []
    trainer = ShardedTrainer(g, config, tc, 8, log_fn=logs.append)
    last = trainer.run(10)
    assert last["epoch"] == 10
    loss_lines = [l for l in logs if l.startswith("Avg Loss")]
    first_loss = float(loss_lines[0].split("Avg Loss: ")[1].split(",")[0])
    assert last["loss"] < first_loss
    assert any(l.startswith("Epoch ") for l in logs)
    assert "total time" in loss_lines[0]


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_halo_exchange_matches_all_gather(learnable_graph, impl):
    """Boundary-only all_to_all halo exchange reproduces the dense
    all_gather path exactly (loss and grads), for both impls."""
    from gatv2_tpu.parallel.partition import (
        halo_exchange_plan,
        prepare_partitioned_tiles,
    )
    from gatv2_tpu.parallel.sharded import make_sharded_loss_fn

    g = learnable_graph
    config = _cfg(g)
    params = init_params(config, jax.random.PRNGKey(5))
    mesh = make_mesh(4)
    pg = partition_graph(g, 4)
    plan = halo_exchange_plan(pg)
    feats, src, dst_l, labels = device_put_partitioned(pg, mesh)

    def build(halo, tiles):
        return make_sharded_loss_fn(
            config, mesh, pg.num_real_nodes, impl=impl, edge_tiles=tiles,
            interpret=True, halo_plan=halo,
        )

    if impl == "pallas":
        dense = build(None, prepare_partitioned_tiles(pg))
        halo = build(plan, prepare_partitioned_tiles(pg, halo_plan=plan))
    else:
        dense = build(None, None)
        halo = build(plan, None)

    l0, a0 = jax.jit(dense)(params, feats, src, dst_l, labels)
    l1, a1 = jax.jit(halo)(params, feats, src, dst_l, labels)
    assert float(l1) == pytest.approx(float(l0), rel=1e-6)
    assert float(a1) == pytest.approx(float(a0), abs=1e-6)

    g0 = jax.jit(jax.grad(lambda p: dense(p, feats, src, dst_l, labels)[0]))(params)
    g1 = jax.jit(jax.grad(lambda p: halo(p, feats, src, dst_l, labels)[0]))(params)
    for a_, b_ in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=1e-5, atol=1e-7
        )


def test_sharded_split_eval_matches_single_device(learnable_graph):
    """make_sharded_split_eval_step reproduces the single-device split
    accuracies from the same params (mesh + --split-* CLI path)."""
    from gatv2_tpu.data.splits import random_splits
    from gatv2_tpu.parallel.sharded import (
        device_put_partitioned,
        make_sharded_split_eval_step,
    )
    from gatv2_tpu.train.loop import make_split_eval_step
    from gatv2_tpu.config import TrainConfig

    g = learnable_graph
    config = _cfg(g)
    params = init_params(config, jax.random.PRNGKey(7))
    sp = random_splits(g.num_nodes, (0.6, 0.2, 0.2), seed=3)

    pe = g.padded_edges(128)
    single_eval = make_split_eval_step(config, TrainConfig())
    accs_ref = single_eval(
        params, jnp.asarray(g.features), jnp.asarray(pe.src),
        jnp.asarray(pe.dst), jnp.asarray(g.labels),
        *(jnp.asarray(m) for m in (sp.train, sp.val, sp.test)),
    )

    mesh = make_mesh(4)
    pg = partition_graph(g, 4)
    feats, src, dst_l, _ = device_put_partitioned(pg, mesh)
    eval_step = make_sharded_split_eval_step(config, mesh)
    accs_sh = eval_step(
        params, feats, src, dst_l,
        jnp.asarray(pg.scatter_nodes(g.labels, -1)),
        *(jnp.asarray(pg.scatter_nodes(m, False)) for m in (sp.train, sp.val, sp.test)),
    )
    for a, b in zip(accs_ref, accs_sh):
        assert float(a) == pytest.approx(float(b), abs=1e-6)


def test_sharded_trainer_split_training_and_eval(learnable_graph):
    """ShardedTrainer with splits: loss is masked to train nodes, per-epoch
    split accuracies are reported, and evaluate() works."""
    from gatv2_tpu.data.splits import random_splits
    from gatv2_tpu.parallel.sharded import ShardedTrainer

    g = learnable_graph
    config = _cfg(g)
    tc = TrainConfig(optimizer="adam", lr=0.02, seed=0, epochs=0)
    sp = random_splits(g.num_nodes, (0.6, 0.2, 0.2), seed=0)
    logs = []
    trainer = ShardedTrainer(g, config, tc, 8, log_fn=logs.append, splits=sp)
    last = trainer.run(8)
    assert "test_accuracy" in last
    assert any(l.startswith("Train/Val/Test Accuracy") for l in logs)
    accs = trainer.evaluate()
    assert set(accs) == {"train", "val", "test"}
    # trained on 60% of nodes: train accuracy should move off chance
    assert accs["train"] > 0.3


def test_sharded_resume_preserves_sharding(learnable_graph, tmp_path):
    """Checkpoint resume into a ShardedTrainer re-places every leaf with its
    NamedSharding (round-1 dropped placements on restore)."""
    from jax.sharding import NamedSharding
    from gatv2_tpu.parallel.sharded import ShardedTrainer
    from gatv2_tpu.train import checkpoint as ckpt

    g = learnable_graph
    config = _cfg(g)
    tc = TrainConfig(optimizer="adam", lr=0.02, seed=0, epochs=0)
    t1 = ShardedTrainer(g, config, tc, 8, log_fn=lambda s: None)
    t1.run(2)
    ckpt.save(str(tmp_path), t1.params, t1.opt_state, t1.epoch)

    t2 = ShardedTrainer(g, config, tc, 8, log_fn=lambda s: None)
    want_shardings = jax.tree.map(lambda x: x.sharding, t2.params)
    assert ckpt.restore_into(str(tmp_path), t2)
    assert t2.epoch == 2
    for leaf, want in zip(
        jax.tree.leaves(t2.params), jax.tree.leaves(want_shardings)
    ):
        assert isinstance(leaf.sharding, NamedSharding)
        assert leaf.sharding == want
    # restored values match the saved ones
    for a, b in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and training continues from the restored state
    t2.run(1)
    assert t2.epoch == 3


def test_overlap_two_pass_matches_single_pass(learnable_graph):
    """The halo/compute-overlap layer (local-src + halo-src passes with an
    online-softmax stat merge) reproduces the single-pass halo layer's loss
    and gradients (VERDICT round-1 item 6)."""
    from gatv2_tpu.parallel.partition import (
        halo_exchange_plan,
        overlap_split_plan,
    )
    from gatv2_tpu.parallel.sharded import make_sharded_loss_fn

    g = learnable_graph
    config = _cfg(g)
    params = init_params(config, jax.random.PRNGKey(8))
    mesh = make_mesh(4)
    pg = partition_graph(g, 4)
    plan = halo_exchange_plan(pg)
    ov = overlap_split_plan(pg, plan)
    # the split covers every real edge exactly once
    n_local = int((ov.local_dst < pg.nodes_per_shard).sum())
    n_halo = int((ov.halo_dst < pg.nodes_per_shard).sum())
    assert n_local + n_halo == g.num_edges

    feats, src, dst_l, labels = device_put_partitioned(pg, mesh)
    single = make_sharded_loss_fn(
        config, mesh, pg.num_real_nodes, halo_plan=plan
    )
    twopass = make_sharded_loss_fn(
        config, mesh, pg.num_real_nodes, halo_plan=plan, overlap_split=ov
    )
    l0, a0 = jax.jit(single)(params, feats, src, dst_l, labels)
    l1, a1 = jax.jit(twopass)(params, feats, src, dst_l, labels)
    assert float(l1) == pytest.approx(float(l0), rel=1e-5)
    assert float(a1) == pytest.approx(float(a0), abs=1e-6)

    g0 = jax.jit(jax.grad(lambda p: single(p, feats, src, dst_l, labels)[0]))(params)
    g1 = jax.jit(jax.grad(lambda p: twopass(p, feats, src, dst_l, labels)[0]))(params)
    for a_, b_ in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=1e-4, atol=1e-6
        )


def test_overlap_trainer_cli_path(learnable_graph):
    from gatv2_tpu.data.splits import random_splits
    from gatv2_tpu.parallel.sharded import ShardedTrainer

    g = learnable_graph
    config = _cfg(g)
    tc = TrainConfig(optimizer="adam", lr=0.02, seed=0, epochs=0)
    sp = random_splits(g.num_nodes, (0.6, 0.2, 0.2), seed=0)
    logs = []
    tr = ShardedTrainer(
        g, config, tc, 8, log_fn=logs.append, splits=sp, overlap=True
    )
    last = tr.run(6)
    assert any(l.startswith("Overlap: two-pass") for l in logs)
    loss_lines = [l for l in logs if l.startswith("Avg Loss")]
    first_loss = float(loss_lines[0].split("Avg Loss: ")[1].split(",")[0])
    assert last["loss"] < first_loss


def test_pallas_overlap_matches_single_pass(learnable_graph):
    """Pallas two-pass merged-softmax overlap layer == the single-pass
    pallas halo layer == the single-device XLA oracle (loss + grads)."""
    from gatv2_tpu.parallel.partition import (
        halo_exchange_plan,
        overlap_split_plan,
        prepare_overlap_tiles,
        prepare_partitioned_tiles,
    )
    from gatv2_tpu.parallel.sharded import make_sharded_loss_fn

    g = learnable_graph
    config = _cfg(g)
    params = init_params(config, jax.random.PRNGKey(9))
    mesh = make_mesh(4)
    pg = partition_graph(g, 4)
    plan = halo_exchange_plan(pg)
    split = overlap_split_plan(pg, plan)
    ov_tiles = prepare_overlap_tiles(pg, plan, split)
    feats, src, dst_l, labels = device_put_partitioned(pg, mesh)

    single = make_sharded_loss_fn(
        config, mesh, pg.num_real_nodes, impl="pallas",
        edge_tiles=prepare_partitioned_tiles(pg, halo_plan=plan),
        halo_plan=plan, interpret=True,
    )
    twopass = make_sharded_loss_fn(
        config, mesh, pg.num_real_nodes, impl="pallas",
        halo_plan=plan, overlap_tiles=ov_tiles, interpret=True,
    )
    l0, a0 = jax.jit(single)(params, feats, src, dst_l, labels)
    l1, a1 = jax.jit(twopass)(params, feats, src, dst_l, labels)
    assert float(l1) == pytest.approx(float(l0), rel=1e-5)
    assert float(a1) == pytest.approx(float(a0), abs=1e-6)

    g0 = jax.jit(jax.grad(lambda p: single(p, feats, src, dst_l, labels)[0]))(params)
    g1 = jax.jit(jax.grad(lambda p: twopass(p, feats, src, dst_l, labels)[0]))(params)
    for a_, b_ in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=1e-4, atol=1e-6
        )


def test_sharded_sell_powerlaw_matches_single_device():
    """Partitioned SELL on a hub-heavy (Zipf) graph: the per-shard layouts
    engage forced-uniform virtual-row splitting (fixed cols/tiles across
    shards) and still match the single-device loss and gradients."""
    from gatv2_tpu.data.synthetic import powerlaw_graph
    from gatv2_tpu.parallel.partition import prepare_partitioned_sell_tiles
    from gatv2_tpu.parallel.sharded import (
        device_put_params,
        make_sharded_loss_fn,
    )

    g = powerlaw_graph(600, 9000, 16, 4, seed=12, alpha=1.2)
    assert np.diff(g.row_ptr).max() > 256  # hubs must exceed the cap
    config = _cfg(g)
    params = init_params(config, jax.random.PRNGKey(5))
    pe = g.padded_edges(128)
    loss_ref, _ = loss_fn(
        params, jnp.asarray(g.features), jnp.asarray(pe.src),
        jnp.asarray(pe.dst), jnp.asarray(g.labels), config,
    )
    grads_ref = jax.grad(
        lambda p: loss_fn(
            p, jnp.asarray(g.features), jnp.asarray(pe.src),
            jnp.asarray(pe.dst), jnp.asarray(g.labels), config,
        )[0]
    )(params)

    mesh = make_mesh(4)
    pg = partition_graph(g, 4)
    tiles = prepare_partitioned_sell_tiles(pg)
    assert tiles.dst.split or tiles.srcs.split
    feats, src, dst_l, labels = device_put_partitioned(pg, mesh)
    params_sh = device_put_params(params, config, mesh)
    sharded_loss = make_sharded_loss_fn(
        config, mesh, pg.num_real_nodes, impl="sell", edge_tiles=tiles,
        interpret=True,
    )
    loss_sh, _ = jax.jit(sharded_loss)(params_sh, feats, src, dst_l, labels)
    assert float(loss_sh) == pytest.approx(float(loss_ref), rel=1e-5)
    grads_sh = jax.jit(
        jax.grad(lambda p: sharded_loss(p, feats, src, dst_l, labels)[0])
    )(params_sh)
    for a, b in zip(jax.tree.leaves(grads_ref), jax.tree.leaves(grads_sh)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_sell_overlap_matches_single_pass(learnable_graph):
    """SELL two-pass merged-softmax overlap layer == the single-pass SELL
    halo layer (loss + grads)."""
    from gatv2_tpu.parallel.partition import (
        halo_exchange_plan,
        overlap_split_plan,
        prepare_overlap_sell_tiles,
        prepare_partitioned_sell_tiles,
    )
    from gatv2_tpu.parallel.sharded import make_sharded_loss_fn

    g = learnable_graph
    config = _cfg(g)
    params = init_params(config, jax.random.PRNGKey(9))
    mesh = make_mesh(4)
    pg = partition_graph(g, 4)
    plan = halo_exchange_plan(pg)
    split = overlap_split_plan(pg, plan)
    ov_tiles = prepare_overlap_sell_tiles(pg, plan, split)
    feats, src, dst_l, labels = device_put_partitioned(pg, mesh)

    single = make_sharded_loss_fn(
        config, mesh, pg.num_real_nodes, impl="sell",
        edge_tiles=prepare_partitioned_sell_tiles(pg, halo_plan=plan),
        halo_plan=plan, interpret=True,
    )
    twopass = make_sharded_loss_fn(
        config, mesh, pg.num_real_nodes, impl="sell",
        halo_plan=plan, overlap_tiles=ov_tiles, interpret=True,
    )
    l0, a0 = jax.jit(single)(params, feats, src, dst_l, labels)
    l1, a1 = jax.jit(twopass)(params, feats, src, dst_l, labels)
    assert float(l1) == pytest.approx(float(l0), rel=1e-5)
    assert float(a1) == pytest.approx(float(a0), abs=1e-6)

    g0 = jax.jit(
        jax.grad(lambda p: single(p, feats, src, dst_l, labels)[0])
    )(params)
    g1 = jax.jit(
        jax.grad(lambda p: twopass(p, feats, src, dst_l, labels)[0])
    )(params)
    for a_, b_ in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=1e-4, atol=1e-6
        )


def test_pallas_overlap_trainer(learnable_graph):
    """--mesh --impl pallas --overlap end-to-end: trains and reports."""
    from gatv2_tpu.parallel.sharded import ShardedTrainer

    g = learnable_graph
    config = _cfg(g)
    tc = TrainConfig(optimizer="adam", lr=0.02, seed=0, epochs=0, impl="pallas")
    logs = []
    tr = ShardedTrainer(g, config, tc, 4, log_fn=logs.append, overlap=True)
    assert tr.overlap_tiles is not None
    last = tr.run(6)
    assert any(l.startswith("Overlap: two-pass") for l in logs)
    loss_lines = [l for l in logs if l.startswith("Avg Loss")]
    first_loss = float(loss_lines[0].split("Avg Loss: ")[1].split(",")[0])
    assert last["loss"] < first_loss


def test_edge_balance_caps_node_skew():
    """On a degree-sorted graph (all edges on the first nodes), edge
    balancing must not let one shard own ~all nodes: block sizes are capped
    at 2x the even share so padded node memory stays bounded (round-2
    review finding)."""
    from gatv2_tpu.data.graph import Graph

    rng = np.random.default_rng(1)
    n, s_count = 4096, 8
    deg = np.zeros(n, np.int64)
    deg[: n // 32] = 300  # every edge lands on the first 3% of nodes
    row_ptr = np.zeros(n + 1, np.int64)
    np.cumsum(deg, out=row_ptr[1:])
    g = Graph(
        features=np.zeros((n, 4), np.float32),
        row_ptr=row_ptr,
        col_idx=rng.integers(0, n, int(row_ptr[-1])),
        labels=np.zeros(n, np.int32),
    )
    pg = partition_graph(g, s_count, balance="edges")
    even = -(-n // s_count)
    assert pg.nodes_per_shard <= 2 * even + 8  # cap (+node_multiple round)
    # and every edge is still covered exactly once
    real = pg.dst_local.reshape(s_count, -1) < pg.nodes_per_shard
    assert int(real.sum()) == g.num_edges


def test_halo_plan_excludes_diagonal_on_community_graph():
    """Own-shard rows must never be exchanged: on a high-locality
    community partition the halo volume tracks the CROSS-shard cut (a few
    % of all_gather), instead of being inflated by the dense diagonal
    block to the point of disabling the plan (round-2 review finding)."""
    from gatv2_tpu.data.graph import Graph
    from gatv2_tpu.parallel.partition import halo_exchange_plan

    rng = np.random.default_rng(0)
    n, s_count = 4096, 8
    per = n // s_count
    dst = np.repeat(np.arange(n), 8)
    src = np.where(
        rng.random(dst.size) < 0.95,
        (dst // per) * per + rng.integers(0, per, dst.size),
        rng.integers(0, n, dst.size),
    ).astype(np.int64)
    order = np.argsort(dst, kind="stable")
    src, dst_s = src[order], dst[order]
    rp = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(dst_s, minlength=n), out=rp[1:])
    g = Graph(features=np.zeros((n, 4), np.float32), row_ptr=rp,
              col_idx=src, labels=np.zeros(n, np.int32))
    pg = partition_graph(g, s_count, balance="nodes")
    plan = halo_exchange_plan(pg)
    assert plan.halo_size < 0.2 * pg.padded_num_nodes
    # local srcs index zs_loc rows (< nps); remote srcs the halo table
    real = pg.dst_local.reshape(s_count, -1) < pg.nodes_per_shard
    src_slots = pg.src.reshape(s_count, -1)
    for j in range(s_count):
        own = (src_slots[j] // pg.nodes_per_shard) == j
        sel = real[j]
        halo = plan.src_halo[j][sel]
        assert (halo[own[sel]] < pg.nodes_per_shard).all()
        assert (halo[~own[sel]] >= pg.nodes_per_shard).all()


def test_mesh1_chunked_tiles_match_single_device(learnable_graph):
    """A 1-shard mesh with CHUNKED edge layouts (the bench --mesh 1 path at
    products-sub scale, where the unchunked streamed-operand live set
    [E, 2*hd + 128] overflows one chip's HBM) reproduces the single-device
    losses for both fused impls. Chunking is forced (num_chunks=3) so the
    grouped code paths run even on this small graph; SELL chunked sharding
    is 1-shard-only (fixed-mode stacking excludes grouped arrays) and must
    reject a multi-shard request loudly."""
    from gatv2_tpu.models.gatv2 import init_params_for_variant
    from gatv2_tpu.parallel.partition import (
        prepare_partitioned_sell_tiles,
        prepare_partitioned_tiles,
    )
    from gatv2_tpu.parallel.sharded import (
        device_put_params,
        make_sharded_multi_epoch_runner,
    )

    g = learnable_graph
    config = _cfg(g)
    mesh = make_mesh(1)
    pg = partition_graph(g, 1)
    feats, src, dst_l, labels = device_put_partitioned(pg, mesh)

    def run(impl, tiles):
        tc = TrainConfig(optimizer="adam", lr=0.01, seed=0, impl=impl)
        runner = make_sharded_multi_epoch_runner(
            config, tc, mesh, pg.num_real_nodes, 3,
            edge_tiles=tiles, halo_plan=None, interpret=True,
        )
        params = device_put_params(
            init_params_for_variant(config, jax.random.PRNGKey(0)),
            config, mesh,
        )
        opt_state = optim.init_opt_state(params, "adam")
        _, _, losses, _ = runner(
            params, opt_state, jnp.asarray(0, jnp.int32),
            feats, src, dst_l, labels,
        )
        return np.asarray(losses)

    losses_ref = run("xla", None)
    tiles_p = prepare_partitioned_tiles(pg, tile_e=128, num_chunks=3)
    np.testing.assert_allclose(
        run("pallas", tiles_p), losses_ref, rtol=2e-5, atol=2e-6
    )
    tiles_s = prepare_partitioned_sell_tiles(pg, num_chunks=3)
    assert tiles_s.num_chunks == 3
    np.testing.assert_allclose(
        run("sell", tiles_s), losses_ref, rtol=2e-5, atol=2e-6
    )


def test_mesh2_chunked_sell_tiles_match_single_device(learnable_graph):
    """MULTI-shard CHUNKED SELL stacking (new in round 4: fixed mode now
    composes with num_chunks > 1, closing the round-3 gap where S > 1
    meshes raised): a 2-shard mesh with num_chunks=2 must reproduce the
    unsharded losses."""
    from gatv2_tpu.models.gatv2 import init_params_for_variant
    from gatv2_tpu.parallel.partition import prepare_partitioned_sell_tiles
    from gatv2_tpu.parallel.sharded import (
        device_put_params,
        make_sharded_multi_epoch_runner,
    )

    g = learnable_graph
    config = _cfg(g)

    def run(mesh, pg, impl, tiles):
        feats, src, dst_l, labels = device_put_partitioned(pg, mesh)
        tc = TrainConfig(optimizer="adam", lr=0.01, seed=0, impl=impl)
        runner = make_sharded_multi_epoch_runner(
            config, tc, mesh, pg.num_real_nodes, 3,
            edge_tiles=tiles, halo_plan=None, interpret=True,
        )
        params = device_put_params(
            init_params_for_variant(config, jax.random.PRNGKey(0)),
            config, mesh,
        )
        opt_state = optim.init_opt_state(params, "adam")
        _, _, losses, _ = runner(
            params, opt_state, jnp.asarray(0, jnp.int32),
            feats, src, dst_l, labels,
        )
        return np.asarray(losses)

    losses_ref = run(make_mesh(1), partition_graph(g, 1), "xla", None)
    mesh2, pg2 = make_mesh(2), partition_graph(g, 2)
    tiles2 = prepare_partitioned_sell_tiles(pg2, num_chunks=2)
    assert tiles2.num_chunks == 2
    # stacked grouped arrays: uniform shapes, per-shard chunk grids
    assert np.asarray(tiles2.dst.ids_grp).shape[:2] == (2, 2)
    np.testing.assert_allclose(
        run(mesh2, pg2, "sell", tiles2), losses_ref, rtol=2e-5, atol=2e-6
    )

def test_mesh2_chunked_pallas_tiles_match_single_device(learnable_graph):
    """MULTI-shard chunked pallas stacking (bench --mesh N now auto-chunks
    per-shard edge sets at products scale for every mesh size): a 2-shard
    mesh with num_chunks=3 must reproduce the unsharded losses, and the
    regions _stack_tiles ADDS when padding shards' grouped arrays to the
    cross-shard max must carry the pad sentinel (matches no row of the
    chunk grid), not 0 — a 0 would alias chunk row 0 if a kernel change
    ever streamed past rel_offsets (round-3 advisor finding)."""
    from gatv2_tpu.models.gatv2 import init_params_for_variant
    from gatv2_tpu.ops.pallas_attention import TILE_N
    from gatv2_tpu.parallel.partition import prepare_partitioned_tiles
    from gatv2_tpu.parallel.sharded import (
        device_put_params,
        make_sharded_multi_epoch_runner,
    )

    from gatv2_tpu.data.synthetic import random_graph

    # big enough that each of 2 shards still has >= 3 node tiles (the
    # requested chunk count clamps to the per-shard tile count)
    g = random_graph(1024, 6000, 12, 4, seed=5)
    config = _cfg(g)

    def run(mesh, pg, impl, tiles):
        feats, src, dst_l, labels = device_put_partitioned(pg, mesh)
        tc = TrainConfig(optimizer="adam", lr=0.01, seed=0, impl=impl)
        runner = make_sharded_multi_epoch_runner(
            config, tc, mesh, pg.num_real_nodes, 3,
            edge_tiles=tiles, halo_plan=None, interpret=True,
        )
        params = device_put_params(
            init_params_for_variant(config, jax.random.PRNGKey(0)),
            config, mesh,
        )
        opt_state = optim.init_opt_state(params, "adam")
        _, _, losses, _ = runner(
            params, opt_state, jnp.asarray(0, jnp.int32),
            feats, src, dst_l, labels,
        )
        return np.asarray(losses)

    mesh1, pg1 = make_mesh(1), partition_graph(g, 1)
    losses_ref = run(mesh1, pg1, "xla", None)

    mesh2, pg2 = make_mesh(2), partition_graph(g, 2)
    tiles2 = prepare_partitioned_tiles(pg2, tile_e=128, num_chunks=3)
    assert tiles2.num_chunks == 3
    np.testing.assert_allclose(
        run(mesh2, pg2, "pallas", tiles2), losses_ref, rtol=2e-5, atol=2e-6
    )

    # pad-sentinel hardening: any slot of the stacked ids_grp beyond a
    # shard's own column count must be the side's pad id, never 0
    ids = np.asarray(tiles2.dst_side.ids_grp)  # [S, G, cols]
    pad_id = tiles2.tiles_per_chunk * TILE_N
    rel = np.asarray(tiles2.dst_side.rel_offsets)  # [S, G, tpc+1]
    te = tiles2.tile_e
    for s in range(ids.shape[0]):
        for ch in range(ids.shape[1]):
            used = int(rel[s, ch, -1]) * te
            tail = ids[s, ch, used:]
            assert tail.size == 0 or (tail == pad_id).all()


def test_sharded_sell_bf16_streams_matches_single_device(learnable_graph):
    """config.streams='bf16' flows through the sharded (non-overlap) SELL
    path: the 4-shard loss/grads match the single-device SELL run with the
    same tier (both compute f32 on the same bf16-rounded projections)."""
    import dataclasses

    from gatv2_tpu.ops.sell_attention import setup_full_graph_sell
    from gatv2_tpu.parallel.partition import (
        halo_exchange_plan,
        prepare_partitioned_sell_tiles,
    )
    from gatv2_tpu.parallel.sharded import (
        device_put_params,
        make_sharded_loss_fn,
    )

    g = learnable_graph
    config = dataclasses.replace(_cfg(g), streams="bf16")
    params = init_params(config, jax.random.PRNGKey(3))

    st, feats_np, labels_np, num_valid = setup_full_graph_sell(g)
    ref = jax.value_and_grad(
        lambda p: loss_fn(
            p, jnp.asarray(feats_np), jnp.zeros(1, jnp.int32),
            jnp.zeros(1, jnp.int32), jnp.asarray(labels_np), config,
            impl="sell", edge_tiles=st, num_valid=num_valid,
        )[0]
    )(params)

    mesh = make_mesh(4)
    pg = partition_graph(g, 4)
    plan = halo_exchange_plan(pg)
    if plan is not None and plan.halo_size >= pg.padded_num_nodes:
        plan = None
    tiles = prepare_partitioned_sell_tiles(pg, halo_plan=plan)
    feats, src, dst_l, labels = device_put_partitioned(pg, mesh)
    params_sh = device_put_params(params, config, mesh)
    sharded_loss = make_sharded_loss_fn(
        config, mesh, pg.num_real_nodes, impl="sell", edge_tiles=tiles,
        halo_plan=plan, interpret=True,
    )
    loss_sh, grads_sh = jax.jit(jax.value_and_grad(
        lambda p: sharded_loss(p, feats, src, dst_l, labels)[0]
    ))(params_sh)
    assert float(loss_sh) == pytest.approx(float(ref[0]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(ref[1]), jax.tree.leaves(grads_sh)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=2e-6
        )
