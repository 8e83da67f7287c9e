"""End-to-end training: loss decreases, accuracy rises on a learnable graph,
optimizers and clipping behave per the reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gatv2_tpu.config import ModelConfig, TrainConfig
from gatv2_tpu.models.gatv2 import init_params
from gatv2_tpu.train import optim
from gatv2_tpu.train.loop import Trainer


def _mk(graph, variant="edge"):
    return ModelConfig(
        num_layers=2,
        heads=(4, 1),
        out_dims=(16, 8),
        num_classes=graph.num_classes,
        in_dim=graph.feature_dim,
        variant=variant,
    )


def test_adam_training_learns(learnable_graph):
    tc = TrainConfig(epochs=30, optimizer="adam", lr=0.01, seed=0)
    t = Trainer(learnable_graph, _mk(learnable_graph), tc, log_fn=lambda s: None)
    result = t.run()
    assert result["loss"] < 0.5
    assert result["accuracy"] > 0.8


def test_sgd_training_decreases_loss(learnable_graph):
    tc = TrainConfig(epochs=10, optimizer="sgd", lr=0.05, seed=0)
    t = Trainer(learnable_graph, _mk(learnable_graph), tc, log_fn=lambda s: None)
    hist = [t.run(1)["loss"] for _ in range(10)]
    assert hist[-1] < hist[0]


def test_clip_enabled_trains(learnable_graph):
    tc = TrainConfig(epochs=5, optimizer="adam", lr=0.01, clip=True, seed=0)
    t = Trainer(learnable_graph, _mk(learnable_graph), tc, log_fn=lambda s: None)
    result = t.run()
    assert np.isfinite(result["loss"])


def test_node_variant_trains(learnable_graph):
    tc = TrainConfig(epochs=10, optimizer="adam", lr=0.01, seed=0)
    t = Trainer(
        learnable_graph, _mk(learnable_graph, "node"), tc, log_fn=lambda s: None
    )
    assert t.run()["loss"] < 1.2


def test_determinism_same_seed(learnable_graph):
    """Unlike the reference (atomicAdd + time(NULL) seed, README.md:158),
    training is bitwise deterministic for a fixed seed."""
    tc = TrainConfig(epochs=3, optimizer="adam", lr=0.01, seed=42)
    r1 = Trainer(learnable_graph, _mk(learnable_graph), tc, log_fn=lambda s: None).run()
    r2 = Trainer(learnable_graph, _mk(learnable_graph), tc, log_fn=lambda s: None).run()
    assert r1["loss"] == r2["loss"]
    assert r1["accuracy"] == r2["accuracy"]


def test_clip_by_group_norm_scales_to_threshold():
    params = {
        "layers": (
            {
                "w_src": jnp.full((1, 2, 2), 10.0),
                "w_dst": jnp.full((1, 2, 2), 10.0),
                "a": jnp.full((1, 2), 0.1),
            },
        ),
        "w_o": jnp.full((2, 2), 3.0),
    }
    clipped = optim.clip_by_group_norm(params, 5.0)
    w_norm = float(
        jnp.sqrt(
            jnp.sum(jnp.square(clipped["layers"][0]["w_src"]))
            + jnp.sum(jnp.square(clipped["layers"][0]["w_dst"]))
        )
    )
    assert w_norm == pytest.approx(5.0, rel=1e-4)
    # small group untouched
    np.testing.assert_allclose(np.asarray(clipped["layers"][0]["a"]), 0.1)
    o_norm = float(jnp.sqrt(jnp.sum(jnp.square(clipped["w_o"]))))
    assert o_norm == pytest.approx(5.0, rel=1e-4)


def test_adam_epoch_indexed_bias_correction():
    """t=1 with zero-initialized moments: update = -lr * g / (|g| + eps)
    exactly (bias correction cancels), matching adam_update_kernel E:896-916."""
    config = TrainConfig(optimizer="adam", lr=0.1, beta1=0.9, beta2=0.999)
    params = {
        "layers": ({"w_src": jnp.ones((1, 1, 1)), "w_dst": jnp.ones((1, 1, 1)),
                     "a": jnp.ones((1, 1))},),
        "w_o": jnp.ones((1, 1)),
    }
    grads = jax.tree.map(lambda p: 2.0 * jnp.ones_like(p), params)
    state = optim.init_opt_state(params, "adam")
    new_params, _ = optim.apply_updates(
        params, grads, state, jnp.asarray(1, jnp.int32), config
    )
    expected = 1.0 - 0.1 * 2.0 / (2.0 + optim.ADAM_EPS)
    np.testing.assert_allclose(
        np.asarray(new_params["w_o"]), expected, rtol=1e-6
    )


def test_remat_matches_baseline(learnable_graph):
    """config.remat changes memory, not results."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gatv2_tpu.models.gatv2 import init_params, loss_fn

    g = learnable_graph
    c0 = ModelConfig(
        num_layers=2, heads=(2, 1), out_dims=(8, 8),
        num_classes=g.num_classes, in_dim=g.feature_dim,
    )
    c1 = dataclasses.replace(c0, remat=True)
    pe = g.padded_edges(128)
    args = (
        jnp.asarray(g.features), jnp.asarray(pe.src), jnp.asarray(pe.dst),
        jnp.asarray(g.labels),
    )
    p = init_params(c0, jax.random.PRNGKey(0))
    g0 = jax.grad(lambda p: loss_fn(p, *args, c0)[0])(p)
    g1 = jax.grad(lambda p: loss_fn(p, *args, c1)[0])(p)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_precision_modes_run(learnable_graph):
    """All three matmul-precision tiers produce finite, broadly-agreeing
    losses ('default' is bf16: loose tolerance)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gatv2_tpu.models.gatv2 import init_params, loss_fn

    g = learnable_graph
    base = ModelConfig(
        num_layers=2, heads=(2, 1), out_dims=(8, 8),
        num_classes=g.num_classes, in_dim=g.feature_dim,
    )
    pe = g.padded_edges(128)
    args = (
        jnp.asarray(g.features), jnp.asarray(pe.src), jnp.asarray(pe.dst),
        jnp.asarray(g.labels),
    )
    p = init_params(base, jax.random.PRNGKey(0))
    losses = {}
    for prec in ("highest", "high", "default"):
        c = dataclasses.replace(base, matmul_precision=prec)
        losses[prec] = float(loss_fn(p, *args, c)[0])
        assert np.isfinite(losses[prec])
    assert losses["high"] == pytest.approx(losses["highest"], rel=1e-3)
    assert losses["default"] == pytest.approx(losses["highest"], rel=5e-2)


def test_training_with_isolated_nodes():
    """Zero-in-degree nodes (empty softmax segments) train without NaNs on
    both impls — the reference only guards this with its +1e-8 denominator
    (SURVEY §5: zero-degree -> sum-exp 0)."""
    from gatv2_tpu.data.graph import Graph

    rng = np.random.default_rng(0)
    n = 96
    # nodes 64..95 receive NO edges; all edges target 0..63
    dst = np.sort(rng.integers(0, 64, 400).astype(np.int64))
    src = rng.integers(0, n, 400).astype(np.int64)
    row_ptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(dst, minlength=n), out=row_ptr[1:])
    g = Graph(
        features=rng.standard_normal((n, 8)).astype(np.float32),
        row_ptr=row_ptr, col_idx=src,
        labels=rng.integers(0, 3, n).astype(np.int32),
    )
    for impl in ("xla", "pallas"):
        mc = ModelConfig(num_layers=2, heads=(2, 1), out_dims=(8, 8),
                         num_classes=3, in_dim=8)
        tc = TrainConfig(optimizer="adam", lr=0.01, seed=0, impl=impl)
        t = Trainer(g, mc, tc, log_fn=lambda s: None)
        last = t.run(5)
        assert np.isfinite(last["loss"]), impl
