"""Checkpoint/resume: bitwise state restore, Adam t continuity."""

import jax
import numpy as np

from gatv2_tpu.config import ModelConfig, TrainConfig
from gatv2_tpu.train import checkpoint as ckpt
from gatv2_tpu.train.loop import Trainer


def _mk(graph):
    return ModelConfig(
        num_layers=2, heads=(2, 1), out_dims=(8, 4),
        num_classes=graph.num_classes, in_dim=graph.feature_dim,
    )


def test_save_restore_roundtrip(tmp_path, learnable_graph):
    tc = TrainConfig(epochs=4, optimizer="adam", lr=0.01, seed=3)
    t = Trainer(learnable_graph, _mk(learnable_graph), tc, log_fn=lambda s: None)
    t.run(2)
    ckpt.save(str(tmp_path), t.params, t.opt_state, t.epoch)

    t2 = Trainer(learnable_graph, _mk(learnable_graph), tc, log_fn=lambda s: None)
    assert ckpt.restore_into(str(tmp_path), t2)
    assert t2.epoch == 2
    for a, b in zip(
        np.asarray(t.params["w_o"]).ravel(), np.asarray(t2.params["w_o"]).ravel()
    ):
        assert a == b


def test_resume_reproduces_uninterrupted_run(tmp_path, learnable_graph):
    """Train 4 epochs straight vs 2 + checkpoint + resume + 2: identical
    (requires Adam bias-correction t to be restored, reference E:908-911)."""
    tc = TrainConfig(epochs=4, optimizer="adam", lr=0.01, seed=3)
    straight = Trainer(learnable_graph, _mk(learnable_graph), tc, log_fn=lambda s: None)
    r_straight = straight.run(4)

    t1 = Trainer(learnable_graph, _mk(learnable_graph), tc, log_fn=lambda s: None)
    t1.run(2)
    ckpt.save(str(tmp_path), t1.params, t1.opt_state, t1.epoch)

    t2 = Trainer(learnable_graph, _mk(learnable_graph), tc, log_fn=lambda s: None)
    ckpt.restore_into(str(tmp_path), t2)
    r_resumed = t2.run(2)

    assert r_resumed["loss"] == r_straight["loss"]
    assert r_resumed["accuracy"] == r_straight["accuracy"]


def test_latest_of_multiple(tmp_path, learnable_graph):
    tc = TrainConfig(epochs=2, optimizer="sgd", seed=1)
    t = Trainer(learnable_graph, _mk(learnable_graph), tc, log_fn=lambda s: None)
    ckpt.save(str(tmp_path), t.params, t.opt_state, 1)
    ckpt.save(str(tmp_path), t.params, t.opt_state, 2)
    assert ckpt.latest_path(str(tmp_path)).name == "ckpt_00000002.npz"


def test_restore_with_empty_opt_template(tmp_path, learnable_graph):
    """predict.py restores weights with an empty {} optimizer template —
    the treedef/shape validation must skip empty groups rather than flag a
    mismatch (round-2 review finding)."""
    from gatv2_tpu.config import ModelConfig
    from gatv2_tpu.models.gatv2 import init_params
    from gatv2_tpu.train import checkpoint as ckpt
    from gatv2_tpu.train import optim

    g = learnable_graph
    mc = ModelConfig(num_layers=2, heads=(2, 1), out_dims=(8, 8),
                     num_classes=g.num_classes, in_dim=g.feature_dim)
    params = init_params(mc, jax.random.PRNGKey(0))
    opt = optim.init_opt_state(params, "adam")
    path = ckpt.save(str(tmp_path), params, opt, 5)

    restored, opt_out, epoch = ckpt.restore(path, params, {})
    assert epoch == 5 and opt_out == {}
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
