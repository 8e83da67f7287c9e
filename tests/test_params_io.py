"""Fused-W <-> split-W conversions and text weight dump/restore."""

import jax
import jax.numpy as jnp
import numpy as np

from gatv2_tpu.config import ModelConfig
from gatv2_tpu.models.gatv2 import init_params, model_forward
from gatv2_tpu.models.params_io import (
    init_params_fused,
    load_params_txt,
    params_from_fused,
    params_to_fused,
    save_params_txt,
)


def _cfg(graph):
    return ModelConfig(
        num_layers=2, heads=(2, 1), out_dims=(8, 6),
        num_classes=graph.num_classes, in_dim=graph.feature_dim,
    )


def test_fused_roundtrip_exact(learnable_graph):
    config = _cfg(learnable_graph)
    params = init_params(config, jax.random.PRNGKey(0))
    back = params_from_fused(params_to_fused(params))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_layout_halves(learnable_graph):
    """Left half of the fused W is w_src, right half w_dst — the edge
    variant's layout (GATv2_edge_based.cu:299-320)."""
    config = _cfg(learnable_graph)
    params = init_params(config, jax.random.PRNGKey(1))
    fused = params_to_fused(params)
    for lp, fp in zip(params["layers"], fused["layers"]):
        f = lp["w_src"].shape[-1]
        np.testing.assert_array_equal(
            np.asarray(fp["w"][..., :f]), np.asarray(lp["w_src"])
        )
        np.testing.assert_array_equal(
            np.asarray(fp["w"][..., f:]), np.asarray(lp["w_dst"])
        )


def test_init_params_fused_same_model_family(learnable_graph):
    """Fused init produces correctly-shaped params and a working forward."""
    g = learnable_graph
    config = _cfg(g)
    params = init_params_fused(config, jax.random.PRNGKey(2))
    pe = g.padded_edges(128)
    logits = model_forward(
        params, jnp.asarray(g.features), jnp.asarray(pe.src),
        jnp.asarray(pe.dst), config,
    )
    assert logits.shape == (g.num_nodes, g.num_classes)
    assert np.isfinite(np.asarray(logits)).all()
    # Xavier bounds hold: |w| <= sqrt(6 / (2*in + out))
    for l, lp in enumerate(params["layers"]):
        f = config.layer_in_dims[l]
        lim = np.sqrt(6.0 / (2 * f + config.out_dims[l]))
        for k in ("w_src", "w_dst", "a"):
            assert np.abs(np.asarray(lp[k])).max() <= lim


def test_txt_dump_restore_forward_equal(learnable_graph, tmp_path):
    g = learnable_graph
    config = _cfg(g)
    params = init_params(config, jax.random.PRNGKey(3))
    save_params_txt(tmp_path, params)
    restored = load_params_txt(tmp_path, config)
    pe = g.padded_edges(128)
    args = (jnp.asarray(g.features), jnp.asarray(pe.src), jnp.asarray(pe.dst))
    out_a = model_forward(params, *args, config)
    out_b = model_forward(restored, *args, config)
    # text roundtrip is %.9g — float32-exact
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(out_b), rtol=1e-6, atol=1e-7
    )


def test_init_params_for_variant_selects_draw(learnable_graph):
    """variant='edge' initializes with the fused single-tensor draw (the
    edge program's xavier_init_kernel_curand distribution,
    GATv2_edge_based.cu:186-248); variant='node' with split draws."""
    import dataclasses

    import jax

    from gatv2_tpu.models.gatv2 import init_params, init_params_for_variant
    from gatv2_tpu.models.params_io import init_params_fused

    g = learnable_graph
    base = ModelConfig(
        num_layers=2, heads=(2, 1), out_dims=(8, 4),
        num_classes=g.num_classes, in_dim=g.feature_dim,
    )
    key = jax.random.PRNGKey(9)
    edge_cfg = dataclasses.replace(base, variant="edge")
    node_cfg = dataclasses.replace(base, variant="node")

    got_edge = init_params_for_variant(edge_cfg, key)
    want_edge = init_params_fused(edge_cfg, key)
    for a, b in zip(jax.tree.leaves(got_edge), jax.tree.leaves(want_edge)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    got_node = init_params_for_variant(node_cfg, key)
    want_node = init_params(node_cfg, key)
    for a, b in zip(jax.tree.leaves(got_node), jax.tree.leaves(want_node)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the two draws genuinely differ (different stream layout)
    assert not all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(got_edge), jax.tree.leaves(got_node))
    )
