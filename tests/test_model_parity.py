"""Parity: JAX model vs the numpy oracle that transcribes the reference math.

This is the north-star check (BASELINE.json: 'match per-layer activations
(allclose)'): the TPU formulation (dense projections + segment ops) must be
numerically equivalent to the reference's per-edge computation for both
variants' last-layer semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gatv2_tpu.config import ModelConfig
from gatv2_tpu.models.gatv2 import init_params, model_forward, loss_and_accuracy
from gatv2_tpu.testing import oracle


def _params_as_numpy(params):
    return (
        [
            {k: np.asarray(v) for k, v in layer.items()}
            for layer in params["layers"]
        ],
        np.asarray(params["w_o"]),
    )


@pytest.mark.parametrize("variant", ["edge", "node"])
@pytest.mark.parametrize("impl", ["xla", "sell"])
def test_logits_match_oracle(tiny_graph, variant, impl):
    g = tiny_graph
    config = ModelConfig(
        num_layers=3,
        heads=(4, 2, 2),
        out_dims=(8, 6, 5),
        num_classes=g.num_classes,
        in_dim=g.feature_dim,
        variant=variant,
    )
    params = init_params(config, jax.random.PRNGKey(0))

    edge_tiles = None
    feats = g.features
    if impl == "sell":
        from gatv2_tpu.ops.sell_attention import setup_full_graph_sell

        edge_tiles, feats, _, _ = setup_full_graph_sell(
            g, config.heads, config.out_dims
        )
    pe = g.padded_edges(128)
    logits = np.asarray(
        model_forward(
            params,
            jnp.asarray(feats),
            jnp.asarray(pe.src),
            jnp.asarray(pe.dst),
            config,
            impl=impl,
            edge_tiles=edge_tiles,
        )
    )[: g.num_nodes]

    layers_np, w_o_np = _params_as_numpy(params)
    logits_ref = oracle.model_oracle(
        g.features,
        g.row_ptr,
        g.col_idx,
        layers_np,
        w_o_np,
        negative_slope=config.negative_slope,
        variant=variant,
    )
    np.testing.assert_allclose(logits, logits_ref, rtol=2e-4, atol=2e-5)


def test_loss_accuracy_match_oracle(tiny_graph, tiny_config):
    g, config = tiny_graph, tiny_config
    params = init_params(config, jax.random.PRNGKey(1))
    pe = g.padded_edges(128)
    logits = model_forward(
        params,
        jnp.asarray(g.features),
        jnp.asarray(pe.src),
        jnp.asarray(pe.dst),
        config,
    )
    loss, acc = loss_and_accuracy(logits, jnp.asarray(g.labels))
    loss_ref, acc_ref = oracle.loss_and_accuracy_oracle(
        np.asarray(logits), g.labels
    )
    assert float(loss) == pytest.approx(loss_ref, rel=1e-5)
    assert float(acc) == pytest.approx(acc_ref, abs=1e-6)


def test_variants_differ_only_at_last_layer_activation(tiny_graph):
    """README.md:13 claims both variants give identical results; SURVEY.md §0
    documents they differ at the last layer (LeakyReLU/mean order). Verify
    both facts: same hidden behavior, different final logits in general."""
    g = tiny_graph
    mk = lambda v: ModelConfig(
        num_layers=2, heads=(3, 2), out_dims=(8, 6),
        num_classes=g.num_classes, in_dim=g.feature_dim, variant=v,
    )
    params = init_params(mk("edge"), jax.random.PRNGKey(2))
    pe = g.padded_edges(128)
    args = (jnp.asarray(g.features), jnp.asarray(pe.src), jnp.asarray(pe.dst))
    out_edge = np.asarray(model_forward(params, *args, mk("edge")))
    out_node = np.asarray(model_forward(params, *args, mk("node")))
    # multi-head last layer + negative pre-activations -> orders disagree
    assert not np.allclose(out_edge, out_node)


def test_zero_degree_nodes_get_zero_output(tiny_config):
    """A node with no in-edges aggregates nothing (sum-exp 0 guarded only by
    +1e-8 in the reference); our formulation yields exactly 0 features."""
    from gatv2_tpu.data.graph import Graph

    # node 0 has NO in-edges; nodes 1..9 each receive one edge from i-1
    n = 10
    rng = np.random.default_rng(0)
    g = Graph(
        features=rng.standard_normal((n, 6)).astype(np.float32),
        row_ptr=np.concatenate([[0], np.arange(n)]).astype(np.int32),
        col_idx=np.arange(n - 1, dtype=np.int32),
        labels=(np.arange(n) % 2).astype(np.int32),
    )
    config = ModelConfig(
        num_layers=1, heads=(2,), out_dims=(4,),
        num_classes=2, in_dim=6, variant="edge",
    )
    params = init_params(config, jax.random.PRNGKey(3))
    pe = g.padded_edges(128)
    from gatv2_tpu.models.gatv2 import layer_forward

    h = layer_forward(
        params["layers"][0],
        jnp.asarray(g.features),
        jnp.asarray(pe.src),
        jnp.asarray(pe.dst),
        g.num_nodes,
        is_last=True,
        negative_slope=0.01,
        variant="edge",
    )
    in_deg = np.diff(g.row_ptr)
    zero_nodes = np.where(in_deg == 0)[0]
    assert zero_nodes.size > 0
    h = np.asarray(h)
    np.testing.assert_array_equal(h[zero_nodes], 0.0)
    assert np.isfinite(h).all()
