"""Multi-layer multi-head GATv2 for full-graph node classification.

TPU-first formulation of the reference math (SURVEY.md §0, §3.5):

The reference computes, for every directed edge i->j, head h:
    e_ij = a_h . LeakyReLU(W_h [x_i || x_j])            (score, "dynamic attention")
    alpha_ij = softmax_over_inneighbors_of_j(e_ij)
    h_j = aggregate: sum_i alpha_ij * (W_src_h x_i)      (src half of W only!)
by recomputing `W x` per edge inside CUDA kernels — O(E*H*out*in) FLOPs
(gatv2_edge_score_kernel, GATv2_edge_based.cu:279-324). On TPU we instead:

  1. project once per node with two dense MXU matmuls:
         zs = X @ W_src^T,  zd = X @ W_dst^T            # [N, H, D]
     (the fused-W edge parameterization, W = [W_src | W_dst]
      GATv2_edge_based.cu:299-320, is algebraically identical to the split
      parameterization of GATv2_node_based.cu:390-406 — we store split)
  2. SDDMM on edges: s_e = zs[src_e] + zd[dst_e]; e = LeakyReLU(s) . a_h
  3. per-destination segment softmax (dst-sorted, deterministic)
  4. aggregation as a segment-sum SpMM: h = seg_sum(alpha * zs[src])
     — the message uses only the src projection, matching the reference
     (w_h_left, GATv2_edge_based.cu:415-423; W_src, GATv2_node_based.cu:523-535)

Multi-head combine:
  hidden layers concatenate heads after per-head LeakyReLU (E:450-458);
  the LAST GAT layer averages heads. The two reference variants disagree on
  activation order at the last layer (edge: LeakyReLU then mean, E:443-448;
  node: mean then LeakyReLU, N:548-557) — both are supported via
  `config.variant`.

Classifier head: logits = h_last @ W_o^T, softmax cross-entropy over ALL
nodes (no train/val/test masks, reference README.md:134).

The backward pass is `jax.grad` of this function — the reference's ~500
lines of hand-derived gradient kernels (SURVEY.md §2.3/§2.4) exist here only
as the autodiff of the forward; tests/test_grad.py checks the identities.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gatv2_tpu.config import ModelConfig
from gatv2_tpu.ops.attention import edge_attention

# A pytree: {"layers": ({"w_src", "w_dst", "a"}, ...), "w_o": [C, D_L]}
GATv2Params = dict[str, Any]


def init_params(config: ModelConfig, key: jax.Array) -> GATv2Params:
    """Xavier/Glorot uniform init with the reference's limits.

    W_src/W_dst/a: U(-l, l), l = sqrt(6 / (2*in_dim + out_dim))
      (xavier_init_kernel_curand, GATv2_edge_based.cu:208,227-229 — the
       fused W [out, 2*in] sees fan = 2*in + out; we draw the split halves
       from the same distribution).
    W_o: U(-l, l), l = sqrt(6 / (C + out_dim_last))  (E:233-243).
    """
    in_dims = config.layer_in_dims
    layers = []
    for l in range(config.num_layers):
        h, d, f = config.heads[l], config.out_dims[l], in_dims[l]
        limit = float(np.sqrt(6.0 / (2 * f + d)))
        key, k1, k2, k3 = jax.random.split(key, 4)
        layers.append(
            {
                "w_src": jax.random.uniform(k1, (h, d, f), jnp.float32, -limit, limit),
                "w_dst": jax.random.uniform(k2, (h, d, f), jnp.float32, -limit, limit),
                "a": jax.random.uniform(k3, (h, d), jnp.float32, -limit, limit),
            }
        )
    c, d_last = config.num_classes, config.out_dims[-1]
    limit_o = float(np.sqrt(6.0 / (c + d_last)))
    key, ko = jax.random.split(key)
    w_o = jax.random.uniform(ko, (c, d_last), jnp.float32, -limit_o, limit_o)
    return {"layers": tuple(layers), "w_o": w_o}


def init_params_for_variant(config: ModelConfig, key: jax.Array) -> GATv2Params:
    """Init matching the selected reference variant's draw order.

    variant='edge': the edge program draws each layer's W as ONE fused
    [out, 2*in] tensor (xavier_init_kernel_curand,
    GATv2_edge_based.cu:186-248) — use params_io.init_params_fused so a
    parity run sees the same distribution element-for-element.
    variant='node': split draws (W_src then W_dst, GATv2_node_based.cu:
    244-317) — init_params above.
    """
    if config.variant == "edge":
        from gatv2_tpu.models.params_io import init_params_fused

        return init_params_fused(config, key)
    return init_params(config, key)


def layer_forward(
    layer_params: dict[str, jax.Array],
    x: jax.Array,  # [N, F]
    src: jax.Array,  # [E] int32
    dst: jax.Array,  # [E] int32, sorted ascending (CSR order)
    num_nodes: int,
    *,
    is_last: bool,
    negative_slope: float,
    variant: str,
    impl: str = "xla",
    edge_tiles: Any = None,  # precomputed tiling metadata for the pallas impl
    precision=None,  # jax.lax.Precision for the MXU matmuls
    streams: str = "f32",  # SELL edge-stream dtype tier (config.streams)
) -> jax.Array:
    """One GATv2 layer. Returns [N, H*D] (hidden) or [N, D] (last layer)."""
    w_src, w_dst, a = layer_params["w_src"], layer_params["w_dst"], layer_params["a"]
    nh, hd_dim = a.shape
    if impl in ("pallas", "sell"):
        # flat [N, H*D] projections: the Pallas paths consume/produce the
        # flat layout directly, avoiding [N, H, D] <-> [N, HD] layout copies
        # (2.3GB each at OGBN-Products scale)
        zs = jnp.matmul(
            x, w_src.reshape(nh * hd_dim, -1).T, precision=precision
        )  # [N, H*D]
        zd = jnp.matmul(x, w_dst.reshape(nh * hd_dim, -1).T, precision=precision)
    else:
        # Dense projections on the MXU — the reference recomputes these per
        # edge.
        zs = jnp.einsum("nf,hdf->nhd", x, w_src, precision=precision)  # [N,H,D]
        zd = jnp.einsum("nf,hdf->nhd", x, w_dst, precision=precision)

    h = edge_attention(
        zs,
        zd,
        a,
        src,
        dst,
        num_nodes,
        negative_slope=negative_slope,
        impl=impl,
        edge_tiles=edge_tiles,
        precision=precision,
        streams=streams,
    )  # [N, H, D] (or flat [N, H*D] on the pallas path)

    if not is_last:
        # per-head LeakyReLU, then concat heads (E:450-458); elementwise, so
        # the flat layout needs no reshape
        h = jax.nn.leaky_relu(h, negative_slope)
        return h.reshape(num_nodes, -1)
    h = h.reshape(num_nodes, nh, hd_dim)
    if variant == "edge":
        # LeakyReLU per head, then average heads (E:443-448)
        return jnp.mean(jax.nn.leaky_relu(h, negative_slope), axis=1)
    # node variant: average heads, then LeakyReLU (N:548-557)
    return jax.nn.leaky_relu(jnp.mean(h, axis=1), negative_slope)


def model_forward(
    params: GATv2Params,
    features: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    config: ModelConfig,
    *,
    impl: str = "xla",
    edge_tiles: Any = None,
) -> jax.Array:
    """Full model: GATv2 stack + linear classifier. Returns logits [N, C]."""
    num_nodes = features.shape[0]
    x = features
    for l, layer_params in enumerate(params["layers"]):
        def run_layer(layer_params, x, l=l):
            return layer_forward(
                layer_params,
                x,
                src,
                dst,
                num_nodes,
                is_last=(l == config.num_layers - 1),
                negative_slope=config.negative_slope,
                variant=config.variant,
                impl=impl,
                edge_tiles=edge_tiles,
                precision=config.precision,
                streams=config.streams,
            )

        if config.remat:
            run_layer = jax.checkpoint(run_layer)
        x = run_layer(layer_params, x)
    return jnp.matmul(x, params["w_o"].T, precision=config.precision)  # [N, C]


def loss_and_accuracy(
    logits: jax.Array, labels: jax.Array, num_valid: int | jax.Array | None = None
) -> tuple[jax.Array, jax.Array]:
    """Mean CE + argmax accuracy over all nodes (E:514-550).

    Computed from logits via log-softmax (numerically superior to the
    reference's prob-then-log, which needs its 1e-12 clamp, E:527 — the
    clamp is therefore deliberately absent here).
    `num_valid` supports padded node sets (sharded / minibatch paths);
    padding rows must carry label < 0.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    valid = labels >= 0
    safe_labels = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None].astype(jnp.int32), axis=1)[
        :, 0
    ]
    correct = jnp.argmax(logits, axis=-1).astype(jnp.int32) == safe_labels
    if num_valid is None:
        denom = labels.shape[0]
    else:
        denom = num_valid
    nll = jnp.where(valid, nll, 0.0)
    correct = jnp.where(valid, correct, False)
    return jnp.sum(nll) / denom, jnp.sum(correct) / denom


def loss_fn(
    params: GATv2Params,
    features: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    labels: jax.Array,
    config: ModelConfig,
    *,
    impl: str = "xla",
    edge_tiles: Any = None,
    num_valid: int | jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    logits = model_forward(
        params, features, src, dst, config, impl=impl, edge_tiles=edge_tiles
    )
    loss, acc = loss_and_accuracy(logits, labels, num_valid)
    return loss, acc
