"""Edge-space GATv2 attention: SDDMM score -> segment softmax -> SpMM.

This is the framework's hot op, replacing the reference's four ★ kernels
(SURVEY.md §2.3): gatv2_edge_score_kernel, compute_max_sum_attn_score,
compute_attn_coeff, aggregate_kernel — plus their backward counterparts,
which here come from autodiff (XLA path) or a custom VJP (Pallas path).

Two implementations, selectable with `impl=`:
  'xla'    — jnp gathers + segment reductions. XLA fuses the gather /
             elementwise / reduce chain; correct everywhere (CPU/TPU),
             and the correctness oracle for the Pallas path.
  'pallas' — row-blocked fused kernel (ops/pallas_attention.py): the
             softmax+aggregation runs one dst-node tile at a time with the
             segment-sum expressed as an on-the-fly one-hot MXU matmul;
             avoids materializing [E, H, D] edge features and XLA scatters.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from gatv2_tpu.ops.segment import segment_softmax, segment_sum


def precision_name(precision) -> str:
    """Normalize a jax matmul-precision spec (enum, string, uniform (p, p)
    tuple, or None) to the Pallas kernels' tier name
    ('highest' | 'high' | 'default'). Raises ValueError on anything else."""
    import jax.lax as lax

    prec = precision
    if isinstance(prec, tuple):
        if len(set(prec)) != 1:
            raise ValueError(
                f"impl='pallas' needs a uniform precision, got {precision!r}"
            )
        prec = prec[0]
    if isinstance(prec, str):
        prec = {
            "highest": lax.Precision.HIGHEST,
            "high": lax.Precision.HIGH,
            "default": lax.Precision.DEFAULT,
            "bfloat16_3x": lax.Precision.HIGH,
            "tensorfloat32": lax.Precision.HIGH,
            "float32": lax.Precision.HIGHEST,
            "bfloat16": lax.Precision.DEFAULT,
        }.get(prec.lower(), prec)
    name = {
        lax.Precision.HIGHEST: "highest",
        lax.Precision.HIGH: "high",
        lax.Precision.DEFAULT: "default",
        None: "highest",
    }.get(prec)
    if name is None:
        raise ValueError(
            f"impl='pallas' does not understand precision {precision!r}; "
            "accepted: None, jax.lax.Precision.{HIGHEST,HIGH,DEFAULT}, "
            "the equivalent strings, or a uniform (p, p) tuple"
        )
    return name


def edge_attention(
    zs: jax.Array,  # [N, H, D] src projections (X @ W_src^T); the pallas
    #                 impl also accepts (and then returns) flat [N, H*D]
    zd: jax.Array,  # [N, H, D] dst projections (X @ W_dst^T)
    a: jax.Array,  # [H, D] attention vectors
    src: jax.Array,  # [E] int32
    dst: jax.Array,  # [E] int32, sorted ascending; padding edges use dst >= N
    num_nodes: int,
    *,
    negative_slope: float,
    impl: str = "xla",
    edge_tiles: Any = None,
    precision=None,
    interpret: bool = False,
    streams: str = "f32",  # SELL edge-stream dtype ('f32' exact | 'bf16')
) -> jax.Array:
    """Returns per-head aggregated features h [N, H, D]:

        e_e   = a_h . LeakyReLU(zs[src_e] + zd[dst_e])
        alpha = segment_softmax(e, dst)
        h_j   = sum_{e: dst_e = j} alpha_e * zs[src_e]
    """
    if impl == "xla":
        return _edge_attention_xla(
            zs, zd, a, src, dst, num_nodes,
            negative_slope=negative_slope, precision=precision,
        )
    if impl == "pallas":
        from gatv2_tpu.ops.pallas_attention import edge_attention_pallas

        prec_name = precision_name(precision)
        return edge_attention_pallas(
            zs,
            zd,
            a,
            src,
            dst,
            num_nodes,
            negative_slope=negative_slope,
            edge_tiles=edge_tiles,
            precision=prec_name,
            interpret=interpret,
        )
    if impl == "sell":
        from gatv2_tpu.ops.sell_attention import sell_attention

        return sell_attention(
            zs,
            zd,
            a,
            src,
            dst,
            num_nodes,
            negative_slope=negative_slope,
            sell_tiles=edge_tiles,
            precision=precision_name(precision),
            interpret=interpret,
            streams=streams,
        )
    raise ValueError(
        f"unknown impl {impl!r}; expected 'xla', 'pallas' or 'sell'"
    )


def _edge_attention_xla(
    zs, zd, a, src, dst, num_nodes, *, negative_slope, precision=None,
    indices_sorted=True,
) -> jax.Array:
    zs_e = jnp.take(zs, src, axis=0, mode="clip")  # [E, H, D]
    zd_e = jnp.take(zd, jnp.minimum(dst, num_nodes - 1), axis=0, mode="clip")
    s = jax.nn.leaky_relu(zs_e + zd_e, negative_slope)
    # [E, H] attention logits
    e = jnp.einsum("ehd,hd->eh", s, a, precision=precision)
    alpha = segment_softmax(e, dst, num_nodes, indices_sorted=indices_sorted)
    msgs = alpha[:, :, None] * zs_e  # [E, H, D]
    return segment_sum(
        msgs, dst, num_nodes, indices_sorted=indices_sorted
    )  # [N, H, D]

