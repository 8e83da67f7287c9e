"""Segment reductions over dst-sorted edge arrays (XLA path).

These replace the reference's two reduction strategies:
  - warp-shuffle per-(dst,head) max/sum-exp (compute_max_sum_attn_score,
    GATv2_edge_based.cu:326-359 / GATv2_node_based.cu:415-458), and
  - atomicAdd scatter aggregation (aggregate_kernel,
    GATv2_edge_based.cu:386-424).

Because edges come from CSR they are already sorted by destination, so we
always pass `indices_are_sorted=True`; XLA lowers these to deterministic
scatter/reduce — no atomics, bitwise-reproducible across runs (the reference
explicitly is not: README.md:158).

Numerical-parity details (SURVEY.md §5 epsilon inventory):
  - softmax denominator `+ 1e-8` (E:379, N:512)
  - the node variant clamps the exponent at -80 (N:446-447); we adopt the
    clamp unconditionally (it only ever prevents underflow-to-inf edge cases
    and is a no-op after max subtraction except for empty segments).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SOFTMAX_EPS = 1e-8
EXP_CLAMP = -80.0


def segment_sum(
    data: jax.Array, segment_ids: jax.Array, num_segments: int,
    *, indices_sorted: bool = True,
) -> jax.Array:
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_sorted,
    )


def segment_max(
    data: jax.Array, segment_ids: jax.Array, num_segments: int,
    *, indices_sorted: bool = True,
) -> jax.Array:
    return jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_sorted,
    )


def segment_softmax(
    scores: jax.Array,  # [E, ...] attention logits per edge
    segment_ids: jax.Array,  # [E] destination node per edge (sorted)
    num_segments: int,
    *,
    indices_sorted: bool = True,
) -> jax.Array:
    """Numerically-stable softmax over each destination's in-neighborhood.

    alpha_e = exp(s_e - max_seg) / (sum_seg exp(. - max_seg) + 1e-8)

    Zero-degree segments produce max=-inf; the exponent clamp keeps the
    result finite (alpha of padding edges is garbage but padding edges carry
    dst=num_segments and are dropped by the reductions).
    """
    seg_max = segment_max(
        scores, segment_ids, num_segments, indices_sorted=indices_sorted
    )
    # empty segments have -inf max; make the gathered max finite
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = scores - seg_max[segment_ids]
    expd = jnp.exp(jnp.maximum(shifted, EXP_CLAMP))
    denom = segment_sum(
        expd, segment_ids, num_segments, indices_sorted=indices_sorted
    )
    return expd / (denom[segment_ids] + SOFTMAX_EPS)
