"""Fused GATv2 attention Pallas kernel (TPU).

Replaces the reference's four-kernel edge pipeline (score -> max/sumexp ->
normalize -> atomicAdd aggregate, GATv2_edge_based.cu:1386-1428) with ONE
row-blocked kernel that processes 128 destination nodes at a time and
streams their (dst-sorted) edges through VMEM in 128-edge tiles:

  per edge tile (flash-attention-style ONLINE softmax):
    s      = LeakyReLU(zs_e + zd_e)                 # [TE, HD]  VPU
    scT    = a_sel^T . s^T                          # [128, TE] MXU (per-head dot)
    M      = (dst_e == node_ids)                    # [TN, TE]  the one-hot
                                                    # selection "matrix"
    new_m  = max(m, rowwise masked max of scT)      # running per-(node,head) max
    p      = exp(clip(sc - M^T.new_m, -80, 0))      # [TE, 128]
    l      = exp(m - new_m) * l + M . p             # running sum-exp  (MXU)
    acc    = exp(m - new_m)*acc + M . (p_rep * zs)  # running aggregate (MXU)
  out = acc / (l_rep + 1e-8)

Key TPU-native ideas:
  - the per-destination segment reduction is an MXU matmul against the
    on-the-fly one-hot matrix M — deterministic, no atomics (the CUDA
    reference's atomicAdd scatter is the #2 hotspot, SURVEY.md §3.5);
  - edges are padded PER NODE TILE to 128-edge boundaries (prepare_edge_tiles)
    so every DMA is tile-aligned; padding edges carry dst=num_nodes and are
    annihilated by M;
  - per-head broadcasts (max gather, head->feature expansion) are also
    matmuls (M^T . m and p . R with R[h, h*D+d] = 1), avoiding unsupported
    lane reshapes;
  - numerics match ops/segment.py: exponent clip at -80, denominator +1e-8
    (reference N:446-447, E:379).

The backward pass is a custom_vjp that recomputes the XLA formulation and
uses its autodiff transpose (rematerialization: O(E) recompute, no edge-space
residuals saved — the same trade the flash-attention backward makes).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128  # destination nodes per grid step
TILE_E = 128  # edges per inner step

NEG_INF = -1e30
SOFTMAX_EPS = 1e-8
EXP_CLAMP = -80.0


@dataclasses.dataclass(frozen=True)
class EdgeTiles:
    """Per-node-tile-aligned edge layout (host-precomputed, static per graph).

    Edges stay dst-sorted; after each 128-node tile's edge range we insert
    padding edges (src=0, dst=num_nodes) to round the range up to a multiple
    of TILE_E, so every tile's range starts at a TILE_E boundary.
    """

    src: np.ndarray  # [E_pad] int32
    dst: np.ndarray  # [E_pad] int32 (num_nodes on padding)
    tile_offsets: np.ndarray  # [T+1] int32, in units of EDGE TILES
    num_nodes: int
    num_node_tiles: int

    @property
    def padded_num_edges(self) -> int:
        return self.src.shape[0]

    @property
    def padded_num_nodes(self) -> int:
        return self.num_node_tiles * TILE_N


def prepare_edge_tiles(row_ptr: np.ndarray, col_idx: np.ndarray, num_nodes: int) -> EdgeTiles:
    """Build the tile-aligned edge arrays from CSR (host-side, once per graph)."""
    row_ptr = np.asarray(row_ptr, np.int64)
    num_node_tiles = max(1, -(-num_nodes // TILE_N))
    degrees = np.diff(row_ptr)
    dst_all = np.repeat(np.arange(num_nodes, dtype=np.int32), degrees)

    counts = []
    for i in range(num_node_tiles):
        lo = row_ptr[i * TILE_N]
        hi = row_ptr[min((i + 1) * TILE_N, num_nodes)]
        counts.append(int(hi - lo))
    padded = [-(-c // TILE_E) * TILE_E for c in counts]
    tile_offsets = np.zeros(num_node_tiles + 1, np.int32)
    np.cumsum(np.asarray(padded) // TILE_E, out=tile_offsets[1:])
    e_pad = int(tile_offsets[-1]) * TILE_E
    e_pad = max(e_pad, TILE_E)

    src = np.zeros(e_pad, np.int32)
    dst = np.full(e_pad, num_nodes, np.int32)
    for i in range(num_node_tiles):
        lo = int(row_ptr[i * TILE_N])
        c = counts[i]
        o = int(tile_offsets[i]) * TILE_E
        src[o : o + c] = col_idx[lo : lo + c]
        dst[o : o + c] = dst_all[lo : lo + c]
    return EdgeTiles(
        src=src,
        dst=dst,
        tile_offsets=tile_offsets,
        num_nodes=num_nodes,
        num_node_tiles=num_node_tiles,
    )


def _attention_kernel(
    # scalar prefetch
    tile_offsets_ref,  # [T+1] int32 (edge-tile units)
    # inputs
    zs_hbm,  # [E_pad, HD] ANY
    zd_hbm,  # [E_pad, HD] ANY
    dst_hbm,  # [E_tiles, TILE_E] int32 ANY
    a_sel_ref,  # [HD, 128] VMEM  (a_sel[h*D+d, h] = a[h,d])
    r_ref,  # [128, HD] VMEM  (r[h, h*D+d] = 1)
    # outputs (grid-blocked)
    out_ref,  # [TILE_N, HD] VMEM
    # scratch
    zs_t,  # [TILE_E, HD]
    zd_t,  # [TILE_E, HD]
    dst_t,  # [1, TILE_E] int32
    m_scr,  # [TILE_N, 128]
    l_scr,  # [TILE_N, 128]
    acc_scr,  # [TILE_N, HD]
    tmax_scr,  # [TILE_N, 128]
    sems,  # DMA semaphores (3,)
    *,
    num_heads: int,
    negative_slope: float,
):
    i = pl.program_id(0)
    t0 = tile_offsets_ref[i]
    ntiles = tile_offsets_ref[i + 1] - t0

    m_scr[:] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
    l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)
    acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)
    # lanes >= num_heads are never written by the masked-max loop; they must
    # hold a finite value (they feed matmuls whose r_mat rows are zero)
    tmax_scr[:] = jnp.full(tmax_scr.shape, NEG_INF, jnp.float32)

    node_base = i * TILE_N
    node_ids = node_base + jax.lax.broadcasted_iota(jnp.int32, (TILE_N, TILE_E), 0)

    def body(k, _):
        off = pl.multiple_of((t0 + k) * TILE_E, TILE_E)
        cp1 = pltpu.make_async_copy(zs_hbm.at[pl.ds(off, TILE_E), :], zs_t, sems.at[0])
        cp2 = pltpu.make_async_copy(zd_hbm.at[pl.ds(off, TILE_E), :], zd_t, sems.at[1])
        cp3 = pltpu.make_async_copy(dst_hbm.at[pl.ds(t0 + k, 1), :], dst_t, sems.at[2])
        cp1.start()
        cp2.start()
        cp3.start()
        cp1.wait()
        cp2.wait()
        cp3.wait()

        s = zs_t[:] + zd_t[:]
        s = jnp.where(s > 0, s, negative_slope * s)
        # per-head attention dot, transposed: scT[h, e] = sum_f a_sel[f, h] s[e, f]
        sc_t = jax.lax.dot_general(
            a_sel_ref[:], s,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [128, TILE_E]

        mask = dst_t[:] == node_ids  # [TILE_N, TILE_E] (dst_t broadcasts row 0)
        mask_f = mask.astype(jnp.float32)

        # masked per-(node, head) max of this tile
        for h in range(num_heads):
            tmax_scr[:, h : h + 1] = jnp.max(
                jnp.where(mask, sc_t[h : h + 1, :], NEG_INF), axis=1, keepdims=True
            )
        m_prev = m_scr[:]
        new_m = jnp.maximum(m_prev, tmax_scr[:])
        c = jnp.exp(m_prev - new_m)  # [TILE_N, 128] rescale factor

        # gather each edge's dst max: m_g[h, e] = sum_n new_m[n, h] mask[n, e]
        m_g = jax.lax.dot_general(
            new_m, mask_f,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [128, TILE_E]
        p_t = jnp.exp(jnp.clip(sc_t - m_g, EXP_CLAMP, 0.0))  # [128(h), TILE_E]

        # l += M . p : contract edge dims
        l_scr[:] = c * l_scr[:] + jax.lax.dot_general(
            mask_f, p_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # expand p to feature lanes: p_rep[e, h*D+d] = p[h, e]
        p_rep = jax.lax.dot_general(
            p_t, r_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TILE_E, HD]
        c_rep = jnp.dot(
            c, r_ref[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TILE_N, HD]
        acc_scr[:] = c_rep * acc_scr[:] + jnp.dot(
            mask_f, p_rep * zs_t[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        m_scr[:] = new_m
        return 0

    jax.lax.fori_loop(0, ntiles, body, 0)

    l_rep = jnp.dot(
        l_scr[:], r_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[:] = acc_scr[:] / (l_rep + SOFTMAX_EPS)


def _pallas_forward(
    zs_e: jax.Array,  # [E_pad, HD] gathered src projections
    zd_e: jax.Array,  # [E_pad, HD] gathered dst projections
    a: jax.Array,  # [H, D]
    edge_tiles: EdgeTiles,
    negative_slope: float,
    *,
    interpret: bool = False,
) -> jax.Array:
    num_heads, d = a.shape
    hd_real = num_heads * d
    # HBM slices must be 128-lane aligned: zero-pad the feature dim. Padding
    # lanes map to no head (a_sel rows / r_mat cols zero), so they stay inert.
    hd = -(-hd_real // 128) * 128
    if hd != hd_real:
        pad = hd - hd_real
        zs_e = jnp.pad(zs_e, ((0, 0), (0, pad)))
        zd_e = jnp.pad(zd_e, ((0, 0), (0, pad)))
    e_pad = edge_tiles.padded_num_edges
    t = edge_tiles.num_node_tiles

    # head-selection matrices (constants wrt the graph; a_sel carries `a`)
    lane_real = jnp.arange(hd_real) // d  # head of each real feature lane
    a_sel = jnp.zeros((hd, 128), jnp.float32).at[
        jnp.arange(hd_real), lane_real
    ].set(a.reshape(hd_real).astype(jnp.float32))
    r_mat = jnp.zeros((128, hd), jnp.float32).at[
        lane_real, jnp.arange(hd_real)
    ].set(1.0)

    dst_tiles = jnp.asarray(edge_tiles.dst).reshape(e_pad // TILE_E, TILE_E)
    tile_offsets = jnp.asarray(edge_tiles.tile_offsets)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # zs_e
            pl.BlockSpec(memory_space=pl.ANY),  # zd_e
            pl.BlockSpec(memory_space=pl.ANY),  # dst tiles
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_sel
            pl.BlockSpec(memory_space=pltpu.VMEM),  # r_mat
        ],
        out_specs=pl.BlockSpec(
            (TILE_N, hd), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE_E, hd), jnp.float32),
            pltpu.VMEM((TILE_E, hd), jnp.float32),
            pltpu.VMEM((1, TILE_E), jnp.int32),
            pltpu.VMEM((TILE_N, 128), jnp.float32),
            pltpu.VMEM((TILE_N, 128), jnp.float32),
            pltpu.VMEM((TILE_N, hd), jnp.float32),
            pltpu.VMEM((TILE_N, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    kernel = functools.partial(
        _attention_kernel, num_heads=num_heads, negative_slope=negative_slope
    )
    avg_tiles_per_node_tile = max(1, e_pad // TILE_E // t)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t * TILE_N, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * (hd + 3 * 128) * 2,
            bytes_accessed=e_pad * hd * 8 + t * TILE_N * hd * 4,
            transcendentals=e_pad * 128 * avg_tiles_per_node_tile,
        ),
        interpret=interpret,
    )(tile_offsets, zs_e, zd_e, dst_tiles, a_sel, r_mat)
    return out  # [T*TILE_N, HD]


def edge_attention_pallas(
    zs: jax.Array,  # [N, H, D]
    zd: jax.Array,  # [N, H, D]
    a: jax.Array,  # [H, D]
    src: jax.Array,  # unused (edge_tiles carries the tiled layout)
    dst: jax.Array,  # unused
    num_nodes: int,
    *,
    negative_slope: float,
    edge_tiles: EdgeTiles | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for ops.attention._edge_attention_xla.

    Forward runs the fused Pallas kernel; backward rematerializes the XLA
    formulation and uses its autodiff transpose (custom_vjp below).
    """
    if edge_tiles is None:
        raise ValueError(
            "impl='pallas' requires edge_tiles (ops.pallas_attention."
            "prepare_edge_tiles(row_ptr, col_idx, num_nodes))"
        )
    if edge_tiles.num_nodes != num_nodes:
        raise ValueError(
            f"edge_tiles built for {edge_tiles.num_nodes} nodes, got {num_nodes}"
        )
    src_j = jnp.asarray(edge_tiles.src)
    dst_j = jnp.asarray(edge_tiles.dst)

    from gatv2_tpu.ops.attention import _edge_attention_xla

    @jax.custom_vjp
    def attn(zs, zd, a):
        n, h, d = zs.shape
        zs_e = jnp.take(zs.reshape(n, h * d), src_j, axis=0)
        zd_e = jnp.take(
            zd.reshape(n, h * d), jnp.minimum(dst_j, num_nodes - 1), axis=0
        )
        out = _pallas_forward(
            zs_e, zd_e, a, edge_tiles, negative_slope, interpret=interpret
        )
        return out[:num_nodes, : h * d].reshape(num_nodes, h, d)

    def fwd(zs, zd, a):
        return attn(zs, zd, a), (zs, zd, a)

    def bwd(res, g):
        zs, zd, a = res
        _, vjp = jax.vjp(
            lambda zs_, zd_, a_: _edge_attention_xla(
                zs_, zd_, a_, src_j, dst_j, num_nodes,
                negative_slope=negative_slope,
            ),
            zs, zd, a,
        )
        return vjp(g)

    attn.defvjp(fwd, bwd)
    return attn(zs, zd, a)
