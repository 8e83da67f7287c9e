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

The backward pass is a custom_vjp with TWO selectable implementations:
  - 'pallas' (default): fused Pallas gradient kernels (below) — a dst-tiled
    3-pass kernel (recompute max/sum-exp online -> softmax-Jacobian segment
    term -> d_zd / d_a / per-edge packet) plus a src-tiled segment-sum kernel
    for d_zs. The reference hand-derives the same math as 5 CUDA kernels with
    atomicAdd scatters (kernel_grad_atten_coeff E:612-651,
    compute_grad_attn_score_kernel E:654-696 — O(sum deg^2)!,
    compute_grad_parameters_kernel E:698-798,
    compute_features_input_gradients E:801-874); here every segment
    reduction is a one-hot MXU matmul and the softmax Jacobian uses the
    O(E) identity  dL/de_ij = alpha_ij (dL/dalpha_ij - sum_k alpha_kj
    dL/dalpha_kj)  (SURVEY.md §3.5.3). No residuals are saved from the
    forward: the backward recomputes scores/softmax stats from zs/zd (the
    same remat trade the flash-attention backward makes).
  - 'xla': rematerializes the XLA formulation and uses its autodiff
    transpose (scatter-based; the correctness oracle).
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
    # src-sorted mirror layout for the backward d_zs segment-sum (the
    # transpose graph / CSC view). gather_perm maps positions in the
    # src-sorted layout back into the dst-sorted layout above; padding
    # slots carry src_ids == num_nodes (annihilated by the kernel's one-hot
    # mask) and gather_perm == 0.
    src_sorted_ids: np.ndarray | None = None  # [E2_pad] int32
    gather_perm: np.ndarray | None = None  # [E2_pad] int32
    src_tile_offsets: np.ndarray | None = None  # [T+1] int32, edge-tile units

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

    # --- src-sorted mirror (backward d_zs path) -------------------------
    # positions of real edges in the dst-sorted padded layout, stably
    # re-sorted by src node -> per-src-tile contiguous ranges, padded to
    # TILE_E boundaries exactly like the dst layout.
    real_pos = np.nonzero(dst < num_nodes)[0].astype(np.int32)
    order = np.argsort(src[real_pos], kind="stable")
    pos_sorted = real_pos[order]
    src_sorted = src[pos_sorted]
    tile_of_edge = src_sorted // TILE_N
    counts2 = np.bincount(tile_of_edge, minlength=num_node_tiles)
    starts2 = np.concatenate([[0], np.cumsum(counts2)])
    padded2 = -(-counts2 // TILE_E) * TILE_E
    src_tile_offsets = np.zeros(num_node_tiles + 1, np.int32)
    np.cumsum(padded2 // TILE_E, out=src_tile_offsets[1:])
    e2_pad = max(int(src_tile_offsets[-1]) * TILE_E, TILE_E)
    src_sorted_ids = np.full(e2_pad, num_nodes, np.int32)
    gather_perm = np.zeros(e2_pad, np.int32)
    for i in range(num_node_tiles):
        c = int(counts2[i])
        s, o = int(starts2[i]), int(src_tile_offsets[i]) * TILE_E
        src_sorted_ids[o : o + c] = src_sorted[s : s + c]
        gather_perm[o : o + c] = pos_sorted[s : s + c]

    return EdgeTiles(
        src=src,
        dst=dst,
        tile_offsets=tile_offsets,
        num_nodes=num_nodes,
        num_node_tiles=num_node_tiles,
        src_sorted_ids=src_sorted_ids,
        gather_perm=gather_perm,
        src_tile_offsets=src_tile_offsets,
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
    # zs_e/zd_e arrive lane-padded to a 128 multiple (HBM slices must be
    # 128-lane aligned). Padding lanes map to no head (a_sel rows / r_mat
    # cols zero), so they stay inert.
    hd = zs_e.shape[1]
    assert hd % 128 == 0 and hd >= num_heads * d
    e_pad = edge_tiles.padded_num_edges
    t = edge_tiles.num_node_tiles

    # head-selection matrices (constants wrt the graph; a_sel carries `a`)
    a_sel, r_mat, _ = _head_matrices(a, hd)

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


def _attention_bwd_kernel(
    # scalar prefetch
    tile_offsets_ref,  # [T+1] int32 (edge-tile units)
    # inputs
    zs_hbm,  # [E_pad, HD] ANY (gathered src projections, rematerialized)
    zd_hbm,  # [E_pad, HD] ANY (gathered dst projections)
    dst_hbm,  # [E_tiles, TILE_E] int32 ANY
    g_ref,  # [TILE_N, HD] VMEM blocked — upstream grad dL/dh for this tile
    a_sel_ref,  # [HD, 128] VMEM (a_sel[h*D+d, h] = a[h,d])
    r_ref,  # [128, HD] VMEM (r[h, h*D+d] = 1)
    a_rep_ref,  # [1, HD] VMEM (a_rep[0, h*D+d] = a[h,d])
    # outputs
    dzd_ref,  # [TILE_N, HD] VMEM blocked — dL/dzd for this dst tile
    da_ref,  # [8, HD] VMEM blocked — this tile's dL/da contribution (row 0;
    #          8 sublanes only to satisfy the (8, 128) min tile)
    c1_hbm,  # [E_pad, HD] ANY — per-edge packet, scattered to src by phase 2
    # scratch
    zs_t,  # [TILE_E, HD]
    zd_t,  # [TILE_E, HD]
    c1_t,  # [TILE_E, HD]
    dst_t,  # [1, TILE_E] int32
    m_scr,  # [TILE_N, 128] per-(node, head) running max
    l_scr,  # [TILE_N, 128] per-(node, head) sum-exp
    rsum_scr,  # [TILE_N, 128] softmax-Jacobian segment term sum_k alpha*dalpha
    tmax_scr,  # [TILE_N, 128]
    sems,  # DMA semaphores (4,)
    *,
    num_heads: int,
    negative_slope: float,
):
    """dst-tiled fused backward. Three streaming passes over the tile's edges:

      A) online recompute of the per-(dst, head) softmax stats (m, l) —
         identical math to the forward kernel;
      B) dalpha_e = <g[dst_e], zs[src_e]>_h; accumulate the segment term
         r_j = sum_{k in N(j)} alpha_k * dalpha_k;
      C) de_e = alpha_e (dalpha_e - r[dst_e]); ds_e = (de ⊗ a) * LReLU'(s);
         d_zd[j] += sum_e ds_e (one-hot matmul);  d_a += sum_e de_e ⊗ LReLU(s);
         c1_e = alpha_e * g[dst_e] + ds_e  (consumed by _segsum_src_kernel).

    Padding edges (dst == num_nodes) produce exact zeros in every output:
    their mask column is zero, so g_e, m_g, l_g, r_g gather to 0, hence
    dalpha = 0, de = alpha * (0 - 0) = 0, and c1 = alpha_rep * 0 + 0 = 0.
    """
    i = pl.program_id(0)
    t0 = tile_offsets_ref[i]
    ntiles = tile_offsets_ref[i + 1] - t0

    m_scr[:] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
    l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)
    rsum_scr[:] = jnp.zeros(rsum_scr.shape, jnp.float32)
    tmax_scr[:] = jnp.full(tmax_scr.shape, NEG_INF, jnp.float32)
    dzd_ref[:] = jnp.zeros(dzd_ref.shape, jnp.float32)
    da_ref[:] = jnp.zeros(da_ref.shape, jnp.float32)

    node_base = i * TILE_N
    node_ids = node_base + jax.lax.broadcasted_iota(jnp.int32, (TILE_N, TILE_E), 0)

    def load_tile(k):
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

    def scores_headmajor():
        """sc_t[h, e] (head-major, for the masked-max pass)."""
        s = zs_t[:] + zd_t[:]
        s = jnp.where(s > 0, s, negative_slope * s)
        return jax.lax.dot_general(
            a_sel_ref[:], s,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [128, TILE_E]

    # ---- pass A: online (m, l) recompute -------------------------------
    def body_a(k, _):
        load_tile(k)
        sc_t = scores_headmajor()
        mask = dst_t[:] == node_ids
        mask_f = mask.astype(jnp.float32)
        for h in range(num_heads):
            tmax_scr[:, h : h + 1] = jnp.max(
                jnp.where(mask, sc_t[h : h + 1, :], NEG_INF), axis=1, keepdims=True
            )
        m_prev = m_scr[:]
        new_m = jnp.maximum(m_prev, tmax_scr[:])
        c = jnp.exp(m_prev - new_m)
        m_g = jax.lax.dot_general(
            new_m, mask_f,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [128, TILE_E]
        p_t = jnp.exp(jnp.clip(sc_t - m_g, EXP_CLAMP, 0.0))
        l_scr[:] = c * l_scr[:] + jax.lax.dot_general(
            mask_f, p_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        m_scr[:] = new_m
        return 0

    jax.lax.fori_loop(0, ntiles, body_a, 0)

    def edge_alpha_dalpha(mask_f):
        """Recompute (alpha_e, dalpha_e, s, g_e) edge-major [TILE_E, ...]."""
        s_raw = zs_t[:] + zd_t[:]
        s = jnp.where(s_raw > 0, s_raw, negative_slope * s_raw)
        sc_e = jnp.dot(
            s, a_sel_ref[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TILE_E, 128]
        m_g = jax.lax.dot_general(
            mask_f, m_scr[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TILE_E, 128]
        l_g = jax.lax.dot_general(
            mask_f, l_scr[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        p_e = jnp.exp(jnp.clip(sc_e - m_g, EXP_CLAMP, 0.0))
        alpha_e = p_e / (l_g + SOFTMAX_EPS)  # [TILE_E, 128]
        g_e = jax.lax.dot_general(
            mask_f, g_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TILE_E, HD]
        dalpha_e = jax.lax.dot_general(
            g_e * zs_t[:], r_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TILE_E, 128]
        return alpha_e, dalpha_e, s_raw, s, g_e

    # ---- pass B: segment term r_j = sum alpha * dalpha ------------------
    def body_b(k, _):
        load_tile(k)
        mask_f = (dst_t[:] == node_ids).astype(jnp.float32)
        alpha_e, dalpha_e, _, _, _ = edge_alpha_dalpha(mask_f)
        rsum_scr[:] = rsum_scr[:] + jnp.dot(
            mask_f, alpha_e * dalpha_e, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return 0

    jax.lax.fori_loop(0, ntiles, body_b, 0)

    # ---- pass C: de, d_zd, d_a, per-edge packet c1 ----------------------
    def body_c(k, _):
        load_tile(k)
        mask_f = (dst_t[:] == node_ids).astype(jnp.float32)
        alpha_e, dalpha_e, s_raw, s_act, g_e = edge_alpha_dalpha(mask_f)
        r_g = jax.lax.dot_general(
            mask_f, rsum_scr[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TILE_E, 128]
        de_e = alpha_e * (dalpha_e - r_g)  # [TILE_E, 128]
        de_rep = jnp.dot(
            de_e, r_ref[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TILE_E, HD]
        lrelu_grad = jnp.where(s_raw > 0, 1.0, negative_slope)
        ds = de_rep * a_rep_ref[:] * lrelu_grad  # [TILE_E, HD]
        alpha_rep = jnp.dot(
            alpha_e, r_ref[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        c1_t[:] = alpha_rep * g_e + ds
        off = pl.multiple_of((t0 + k) * TILE_E, TILE_E)
        cp = pltpu.make_async_copy(c1_t, c1_hbm.at[pl.ds(off, TILE_E), :], sems.at[3])
        cp.start()
        dzd_ref[:] = dzd_ref[:] + jnp.dot(
            mask_f, ds, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        da_tile = jnp.sum(de_rep * s_act, axis=0, keepdims=True)  # [1, HD]
        row0 = (
            jax.lax.broadcasted_iota(jnp.int32, da_ref.shape, 0) == 0
        )
        da_ref[:] = da_ref[:] + jnp.where(
            row0, jnp.broadcast_to(da_tile, da_ref.shape), 0.0
        )
        cp.wait()
        return 0

    jax.lax.fori_loop(0, ntiles, body_c, 0)


def _segsum_src_kernel(
    # scalar prefetch
    src_tile_offsets_ref,  # [T+1] int32 (edge-tile units)
    # inputs
    c1s_hbm,  # [E2_pad, HD] ANY — c1 packets permuted to src-sorted order
    sid_hbm,  # [E2_tiles, TILE_E] int32 ANY — src ids (num_nodes on padding)
    # outputs
    dzs_ref,  # [TILE_N, HD] VMEM blocked
    # scratch
    c1_t,  # [TILE_E, HD]
    sid_t,  # [1, TILE_E] int32
    sems,  # DMA semaphores (2,)
):
    """src-tiled segment sum: dzs[i] = sum_{e: src_e == i} c1_e.

    The deterministic TPU replacement for the reference's atomicAdd scatter
    in compute_features_input_gradients (GATv2_edge_based.cu:801-874):
    the scatter becomes a one-hot MXU matmul over the transpose-graph tiling.
    """
    i = pl.program_id(0)
    t0 = src_tile_offsets_ref[i]
    ntiles = src_tile_offsets_ref[i + 1] - t0
    dzs_ref[:] = jnp.zeros(dzs_ref.shape, jnp.float32)
    node_ids = i * TILE_N + jax.lax.broadcasted_iota(
        jnp.int32, (TILE_N, TILE_E), 0
    )

    def body(k, _):
        off = pl.multiple_of((t0 + k) * TILE_E, TILE_E)
        cp1 = pltpu.make_async_copy(c1s_hbm.at[pl.ds(off, TILE_E), :], c1_t, sems.at[0])
        cp2 = pltpu.make_async_copy(sid_hbm.at[pl.ds(t0 + k, 1), :], sid_t, sems.at[1])
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()
        mask_f = (sid_t[:] == node_ids).astype(jnp.float32)
        dzs_ref[:] = dzs_ref[:] + jnp.dot(
            mask_f, c1_t[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return 0

    jax.lax.fori_loop(0, ntiles, body, 0)


def _head_matrices(a: jax.Array, hd: int):
    """(a_sel [HD,128], r_mat [128,HD], a_rep [1,HD]) lane-layout helpers."""
    num_heads, d = a.shape
    hd_real = num_heads * d
    lane_real = jnp.arange(hd_real) // d
    a_flat = a.reshape(hd_real).astype(jnp.float32)
    a_sel = jnp.zeros((hd, 128), jnp.float32).at[
        jnp.arange(hd_real), lane_real
    ].set(a_flat)
    r_mat = jnp.zeros((128, hd), jnp.float32).at[
        lane_real, jnp.arange(hd_real)
    ].set(1.0)
    a_rep = jnp.zeros((1, hd), jnp.float32).at[0, : hd_real].set(a_flat)
    return a_sel, r_mat, a_rep


def _pallas_backward(
    zs_e: jax.Array,  # [E_pad, HD] gathered src projections (lane-padded)
    zd_e: jax.Array,  # [E_pad, HD] gathered dst projections
    g_pad: jax.Array,  # [T*TILE_N, HD] upstream grad (node+lane padded)
    a: jax.Array,  # [H, D]
    edge_tiles: EdgeTiles,
    negative_slope: float,
    *,
    interpret: bool = False,
):
    """Runs phase 1 (dst-tiled) and phase 2 (src-tiled) backward kernels.

    Returns (dzs_pad [T*TILE_N, HD], dzd_pad [T*TILE_N, HD], da [HD]).
    """
    num_heads, d = a.shape
    hd = zs_e.shape[1]
    e_pad = edge_tiles.padded_num_edges
    t = edge_tiles.num_node_tiles
    a_sel, r_mat, a_rep = _head_matrices(a, hd)
    dst_tiles = jnp.asarray(edge_tiles.dst).reshape(e_pad // TILE_E, TILE_E)
    tile_offsets = jnp.asarray(edge_tiles.tile_offsets)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # zs_e
            pl.BlockSpec(memory_space=pl.ANY),  # zd_e
            pl.BlockSpec(memory_space=pl.ANY),  # dst tiles
            pl.BlockSpec((TILE_N, hd), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_sel
            pl.BlockSpec(memory_space=pltpu.VMEM),  # r_mat
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_rep
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, hd), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hd), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # c1 packets
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_E, hd), jnp.float32),
            pltpu.VMEM((TILE_E, hd), jnp.float32),
            pltpu.VMEM((TILE_E, hd), jnp.float32),
            pltpu.VMEM((1, TILE_E), jnp.int32),
            pltpu.VMEM((TILE_N, 128), jnp.float32),
            pltpu.VMEM((TILE_N, 128), jnp.float32),
            pltpu.VMEM((TILE_N, 128), jnp.float32),
            pltpu.VMEM((TILE_N, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    kernel = functools.partial(
        _attention_bwd_kernel, num_heads=num_heads, negative_slope=negative_slope
    )
    dzd_pad, da_parts, c1 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t * TILE_N, hd), jnp.float32),
            jax.ShapeDtypeStruct((t * 8, hd), jnp.float32),
            jax.ShapeDtypeStruct((e_pad, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * e_pad * (3 * hd + 6 * 128) * 2,
            bytes_accessed=e_pad * hd * 4 * 7 + t * TILE_N * hd * 8,
            transcendentals=2 * e_pad * 128,
        ),
        interpret=interpret,
    )(tile_offsets, zs_e, zd_e, dst_tiles, g_pad, a_sel, r_mat, a_rep)

    # phase 2: permute packets to src-sorted order, segment-sum per src tile
    e2_pad = edge_tiles.src_sorted_ids.shape[0]
    c1s = jnp.take(c1, jnp.asarray(edge_tiles.gather_perm), axis=0)
    sid_tiles = jnp.asarray(edge_tiles.src_sorted_ids).reshape(
        e2_pad // TILE_E, TILE_E
    )
    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (TILE_N, hd), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE_E, hd), jnp.float32),
            pltpu.VMEM((1, TILE_E), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dzs_pad = pl.pallas_call(
        _segsum_src_kernel,
        grid_spec=grid_spec2,
        out_shape=jax.ShapeDtypeStruct((t * TILE_N, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * e2_pad * hd,
            bytes_accessed=e2_pad * hd * 4 + t * TILE_N * hd * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(edge_tiles.src_tile_offsets), c1s, sid_tiles)
    da = jnp.sum(da_parts, axis=0)  # [HD]
    return dzs_pad, dzd_pad, da


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
    bwd_impl: str = "pallas",
) -> jax.Array:
    """Drop-in replacement for ops.attention._edge_attention_xla.

    Forward runs the fused Pallas kernel; backward (custom_vjp) runs the
    fused Pallas gradient kernels (bwd_impl='pallas', default) or
    rematerializes the XLA formulation and uses its autodiff transpose
    (bwd_impl='xla', the oracle the Pallas backward is tested against).
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
    if bwd_impl == "pallas" and edge_tiles.src_sorted_ids is None:
        bwd_impl = "xla"  # tiles built by an older prepare_edge_tiles
    src_j = jnp.asarray(edge_tiles.src)
    dst_j = jnp.asarray(edge_tiles.dst)

    from gatv2_tpu.ops.attention import _edge_attention_xla

    def _gather_edges(zs, zd):
        n, h, d = zs.shape
        hd_real = h * d
        hd = -(-hd_real // 128) * 128
        zs_e = jnp.take(zs.reshape(n, hd_real), src_j, axis=0)
        zd_e = jnp.take(
            zd.reshape(n, hd_real), jnp.minimum(dst_j, num_nodes - 1), axis=0
        )
        if hd != hd_real:
            zs_e = jnp.pad(zs_e, ((0, 0), (0, hd - hd_real)))
            zd_e = jnp.pad(zd_e, ((0, 0), (0, hd - hd_real)))
        return zs_e, zd_e, hd

    @jax.custom_vjp
    def attn(zs, zd, a):
        n, h, d = zs.shape
        zs_e, zd_e, _ = _gather_edges(zs, zd)
        out = _pallas_forward(
            zs_e, zd_e, a, edge_tiles, negative_slope, interpret=interpret
        )
        return out[:num_nodes, : h * d].reshape(num_nodes, h, d)

    def fwd(zs, zd, a):
        return attn(zs, zd, a), (zs, zd, a)

    def bwd_xla(res, g):
        zs, zd, a = res
        _, vjp = jax.vjp(
            lambda zs_, zd_, a_: _edge_attention_xla(
                zs_, zd_, a_, src_j, dst_j, num_nodes,
                negative_slope=negative_slope,
            ),
            zs, zd, a,
        )
        return vjp(g)

    def bwd_pallas(res, g):
        zs, zd, a = res
        n, h, d = zs.shape
        hd_real = h * d
        zs_e, zd_e, hd = _gather_edges(zs, zd)
        n_pad = edge_tiles.padded_num_nodes
        g_pad = jnp.zeros((n_pad, hd), jnp.float32).at[:n, :hd_real].set(
            g.reshape(n, hd_real)
        )
        dzs_pad, dzd_pad, da = _pallas_backward(
            zs_e, zd_e, g_pad, a, edge_tiles, negative_slope, interpret=interpret
        )
        dzs = dzs_pad[:n, :hd_real].reshape(n, h, d)
        dzd = dzd_pad[:n, :hd_real].reshape(n, h, d)
        return dzs, dzd, da[:hd_real].reshape(h, d)

    attn.defvjp(fwd, bwd_pallas if bwd_impl == "pallas" else bwd_xla)
    return attn(zs, zd, a)
