"""Fused GATv2 attention Pallas kernels (TPU), forward and backward.

Replaces the reference's per-edge CUDA pipeline — forward: score ->
max/sumexp -> normalize -> atomicAdd aggregate (GATv2_edge_based.cu:1386-1428);
backward: grad-alpha SDDMM, O(sum deg^2) softmax Jacobian, parameter-grad
and feature-grad atomic scatters (GATv2_edge_based.cu:612-874) — with
row-blocked kernels that process 128 destination nodes at a time and stream
their (dst-sorted) edges through VMEM in double-buffered 128-edge tiles.

Forward (flash-attention-style ONLINE softmax per edge tile):
    M      = (dst_e == node_ids)                    # [TN, TE] one-hot
                                                    # selection "matrix"
    zd_e   = M^T . zd_tile                          # dst gather = MXU matmul
    s      = LeakyReLU(zs_e + zd_e)                 # [TE, HD]  VPU
    scT    = a_sel^T . s^T                          # [128, TE] MXU per-head dot
    new_m  = max(m, rowwise masked max of scT)      # running per-(node,head) max
    p      = exp(clip(sc - M^T.new_m, -80, 0))      # [TE, 128]
    l      = exp(m - new_m) * l + M . p             # running sum-exp  (MXU)
    acc    = exp(m - new_m)*acc + M . (p_rep * zs)  # running aggregate (MXU)
  out = acc / (l_rep + 1e-8);  (m, l) are emitted as residuals for backward.

Backward (custom_vjp, two selectable implementations):
  - 'pallas' (default): a dst-tiled 2-pass gradient kernel consuming the
    forward's (m, l) residuals (segment term -> d_zd / d_a / per-edge packet)
    plus a src-tiled segment-sum kernel over the transpose-graph (CSC-view)
    tiling for d_zs. Every segment reduction is a one-hot MXU matmul and the
    softmax Jacobian uses the O(E) identity
        dL/de_ij = alpha_ij (dL/dalpha_ij - sum_k alpha_kj dL/dalpha_kj)
    (SURVEY.md §3.5.3) instead of the reference's per-edge neighborhood loop
    (compute_grad_attn_score_kernel, GATv2_edge_based.cu:654-696).
  - 'xla': rematerializes the XLA formulation and uses its autodiff
    transpose (scatter-based; the correctness oracle).

Key TPU-native ideas:
  - per-destination segment reductions AND the dst-side gathers (zd, g) are
    MXU matmuls against the on-the-fly one-hot matrix M — deterministic, no
    atomics (the CUDA reference's atomicAdd scatter is the #2 hotspot,
    SURVEY.md §3.5), and no [E, HD] dst gather ever touches HBM;
  - edges are padded PER NODE TILE to 128-edge boundaries
    (prepare_edge_tiles) so every DMA is tile-aligned; padding edges carry
    dst=num_nodes and are annihilated by M;
  - all HBM edge streams are double-buffered (DMA for tile k+1 issued before
    computing tile k);
  - per-head broadcasts (max gather, head->feature expansion) are also
    matmuls (M^T . m and p . R with R[h, h*D+d] = 1), avoiding unsupported
    lane reshapes;
  - numerics match ops/segment.py: exponent clip at -80, denominator +1e-8
    (reference N:446-447, E:379).
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
TILE_E = 128  # default edges per inner step (see prepare_edge_tiles)
# Per-edge-tile fixed overhead (loop control + DMA issue latency), expressed
# in edge-equivalents of MXU work, for the auto tile_e selection below.
_TILE_COST_EDGE_EQUIV = 160

NEG_INF = -1e30
SOFTMAX_EPS = 1e-8
EXP_CLAMP = -80.0

_HIGHEST = jax.lax.Precision.HIGHEST

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,  # exact f32 (6-pass), parity mode
    # Mosaic has no HIGH (bf16x3) lowering for dot_general yet; inside the
    # kernels 'high' falls back to exact f32 (the XLA-side dense projections
    # still run bf16x3 under 'high').
    "high": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,  # bf16 inputs, f32 accumulation
}


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
    tile_e: int = TILE_E  # edges per inner step (static kernel parameter)

    @property
    def padded_num_edges(self) -> int:
        return self.src.shape[0]

    @property
    def padded_num_nodes(self) -> int:
        return self.num_node_tiles * TILE_N


def _auto_tile_e(counts_d: np.ndarray, counts_s: np.ndarray) -> int:
    """Pick edges-per-inner-step. Measured on v5e: the backward kernels are
    MXU-bound, so padded edges cost linearly, while only the forward gains
    from fewer (per-tile fixed overhead) iterations — so take the largest
    tile whose padding overhead stays under ~4%."""
    base = None
    best = TILE_E
    for te in (128, 256, 512):
        padded = 0
        for counts in (counts_d, counts_s):
            padded += int(np.sum(-(-counts // te))) * te
        if te == 128:
            base = max(padded, 1)
        elif padded <= 1.04 * base:
            best = te
    return best


def prepare_edge_tiles(
    row_ptr: np.ndarray,
    col_idx: np.ndarray,
    num_nodes: int,
    tile_e: int | None = None,
) -> EdgeTiles:
    """Build the tile-aligned edge arrays from CSR (host-side, once per graph).

    tile_e=None auto-selects the edge-tile size from the degree profile.
    """
    row_ptr = np.asarray(row_ptr, np.int64)
    num_node_tiles = max(1, -(-num_nodes // TILE_N))
    degrees = np.diff(row_ptr)
    dst_all = np.repeat(np.arange(num_nodes, dtype=np.int32), degrees)

    counts = []
    for i in range(num_node_tiles):
        lo = row_ptr[i * TILE_N]
        hi = row_ptr[min((i + 1) * TILE_N, num_nodes)]
        counts.append(int(hi - lo))
    counts = np.asarray(counts, np.int64)
    src_counts = np.bincount(
        np.minimum(col_idx, num_nodes - 1) // TILE_N, minlength=num_node_tiles
    )
    if tile_e is None:
        tile_e = _auto_tile_e(counts, src_counts)
    te = tile_e

    padded = -(-counts // te) * te
    tile_offsets = np.zeros(num_node_tiles + 1, np.int32)
    np.cumsum(padded // te, out=tile_offsets[1:])
    e_pad = int(tile_offsets[-1]) * te
    e_pad = max(e_pad, te)

    src = np.zeros(e_pad, np.int32)
    dst = np.full(e_pad, num_nodes, np.int32)
    for i in range(num_node_tiles):
        lo = int(row_ptr[i * TILE_N])
        c = int(counts[i])
        o = int(tile_offsets[i]) * te
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
    padded2 = -(-counts2 // te) * te
    src_tile_offsets = np.zeros(num_node_tiles + 1, np.int32)
    np.cumsum(padded2 // te, out=src_tile_offsets[1:])
    e2_pad = max(int(src_tile_offsets[-1]) * te, te)
    src_sorted_ids = np.full(e2_pad, num_nodes, np.int32)
    gather_perm = np.zeros(e2_pad, np.int32)
    for i in range(num_node_tiles):
        c = int(counts2[i])
        s, o = int(starts2[i]), int(src_tile_offsets[i]) * te
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
        tile_e=te,
    )


def _attention_kernel(
    # scalar prefetch
    tile_offsets_ref,  # [T+1] int32 (edge-tile units)
    # inputs
    zs_hbm,  # [E_pad, HD] ANY (gathered src projections)
    dst_hbm,  # [1, E_pad] int32 ANY
    zd_ref,  # [TILE_N, HD] VMEM blocked — dst projections for this tile
    a_sel_ref,  # [HD, 128] VMEM  (a_sel[h*D+d, h] = a[h,d])
    r_ref,  # [128, HD] VMEM  (r[h, h*D+d] = 1)
    # outputs (grid-blocked)
    out_ref,  # [TILE_N, HD] VMEM
    m_out_ref,  # [TILE_N, 128] VMEM — final per-(node, head) max (bwd residual)
    l_out_ref,  # [TILE_N, 128] VMEM — final per-(node, head) sum-exp
    # scratch
    zs_t,  # [2, tile_e, HD] double-buffered edge stream
    dst_t,  # [2, 1, tile_e] int32
    m_scr,  # [TILE_N, 128]
    l_scr,  # [TILE_N, 128]
    acc_scr,  # [TILE_N, HD]
    tmax_scr,  # [TILE_N, 128]
    sems,  # DMA semaphores (2, 2)
    *,
    num_heads: int,
    negative_slope: float,
    precision=_HIGHEST,
    tile_e: int = TILE_E,
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
    node_ids = node_base + jax.lax.broadcasted_iota(jnp.int32, (TILE_N, tile_e), 0)

    def dmas(slot, k):
        off = pl.multiple_of((t0 + k) * tile_e, tile_e)
        return (
            pltpu.make_async_copy(
                zs_hbm.at[pl.ds(off, tile_e), :], zs_t.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                dst_hbm.at[:, pl.ds(off, tile_e)], dst_t.at[slot],
                sems.at[slot, 1],
            ),
        )

    @pl.when(ntiles > 0)
    def _():
        for cp in dmas(0, 0):
            cp.start()

    def body(k, _):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < ntiles)
        def _():
            for cp in dmas(jax.lax.rem(k + 1, 2), k + 1):
                cp.start()

        for cp in dmas(slot, k):
            cp.wait()

        dst_k = dst_t[slot]  # [1, tile_e]
        mask = dst_k == node_ids  # [TILE_N, tile_e]
        mask_f = mask.astype(jnp.float32)
        # dst-side gather as a matmul: zd_e = M^T . zd_tile
        zd_e = jax.lax.dot_general(
            mask_f, zd_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [tile_e, HD]  (padding edges -> 0)
        s = zs_t[slot] + zd_e
        s = jnp.where(s > 0, s, negative_slope * s)
        # per-head attention dot, transposed: scT[h, e] = sum_f a_sel[f, h] s[e, f]
        sc_t = jax.lax.dot_general(
            a_sel_ref[:], s,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [128, tile_e]

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
            preferred_element_type=jnp.float32, precision=precision,
        )  # [128, tile_e]
        p_t = jnp.exp(jnp.clip(sc_t - m_g, EXP_CLAMP, 0.0))  # [128(h), tile_e]

        # l += M . p : contract edge dims
        l_scr[:] = c * l_scr[:] + jax.lax.dot_general(
            mask_f, p_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        # expand p to feature lanes: p_rep[e, h*D+d] = p[h, e]
        p_rep = jax.lax.dot_general(
            p_t, r_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [tile_e, HD]
        c_rep = jnp.dot(
            c, r_ref[:], preferred_element_type=jnp.float32, precision=precision
        )  # [TILE_N, HD]
        acc_scr[:] = c_rep * acc_scr[:] + jnp.dot(
            mask_f, p_rep * zs_t[slot],
            preferred_element_type=jnp.float32, precision=precision,
        )
        m_scr[:] = new_m
        return 0

    jax.lax.fori_loop(0, ntiles, body, 0)

    l_rep = jnp.dot(
        l_scr[:], r_ref[:], preferred_element_type=jnp.float32, precision=precision
    )
    out_ref[:] = acc_scr[:] / (l_rep + SOFTMAX_EPS)
    m_out_ref[:] = m_scr[:]
    l_out_ref[:] = l_scr[:]


def _pallas_forward(
    zs_e: jax.Array,  # [E_pad, HD] gathered src projections (lane-padded)
    zd_pad: jax.Array,  # [T*TILE_N, HD] dst projections (node+lane padded)
    a: jax.Array,  # [H, D]
    edge_tiles: EdgeTiles,
    negative_slope: float,
    *,
    interpret: bool = False,
    precision: str = "highest",
):
    num_heads, d = a.shape
    # zs_e arrives lane-padded to a 128 multiple (HBM slices must be 128-lane
    # aligned). Padding lanes map to no head (a_sel rows / r_mat cols zero),
    # so they stay inert.
    hd = zs_e.shape[1]
    assert hd % 128 == 0 and hd >= num_heads * d
    e_pad = edge_tiles.padded_num_edges
    t = edge_tiles.num_node_tiles
    te = edge_tiles.tile_e

    # head-selection matrices (constants wrt the graph; a_sel carries `a`)
    a_sel, r_mat, _ = _head_matrices(a, hd)

    dst_tiles = jnp.asarray(edge_tiles.dst).reshape(1, e_pad)
    tile_offsets = jnp.asarray(edge_tiles.tile_offsets)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # zs_e
            pl.BlockSpec(memory_space=pl.ANY),  # dst tiles
            pl.BlockSpec((TILE_N, hd), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_sel
            pl.BlockSpec(memory_space=pltpu.VMEM),  # r_mat
        ],
        out_specs=[
            pl.BlockSpec(
                (TILE_N, hd), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TILE_N, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TILE_N, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, te, hd), jnp.float32),
            pltpu.VMEM((2, 1, te), jnp.int32),
            pltpu.VMEM((TILE_N, 128), jnp.float32),
            pltpu.VMEM((TILE_N, 128), jnp.float32),
            pltpu.VMEM((TILE_N, hd), jnp.float32),
            pltpu.VMEM((TILE_N, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(
        _attention_kernel, num_heads=num_heads, negative_slope=negative_slope,
        precision=_PRECISIONS[precision], tile_e=te,
    )
    avg_tiles_per_node_tile = max(1, e_pad // te // t)
    out, m_stats, l_stats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t * TILE_N, hd), jnp.float32),
            jax.ShapeDtypeStruct((t * TILE_N, 128), jnp.float32),
            jax.ShapeDtypeStruct((t * TILE_N, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * (2 * hd + 3 * 128) * 2,
            bytes_accessed=e_pad * hd * 4 + t * TILE_N * hd * 8,
            transcendentals=e_pad * 128 * avg_tiles_per_node_tile,
        ),
        interpret=interpret,
    )(tile_offsets, zs_e, dst_tiles, zd_pad, a_sel, r_mat)
    return out, m_stats, l_stats  # [T*TILE_N, HD], 2x [T*TILE_N, 128]


def _attention_bwd_kernel(
    # scalar prefetch
    tile_offsets_ref,  # [T+1] int32 (edge-tile units)
    # inputs
    zs_hbm,  # [E_pad, HD] ANY (gathered src projections, rematerialized)
    dst_hbm,  # [1, E_pad] int32 ANY
    zd_ref,  # [TILE_N, HD] VMEM blocked — dst projections for this tile
    g_ref,  # [TILE_N, HD] VMEM blocked — upstream grad dL/dh for this tile
    m_ref,  # [TILE_N, 128] VMEM blocked — forward's per-(node, head) max
    l_ref,  # [TILE_N, 128] VMEM blocked — forward's per-(node, head) sum-exp
    a_sel_ref,  # [HD, 128] VMEM (a_sel[h*D+d, h] = a[h,d])
    r_ref,  # [128, HD] VMEM (r[h, h*D+d] = 1)
    a_rep_ref,  # [1, HD] VMEM (a_rep[0, h*D+d] = a[h,d])
    # outputs
    dzd_ref,  # [TILE_N, HD] VMEM blocked — dL/dzd for this dst tile
    da_ref,  # [8, HD] VMEM blocked — this tile's dL/da contribution (row 0;
    #          8 sublanes only to satisfy the (8, 128) min tile)
    c1_hbm,  # [E_pad, HD] ANY — per-edge packet, scattered to src by phase 2
    # scratch
    zs_t,  # [2, tile_e, HD] double-buffered edge stream
    dst_t,  # [2, 1, tile_e] int32
    c1_t,  # [2, tile_e, HD] double-buffered output staging
    rsum_scr,  # [TILE_N, 128] softmax-Jacobian segment term sum_k alpha*dalpha
    sems,  # DMA semaphores (2, 3): [slot, 0]=zs, [slot, 1]=dst, [slot, 2]=c1
    *,
    num_heads: int,
    negative_slope: float,
    precision=_HIGHEST,
    tile_e: int = TILE_E,
):
    """dst-tiled fused backward. The forward's per-(dst, head) softmax stats
    (m, l) arrive as residuals; two streaming passes over the tile's edges:

      B) dalpha_e = <g[dst_e], zs[src_e]>_h; accumulate the segment term
         r_j = sum_{k in N(j)} alpha_k * dalpha_k;
      C) de_e = alpha_e (dalpha_e - r[dst_e]); ds_e = (de ⊗ a) * LReLU'(s);
         d_zd[j] += sum_e ds_e (one-hot matmul);  d_a += sum_e de_e ⊗ LReLU(s);
         c1_e = alpha_e * g[dst_e] + ds_e  (consumed by _segsum_src_kernel).

    Padding edges (dst == num_nodes) produce exact zeros in every output:
    their mask column is zero, so zd_e, g_e, m_g, l_g, r_g gather to 0, hence
    dalpha = 0, de = alpha * (0 - 0) = 0, and c1 = alpha_rep * 0 + 0 = 0.
    """
    i = pl.program_id(0)
    t0 = tile_offsets_ref[i]
    ntiles = tile_offsets_ref[i + 1] - t0

    rsum_scr[:] = jnp.zeros(rsum_scr.shape, jnp.float32)
    dzd_ref[:] = jnp.zeros(dzd_ref.shape, jnp.float32)
    da_ref[:] = jnp.zeros(da_ref.shape, jnp.float32)

    node_base = i * TILE_N
    node_ids = node_base + jax.lax.broadcasted_iota(jnp.int32, (TILE_N, tile_e), 0)

    def dmas(slot, k):
        off = pl.multiple_of((t0 + k) * tile_e, tile_e)
        return (
            pltpu.make_async_copy(
                zs_hbm.at[pl.ds(off, tile_e), :], zs_t.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                dst_hbm.at[:, pl.ds(off, tile_e)], dst_t.at[slot],
                sems.at[slot, 1],
            ),
        )

    def c1_dma(slot, k):
        off = pl.multiple_of((t0 + k) * tile_e, tile_e)
        return pltpu.make_async_copy(
            c1_t.at[slot], c1_hbm.at[pl.ds(off, tile_e), :], sems.at[slot, 2]
        )

    def start_first():
        @pl.when(ntiles > 0)
        def _():
            for cp in dmas(0, 0):
                cp.start()

    def edge_alpha_dalpha(slot, mask_f):
        """Recompute (alpha_e, dalpha_e, s_raw, s_act, g_e) edge-major."""
        zd_e = jax.lax.dot_general(
            mask_f, zd_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [tile_e, HD]
        s_raw = zs_t[slot] + zd_e
        s = jnp.where(s_raw > 0, s_raw, negative_slope * s_raw)
        sc_e = jnp.dot(
            s, a_sel_ref[:], preferred_element_type=jnp.float32,
            precision=precision,
        )  # [tile_e, 128]
        m_g = jax.lax.dot_general(
            mask_f, m_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [tile_e, 128]
        l_g = jax.lax.dot_general(
            mask_f, l_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        p_e = jnp.exp(jnp.clip(sc_e - m_g, EXP_CLAMP, 0.0))
        alpha_e = p_e / (l_g + SOFTMAX_EPS)  # [tile_e, 128]
        g_e = jax.lax.dot_general(
            mask_f, g_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [tile_e, HD]
        dalpha_e = jax.lax.dot_general(
            g_e * zs_t[slot], r_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [tile_e, 128]
        return alpha_e, dalpha_e, s_raw, s, g_e

    # ---- pass B: segment term r_j = sum alpha * dalpha ------------------
    start_first()

    def body_b(k, _):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < ntiles)
        def _():
            for cp in dmas(jax.lax.rem(k + 1, 2), k + 1):
                cp.start()

        for cp in dmas(slot, k):
            cp.wait()
        mask_f = (dst_t[slot] == node_ids).astype(jnp.float32)
        alpha_e, dalpha_e, _, _, _ = edge_alpha_dalpha(slot, mask_f)
        rsum_scr[:] = rsum_scr[:] + jnp.dot(
            mask_f, alpha_e * dalpha_e,
            preferred_element_type=jnp.float32, precision=precision,
        )
        return 0

    jax.lax.fori_loop(0, ntiles, body_b, 0)

    # ---- pass C: de, d_zd, d_a, per-edge packet c1 ----------------------
    start_first()

    def body_c(k, _):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < ntiles)
        def _():
            for cp in dmas(jax.lax.rem(k + 1, 2), k + 1):
                cp.start()

        for cp in dmas(slot, k):
            cp.wait()
        # the c1 store from iteration k-2 must have drained before we
        # overwrite this slot's staging buffer
        @pl.when(k >= 2)
        def _():
            c1_dma(slot, k - 2).wait()

        mask_f = (dst_t[slot] == node_ids).astype(jnp.float32)
        alpha_e, dalpha_e, s_raw, s_act, g_e = edge_alpha_dalpha(slot, mask_f)
        r_g = jax.lax.dot_general(
            mask_f, rsum_scr[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [tile_e, 128]
        de_e = alpha_e * (dalpha_e - r_g)  # [tile_e, 128]
        de_rep = jnp.dot(
            de_e, r_ref[:], preferred_element_type=jnp.float32,
            precision=precision,
        )  # [tile_e, HD]
        lrelu_grad = jnp.where(s_raw > 0, 1.0, negative_slope)
        ds = de_rep * a_rep_ref[:] * lrelu_grad  # [tile_e, HD]
        alpha_rep = jnp.dot(
            alpha_e, r_ref[:], preferred_element_type=jnp.float32,
            precision=precision,
        )
        c1_t[slot] = alpha_rep * g_e + ds
        c1_dma(slot, k).start()
        dzd_ref[:] = dzd_ref[:] + jnp.dot(
            mask_f, ds, preferred_element_type=jnp.float32, precision=precision
        )
        da_tile = jnp.sum(de_rep * s_act, axis=0, keepdims=True)  # [1, HD]
        row0 = jax.lax.broadcasted_iota(jnp.int32, da_ref.shape, 0) == 0
        da_ref[:] = da_ref[:] + jnp.where(
            row0, jnp.broadcast_to(da_tile, da_ref.shape), 0.0
        )
        return 0

    jax.lax.fori_loop(0, ntiles, body_c, 0)

    # drain the last two c1 stores
    def drain(k, _):
        c1_dma(jax.lax.rem(k, 2), k).wait()
        return 0

    jax.lax.fori_loop(jnp.maximum(ntiles - 2, 0), ntiles, drain, 0)


def _segsum_src_kernel(
    # scalar prefetch
    src_tile_offsets_ref,  # [T+1] int32 (edge-tile units)
    # inputs
    c1s_hbm,  # [E2_pad, HD] ANY — c1 packets permuted to src-sorted order
    sid_hbm,  # [1, E2_pad] int32 ANY — src ids (num_nodes on padding)
    # outputs
    dzs_ref,  # [TILE_N, HD] VMEM blocked
    # scratch
    c1_t,  # [2, tile_e, HD]
    sid_t,  # [2, 1, tile_e] int32
    sems,  # DMA semaphores (2, 2)
    *,
    tile_e: int = TILE_E,
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
        jnp.int32, (TILE_N, tile_e), 0
    )

    def dmas(slot, k):
        off = pl.multiple_of((t0 + k) * tile_e, tile_e)
        return (
            pltpu.make_async_copy(
                c1s_hbm.at[pl.ds(off, tile_e), :], c1_t.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                sid_hbm.at[:, pl.ds(off, tile_e)], sid_t.at[slot],
                sems.at[slot, 1],
            ),
        )

    @pl.when(ntiles > 0)
    def _():
        for cp in dmas(0, 0):
            cp.start()

    def body(k, _):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < ntiles)
        def _():
            for cp in dmas(jax.lax.rem(k + 1, 2), k + 1):
                cp.start()

        for cp in dmas(slot, k):
            cp.wait()
        mask_f = (sid_t[slot] == node_ids).astype(jnp.float32)
        dzs_ref[:] = dzs_ref[:] + jnp.dot(
            mask_f, c1_t[slot],
            preferred_element_type=jnp.float32, precision=_HIGHEST,
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
    zd_pad: jax.Array,  # [T*TILE_N, HD] dst projections (node+lane padded)
    g_pad: jax.Array,  # [T*TILE_N, HD] upstream grad (node+lane padded)
    m_stats: jax.Array,  # [T*TILE_N, 128] forward softmax max (residual)
    l_stats: jax.Array,  # [T*TILE_N, 128] forward softmax sum-exp (residual)
    a: jax.Array,  # [H, D]
    edge_tiles: EdgeTiles,
    negative_slope: float,
    *,
    interpret: bool = False,
    precision: str = "highest",
):
    """Runs phase 1 (dst-tiled) and phase 2 (src-tiled) backward kernels.

    Returns (dzs_pad [T*TILE_N, HD], dzd_pad [T*TILE_N, HD], da [HD]).
    """
    num_heads, d = a.shape
    hd = zs_e.shape[1]
    e_pad = edge_tiles.padded_num_edges
    t = edge_tiles.num_node_tiles
    te = edge_tiles.tile_e
    a_sel, r_mat, a_rep = _head_matrices(a, hd)
    dst_tiles = jnp.asarray(edge_tiles.dst).reshape(1, e_pad)
    tile_offsets = jnp.asarray(edge_tiles.tile_offsets)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # zs_e
            pl.BlockSpec(memory_space=pl.ANY),  # dst tiles
            pl.BlockSpec((TILE_N, hd), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, hd), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
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
            pltpu.VMEM((2, te, hd), jnp.float32),
            pltpu.VMEM((2, 1, te), jnp.int32),
            pltpu.VMEM((2, te, hd), jnp.float32),
            pltpu.VMEM((TILE_N, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    kernel = functools.partial(
        _attention_bwd_kernel, num_heads=num_heads, negative_slope=negative_slope,
        precision=_PRECISIONS[precision], tile_e=te,
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
            flops=2 * 2 * e_pad * (3 * hd + 6 * 128) * 2,
            bytes_accessed=e_pad * hd * 4 * 3 + t * TILE_N * hd * 8,
            transcendentals=2 * e_pad * 128,
        ),
        interpret=interpret,
    )(
        tile_offsets, zs_e, dst_tiles, zd_pad, g_pad, m_stats, l_stats,
        a_sel, r_mat, a_rep,
    )

    # phase 2: permute packets to src-sorted order, segment-sum per src tile
    e2_pad = edge_tiles.src_sorted_ids.shape[0]
    c1s = jnp.take(c1, jnp.asarray(edge_tiles.gather_perm), axis=0)
    sid_tiles = jnp.asarray(edge_tiles.src_sorted_ids).reshape(1, e2_pad)
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
            pltpu.VMEM((2, te, hd), jnp.float32),
            pltpu.VMEM((2, 1, te), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    dzs_pad = pl.pallas_call(
        functools.partial(_segsum_src_kernel, tile_e=te),
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
    precision: str = "highest",
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
    n_pad = edge_tiles.padded_num_nodes

    from gatv2_tpu.ops.attention import _edge_attention_xla

    def _lane_pad(n, h, d):
        hd_real = h * d
        return hd_real, -(-hd_real // 128) * 128

    def _gather_src(zs):
        n, h, d = zs.shape
        hd_real, hd = _lane_pad(n, h, d)
        zs_e = jnp.take(zs.reshape(n, hd_real), src_j, axis=0)
        if hd != hd_real:
            zs_e = jnp.pad(zs_e, ((0, 0), (0, hd - hd_real)))
        return zs_e, hd

    def _node_pad(z, hd):
        n, h, d = z.shape
        return jnp.zeros((n_pad, hd), jnp.float32).at[:n, : h * d].set(
            z.reshape(n, h * d)
        )

    @jax.custom_vjp
    def attn(zs, zd, a):
        n, h, d = zs.shape
        zs_e, hd = _gather_src(zs)
        out, _, _ = _pallas_forward(
            zs_e, _node_pad(zd, hd), a, edge_tiles, negative_slope,
            interpret=interpret, precision=precision,
        )
        return out[:num_nodes, : h * d].reshape(num_nodes, h, d)

    def fwd(zs, zd, a):
        n, h, d = zs.shape
        zs_e, hd = _gather_src(zs)
        out, m_stats, l_stats = _pallas_forward(
            zs_e, _node_pad(zd, hd), a, edge_tiles, negative_slope,
            interpret=interpret, precision=precision,
        )
        res = (zs, zd, a, m_stats, l_stats) if bwd_impl == "pallas" else (zs, zd, a)
        return out[:num_nodes, : h * d].reshape(num_nodes, h, d), res

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
        zs, zd, a, m_stats, l_stats = res
        n, h, d = zs.shape
        hd_real = h * d
        zs_e, hd = _gather_src(zs)
        g_pad = jnp.zeros((n_pad, hd), jnp.float32).at[:n, :hd_real].set(
            g.reshape(n, hd_real)
        )
        dzs_pad, dzd_pad, da = _pallas_backward(
            zs_e, _node_pad(zd, hd), g_pad, m_stats, l_stats, a, edge_tiles,
            negative_slope, interpret=interpret, precision=precision,
        )
        dzs = dzs_pad[:n, :hd_real].reshape(n, h, d)
        dzd = dzd_pad[:n, :hd_real].reshape(n, h, d)
        return dzs, dzd, da[:hd_real].reshape(h, d)

    attn.defvjp(fwd, bwd_pallas if bwd_impl == "pallas" else bwd_xla)
    return attn(zs, zd, a)
