"""Fused GATv2 attention Pallas kernels (TPU), forward and backward.

Replaces the reference's per-edge CUDA pipeline — forward: score ->
max/sumexp -> normalize -> atomicAdd aggregate (GATv2_edge_based.cu:1386-1428);
backward: grad-alpha SDDMM, O(sum deg^2) softmax Jacobian, parameter-grad
and feature-grad atomic scatters (GATv2_edge_based.cu:612-874) — with
row-blocked kernels that process 128 destination nodes at a time and stream
their (dst-sorted) edges through VMEM in double-buffered edge tiles.

Dataflow (round 3, "streamed operands"): per-edge operands arrive
PRE-GATHERED by XLA row-gathers — HBM->VMEM DMA bandwidth the MXU-bound
kernels were not using — and one-hot MXU matmuls remain only where they do
real algorithmic work: the per-destination segment REDUCTIONS.

Forward (flash-attention-style ONLINE softmax per edge tile):
    M      = (dst_e == node_ids)                    # [TN, TE] one-hot
                                                    # selection "matrix"
    s      = LeakyReLU(zs_e + zd_e)                 # [TE, HD]  VPU
                                                    # (both streams per-edge)
    scT    = a_sel^T . s^T                          # [128, TE] MXU per-head dot
    new_m  = max(m, rowwise masked max of scT)      # running per-(node,head) max
    p      = exp(clip(sc - M^T.new_m, -80, 0))      # [TE, 128]
    l      = exp(m - new_m) * l + M . p             # running sum-exp  (MXU)
    acc    = exp(m - new_m)*acc + M . (p_rep * zs)  # running aggregate (MXU)
  out = acc / (l_rep + 1e-8);  (m, l) are emitted as residuals for backward.

Backward (custom_vjp, two selectable implementations):
  - 'pallas' (default), two node-space-only phases:
      phase 0 (pure node space, no kernel): the softmax-Jacobian segment
        term collapses by the flash-attention identity
            r_j = sum_{k in N(j)} alpha_k dalpha_k = <g_j, out_j>
        to a per-head dot of the upstream grad with the forward output
        (SURVEY.md §3.5.3 — the reference loops the whole neighborhood per
        edge, O(sum deg^2), compute_grad_attn_score_kernel E:654-696), and
        the forward stats collapse to ONE log-sum-exp offset
            sigma = m + log(l + eps),  alpha_e = exp(sc_e - sigma[dst_e])
        packed with r in a compact per-node table (_sigma_r_table) that
        streams per edge.
      phase 1 (dst-tiled): one edge pass over the [zs | zd | g | sigma_r]
        streams computing dalpha = <g[dst], zs[src]>, then
        de = alpha (dalpha - r[dst]) -> d_zd and d_a — 4 MXU products per
        edge tile.
      phase 2 (src-tiled over the transpose-graph / CSC-view tiling)
        one-hot-matmuls the per-edge packet  c1 = alpha * g[dst] + ds
        into d_zs, via one of two strategies:
          * packet fast path (unchunked): phase 1 also streams c1 to HBM;
            an XLA permute re-orders it src-sorted and _segsum_src_kernel
            reduces it — fewer passes, O(E) packet buffer;
          * streaming recompute (chunked): _bwd_src_kernel REBUILDS each
            packet from per-edge streams gathered in src-sorted order (zs
            by src, [zd | g | sigma_r] by dst) — no [E, HD] buffer or edge
            permutation ever materializes, so edge-space temporaries stay
            O(E/G).
  - 'xla': rematerializes the XLA formulation and uses its autodiff
    transpose (scatter-based; the correctness oracle).

Chunking: prepare_edge_tiles(num_chunks=G) groups node tiles into G
contiguous groups; every kernel (and its XLA-side edge gathers) runs one
group at a time, capping peak HBM at O(E/G) edge-space temporaries — this is
what lets OGBN-Products-scale graphs train full-graph on one chip.

Key TPU-native ideas:
  - per-destination segment reductions are MXU matmuls against the
    on-the-fly one-hot matrix M — deterministic, no atomics (the CUDA
    reference's atomicAdd scatter is the #2 hotspot, SURVEY.md §3.5);
    dst-side OPERANDS (zd, g, sigma_r) stream per edge instead, riding
    DMA bandwidth rather than MXU passes;
  - edges are padded PER NODE TILE to tile_e boundaries
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

NEG_INF = -1e30
SOFTMAX_EPS = 1e-8
EXP_CLAMP = -80.0
# softmax stats (m, l, r) carry one value per head; outside the kernels they
# are stored/streamed in 16 lanes instead of 128 — an 8x cut of residual and
# stream memory at Products scale. Head counts above STATS_L run as
# independent <=STATS_L-head groups (see edge_attention_pallas).
STATS_L = 16

_HIGHEST = jax.lax.Precision.HIGHEST

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,  # exact f32 (6-pass), parity mode
    # Mosaic has no HIGH lowering; 'high' = _kdot's emulated bf16x3 for
    # value-carrying matmuls with the cancellation-critical dots (scores,
    # softmax-stat gathers, dalpha/r terms) pinned to exact f32 — running
    # those in bf16x3 too was measured at ~7% gradient error.
    "high": "bf16x3",
    "default": jax.lax.Precision.DEFAULT,  # bf16 inputs, f32 accumulation
}


@dataclasses.dataclass(frozen=True)
class _TileSide:
    """One tiling direction (dst-sorted CSR view or src-sorted CSC view),
    grouped into chunks of node tiles.

    ids_grp      [G, chunk_et * te] int32 — the streamed per-edge node id
                 this side segments by (dst ids for the CSR side, src ids
                 for the CSC side), RELATIVE to the chunk's node base;
                 tiles_per_chunk * TILE_N on padding slots (matches no row).
    other_grp    [G, chunk_et * te] int32 — the opposite endpoint's GLOBAL
                 node id (src for the CSR side, dst for the CSC side);
                 0 on padding.
    rel_offsets  [G, tiles_per_chunk + 1] int32 — per-chunk edge-tile
                 offsets, relative to the chunk's base.
    """

    # stored as CONCRETE jax arrays (device-resident): closed-over concrete
    # arrays become executable parameters; numpy converted inside a trace
    # would be inlined as HLO literals (GBs for 60M-edge graphs)
    ids_grp: jax.Array
    other_grp: jax.Array
    rel_offsets: jax.Array


@dataclasses.dataclass(frozen=True)
class EdgeTiles:
    """Per-node-tile-aligned edge layout (host-precomputed, static per graph).

    Flat (ungrouped) views of the dst-sorted layout are kept for tests and
    debugging; the kernels consume the grouped _TileSide layouts.
    """

    src: jax.Array  # [E_pad] int32 (dst-sorted layout)
    dst: jax.Array  # [E_pad] int32 (num_nodes on padding)
    tile_offsets: jax.Array  # [T+1] int32, in units of EDGE TILES
    num_nodes: int
    num_node_tiles: int
    # src-sorted (CSC-view) flat layout (concrete jax arrays, see _TileSide)
    src_sorted_ids: jax.Array  # [E2_pad] int32 (num_nodes on padding)
    gather_perm: jax.Array  # [E2_pad] int32 (position in dst layout)
    src_tile_offsets: jax.Array  # [T+1] int32, edge-tile units
    # kernel parameters
    tile_e: int = TILE_E  # edges per inner step (static kernel parameter)
    num_chunks: int = 1  # node-tile groups (memory/chunking knob)
    tiles_per_chunk: int = 0  # DST node tiles per group (T padded to G*this)
    dst_side: _TileSide | None = None
    src_side: _TileSide | None = None
    # bipartite support (sharded layers: src space = GLOBAL nodes, dst
    # space = this shard's local nodes). Monopartite graphs have
    # num_src_nodes == num_nodes and equal tile counts.
    num_src_nodes: int = -1  # -1 -> same as num_nodes
    src_tiles_per_chunk: int = -1  # -1 -> same as tiles_per_chunk

    @property
    def padded_num_edges(self) -> int:
        return self.src.shape[0]

    @property
    def padded_num_nodes(self) -> int:
        """Padded DST-space node count."""
        return self.num_chunks * self.tiles_per_chunk * TILE_N

    @property
    def src_num_nodes(self) -> int:
        return self.num_nodes if self.num_src_nodes < 0 else self.num_src_nodes

    @property
    def padded_src_nodes(self) -> int:
        t = (
            self.tiles_per_chunk
            if self.src_tiles_per_chunk < 0
            else self.src_tiles_per_chunk
        )
        return self.num_chunks * t * TILE_N


# EdgeTiles / _TileSide are pytrees so they can be passed as jit ARGUMENTS:
# closed-over arrays would be baked into the HLO as literals (GBs for
# 60M-edge graphs); as arguments they are runtime buffers.
jax.tree_util.register_pytree_node(
    _TileSide,
    lambda t: ((t.ids_grp, t.other_grp, t.rel_offsets), None),
    lambda _, ch: _TileSide(*ch),
)
jax.tree_util.register_pytree_node(
    EdgeTiles,
    lambda e: (
        (
            e.src, e.dst, e.tile_offsets, e.src_sorted_ids, e.gather_perm,
            e.src_tile_offsets, e.dst_side, e.src_side,
        ),
        (e.num_nodes, e.num_node_tiles, e.tile_e, e.num_chunks,
         e.tiles_per_chunk, e.num_src_nodes, e.src_tiles_per_chunk),
    ),
    lambda aux, ch: EdgeTiles(
        src=ch[0], dst=ch[1], tile_offsets=ch[2], src_sorted_ids=ch[3],
        gather_perm=ch[4], src_tile_offsets=ch[5], dst_side=ch[6],
        src_side=ch[7], num_nodes=aux[0], num_node_tiles=aux[1],
        tile_e=aux[2], num_chunks=aux[3], tiles_per_chunk=aux[4],
        num_src_nodes=aux[5], src_tiles_per_chunk=aux[6],
    ),
)


def _kdot(a, b, dimension_numbers, precision, sensitive=False, exact_arg=None):
    """dot_general with an emulated bf16x3 tier and an exact selector tier.

    Mosaic can't lower Precision.HIGH, so 'high' maps to the classic
    hi/lo-split: A.B ~= Ah.Bh + Ah.Bl + Al.Bh with single-pass bf16
    multiplies and f32 accumulation — ~2x the MXU throughput of exact f32
    (6 passes) at ~1e-6 relative error. One-hot mask operands are exactly
    representable in bf16, so their lo-terms contribute exact zeros.

    sensitive=True keeps exact f32 even under 'bf16x3': attention scores
    and the softmax-Jacobian terms sit inside subtractions whose
    cancellation amplifies rounding into the gradients (~7% measured when
    everything runs bf16x3).

    exact_arg (0 or 1): that operand is EXACTLY bf16-representable (0/1
    one-hot masks and selector matrices — the vast majority of this file's
    structural FLOPs). The other operand then splits into THREE bf16 terms
    x1+x2+x3 capturing all 24 significand bits (each residual subtraction
    is exact, and the final residual fits bf16's 8-bit significand), so
    three single-pass bf16 matmuls reproduce the same products the 6-pass
    HIGHEST emulation would (the selector's own split terms are exact
    zeros) — 2x the MXU throughput at the same precision class. Used for
    every mask/selector product under both 'highest' and 'high';
    'default' stays single-pass.

    precision == "f32" (interpret mode, see _prec_for): plain HIGHEST
    dot_generals with exact_arg ignored — on the CPU interpreter HIGHEST
    is a true f32 matmul, strictly more accurate than any bf16 split and
    free, so the emulation would only add noise there.
    """
    if precision == "f32":
        precision = _HIGHEST
        exact_arg = None
    if exact_arg is not None and precision in (_HIGHEST, "bf16x3"):
        bf = jnp.bfloat16
        m, x = (a, b) if exact_arg == 0 else (b, a)
        m_bf = m.astype(bf)
        x1 = x.astype(bf)
        r1 = x - x1.astype(jnp.float32)
        x2 = r1.astype(bf)
        x3 = (r1 - x2.astype(jnp.float32)).astype(bf)

        def d(xx):
            ops = (m_bf, xx) if exact_arg == 0 else (xx, m_bf)
            return jax.lax.dot_general(
                ops[0], ops[1], dimension_numbers=dimension_numbers,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        return d(x1) + d(x2) + d(x3)
    if precision == "bf16x3" and sensitive:
        precision = _HIGHEST
    if precision == "bf16x3":
        bf = jnp.bfloat16
        a_hi = a.astype(bf)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(bf)
        b_hi = b.astype(bf)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(bf)

        def d(x, y):
            return jax.lax.dot_general(
                x, y, dimension_numbers=dimension_numbers,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)
    return jax.lax.dot_general(
        a, b, dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.float32, precision=precision,
    )


def _prec_for(precision_name: str, interpret: bool):
    """Kernel-internal precision token. In interpret mode 'highest' maps to
    the sentinel "f32" (true f32 matmuls, no bf16 splitting) — see _kdot."""
    if interpret and precision_name == "highest":
        return "f32"
    return _PRECISIONS[precision_name]


def _take(x, ids):
    """Row gather with mode='clip'. Every index these wrappers stream is
    in-bounds by construction (padding slots are pre-clamped onto appended
    zero rows or point at zero packets), but jnp.take's default
    mode='fill' lowers to gather + a full-width oob-select pass that
    re-streams the whole [E, hd] edge stream through HBM (measured via
    tools/profile_roofline.py). mode='clip' keeps only the index clamp
    the gather hardware needs anyway."""
    return jnp.take(x, ids, axis=0, mode="clip")


def _vmem_cap_tile_e(max_hd: int) -> int:
    """Largest te whose double-buffered backward scratch fits VMEM.

    The widest kernel (_bwd_dst_chunk, emit_c1) stages zs [2,te,hd],
    xg [2,te,2hd+128] and c1 [2,te,hd] — 8*te*(4*hd + 128) bytes of f32
    scratch — plus ~1.5 MB of blocked inputs/outputs. Budget 12 MB of the
    ~16 MB/core so the compiler keeps working room."""
    budget = 12 << 20
    cap = budget // (8 * (4 * max_hd + 128))
    return max(TILE_E, (cap // TILE_E) * TILE_E)


def _auto_tile_e(
    counts_d: np.ndarray, counts_s: np.ndarray, max_hd: int | None = None
) -> int:
    """Pick edges-per-inner-step. Measured on v5e: the backward kernels are
    MXU-bound, so padded edges cost linearly, while only the forward gains
    from fewer (per-tile fixed overhead) iterations — so take the largest
    tile whose padding overhead stays under ~4% (and whose scratch fits
    VMEM when the caller knows the widest layer's lane count)."""
    cap = _vmem_cap_tile_e(max_hd) if max_hd else 512
    base = None
    best = TILE_E
    for te in (128, 256, 512):
        padded = 0
        for counts in (counts_d, counts_s):
            padded += int(np.sum(-(-counts // te))) * te
        if te == 128:
            base = max(padded, 1)
        elif te <= cap and padded <= 1.04 * base:
            best = te
    return best


def _group_side(
    ids: np.ndarray,  # [E_pad] segment ids (num_nodes pad)
    other: np.ndarray,  # [E_pad] opposite endpoint (any value on pad)
    tile_offsets: np.ndarray,  # [T+1] edge-tile units
    num_nodes: int,
    num_chunks: int,
    tiles_per_chunk: int,
    te: int,
    min_chunk_et: int | None = None,  # force width (static cross-batch shapes)
) -> _TileSide:
    t_pad = num_chunks * tiles_per_chunk
    ext = np.concatenate(
        [tile_offsets, np.full(t_pad + 1 - len(tile_offsets), tile_offsets[-1])]
    ).astype(np.int64)
    chunk_et = min_chunk_et or 1
    for g in range(num_chunks):
        chunk_et = max(
            chunk_et, int(ext[(g + 1) * tiles_per_chunk] - ext[g * tiles_per_chunk])
        )
    pad_id = tiles_per_chunk * TILE_N
    ids_grp = np.full((num_chunks, chunk_et * te), pad_id, np.int32)
    other_grp = np.zeros((num_chunks, chunk_et * te), np.int32)
    rel = np.zeros((num_chunks, tiles_per_chunk + 1), np.int32)
    for g in range(num_chunks):
        lo = int(ext[g * tiles_per_chunk])
        hi = int(ext[(g + 1) * tiles_per_chunk])
        c = (hi - lo) * te
        seg = ids[lo * te : hi * te].astype(np.int64)
        node_base = g * tiles_per_chunk * TILE_N
        ids_grp[g, :c] = np.where(
            seg < num_nodes, seg - node_base, pad_id
        ).astype(np.int32)
        other_grp[g, :c] = other[lo * te : hi * te]
        rel[g] = (ext[g * tiles_per_chunk : (g + 1) * tiles_per_chunk + 1] - lo).astype(
            np.int32
        )
    return _TileSide(
        ids_grp=jnp.asarray(ids_grp),
        other_grp=jnp.asarray(other_grp),
        rel_offsets=jnp.asarray(rel),
    )


def prepare_edge_tiles(
    row_ptr: np.ndarray,
    col_idx: np.ndarray,
    num_nodes: int,
    tile_e: int | None = None,
    num_chunks: int = 1,
    num_src_nodes: int | None = None,
    fixed_edge_tiles: int | None = None,
    max_hd: int | None = None,  # widest layer's lane count (VMEM-caps te)
) -> EdgeTiles:
    """Build the tile-aligned edge layouts from CSR (host-side, once per
    graph).

    tile_e=None auto-selects the edge-tile size from the degree profile.
    num_chunks=G bounds edge-space HBM temporaries at O(E/G) during
    training (see module docstring); 1 = no chunking.
    num_src_nodes: for BIPARTITE edge sets (sharded layers: col_idx holds
    GLOBAL source ids while row_ptr covers this shard's local destinations).
    Default: same node space on both sides.
    fixed_edge_tiles: force BOTH sides' total edge-tile counts to this
    static value (error if the real layout needs more). This keeps every
    EdgeTiles array shape constant across graphs with the same node budget,
    so per-batch tilings (minibatch mode) reuse one compiled step — the
    tiles are jit ARGUMENTS, not compile-time constants.
    """
    row_ptr = np.asarray(row_ptr, np.int64)
    ns = num_nodes if num_src_nodes is None else num_src_nodes
    num_node_tiles = max(1, -(-num_nodes // TILE_N))
    num_src_tiles = max(1, -(-ns // TILE_N))
    degrees = np.diff(row_ptr)
    dst_all = np.repeat(np.arange(num_nodes, dtype=np.int32), degrees)
    num_edges = dst_all.shape[0]

    # per-dst-tile edge counts: CSR rows are contiguous, so a tile's count
    # is one row_ptr difference (vectorized). The FILL loops below stay
    # Python loops deliberately: each iteration is one contiguous slice
    # copy (CSR order), which measures ~5x faster at Products scale than
    # a vectorized fancy-index scatter and its 8M-element temporaries.
    tile_row_lo = row_ptr[
        np.minimum(np.arange(num_node_tiles) * TILE_N, num_nodes)
    ]
    tile_row_hi = row_ptr[
        np.minimum((np.arange(num_node_tiles) + 1) * TILE_N, num_nodes)
    ]
    counts = (tile_row_hi - tile_row_lo).astype(np.int64)
    src_counts = np.bincount(
        np.minimum(col_idx, ns - 1) // TILE_N, minlength=num_src_tiles
    )
    if tile_e is None:
        tile_e = _auto_tile_e(counts, src_counts, max_hd)
    te = tile_e

    padded = -(-counts // te) * te
    tile_offsets = np.zeros(num_node_tiles + 1, np.int32)
    np.cumsum(padded // te, out=tile_offsets[1:])
    e_pad = int(tile_offsets[-1]) * te
    e_pad = max(e_pad, te)

    src = np.zeros(e_pad, np.int32)
    dst = np.full(e_pad, num_nodes, np.int32)
    for i in range(num_node_tiles):
        lo = int(tile_row_lo[i])
        c = int(counts[i])
        o = int(tile_offsets[i]) * te
        src[o : o + c] = col_idx[lo : lo + c]
        dst[o : o + c] = dst_all[lo : lo + c]

    # --- src-sorted mirror (backward d_zs path) -------------------------
    # positions of real edges in the dst-sorted padded layout, stably
    # re-sorted by src node -> per-src-tile contiguous ranges, padded to
    # te boundaries exactly like the dst layout.
    real_pos = np.nonzero(dst < num_nodes)[0].astype(np.int32)
    order = np.argsort(src[real_pos], kind="stable")
    pos_sorted = real_pos[order]
    src_sorted = src[pos_sorted]
    tile_of_edge = src_sorted // TILE_N
    counts2 = np.bincount(tile_of_edge, minlength=num_src_tiles)
    starts2 = np.concatenate([[0], np.cumsum(counts2)])
    padded2 = -(-counts2 // te) * te
    src_tile_offsets = np.zeros(num_src_tiles + 1, np.int32)
    np.cumsum(padded2 // te, out=src_tile_offsets[1:])
    e2_pad = max(int(src_tile_offsets[-1]) * te, te)
    # padding slots carry the PADDED src-grid size: when ns is not a lane
    # multiple, row `ns` is a live row of the padded node grid and a pad id
    # of ns would one-hot-match it in _segsum_src_kernel, adding garbage
    # packets into d_zs[ns] (round-2 review finding)
    ns_pad_id = num_src_tiles * TILE_N
    src_sorted_ids = np.full(e2_pad, ns_pad_id, np.int32)
    gather_perm = np.zeros(e2_pad, np.int32)
    for i in range(num_src_tiles):
        c = int(counts2[i])
        s, o = int(starts2[i]), int(src_tile_offsets[i]) * te
        src_sorted_ids[o : o + c] = src_sorted[s : s + c]
        gather_perm[o : o + c] = pos_sorted[s : s + c]

    if fixed_edge_tiles is not None:
        if num_chunks != 1:
            raise ValueError("fixed_edge_tiles requires num_chunks == 1")
        for name, used in (
            ("dst", int(tile_offsets[-1])),
            ("src", int(src_tile_offsets[-1])),
        ):
            if used > fixed_edge_tiles:
                raise ValueError(
                    f"fixed_edge_tiles={fixed_edge_tiles} too small for the "
                    f"{name} layout ({used} edge tiles needed)"
                )

        want = fixed_edge_tiles * te

        def widen(arr, fill):
            out = np.full(want, fill, arr.dtype)
            out[: arr.shape[0]] = arr
            return out

        dst = widen(dst, num_nodes)  # extra slots: padding edges
        src = widen(src, 0)
        src_sorted_ids = widen(src_sorted_ids, ns_pad_id)
        gather_perm = widen(gather_perm, 0)
        e_pad = e2_pad = want

    num_chunks = max(1, min(num_chunks, num_node_tiles))
    tiles_per_chunk = -(-num_node_tiles // num_chunks)
    src_tiles_per_chunk = -(-num_src_tiles // num_chunks)

    dst_side = _group_side(
        dst, src, tile_offsets, num_nodes, num_chunks, tiles_per_chunk, te,
        min_chunk_et=fixed_edge_tiles,
    )
    # the CSC side streams src ids and gathers by the edges' dst ids
    dst_of_src = np.zeros(e2_pad, np.int32)
    real2 = src_sorted_ids < ns
    dst_of_src[real2] = dst[gather_perm[real2]]
    src_side = _group_side(
        src_sorted_ids, dst_of_src, src_tile_offsets, ns,
        num_chunks, src_tiles_per_chunk, te,
        min_chunk_et=fixed_edge_tiles,
    )

    if num_chunks > 1:
        # the flat layouts back only the G=1 packet path and the XLA-bwd
        # fallback; chunked graphs use the grouped layouts exclusively, so
        # don't keep ~GBs of unused flat metadata on device
        src = dst = np.zeros(1, np.int32)
        tile_offsets = src_tile_offsets = np.zeros(1, np.int32)
        src_sorted_ids = gather_perm = np.zeros(1, np.int32)

    return EdgeTiles(
        src=jnp.asarray(src),
        dst=jnp.asarray(dst),
        tile_offsets=jnp.asarray(tile_offsets),
        num_nodes=num_nodes,
        num_node_tiles=num_node_tiles,
        src_sorted_ids=jnp.asarray(src_sorted_ids),
        gather_perm=jnp.asarray(gather_perm),
        src_tile_offsets=jnp.asarray(src_tile_offsets),
        tile_e=te,
        num_chunks=num_chunks,
        tiles_per_chunk=tiles_per_chunk,
        dst_side=dst_side,
        src_side=src_side,
        num_src_nodes=-1 if num_src_nodes is None else num_src_nodes,
        src_tiles_per_chunk=(
            -1 if num_src_nodes is None else src_tiles_per_chunk
        ),
    )


def edge_tiles_from_native(
    raw: dict, max_nodes: int, te: int, fixed_edge_tiles: int
) -> EdgeTiles:
    """Wrap native emit_tiles output (utils.native_loader.emit_tiles) into
    an EdgeTiles, bypassing the numpy tile-prep loops. Only the fixed-budget
    num_chunks=1 minibatch shape is supported (the G=1 grouped layouts are
    reshaped views of the flat ones: node base 0, pad id == max_nodes)."""
    num_node_tiles = max_nodes // TILE_N
    want = fixed_edge_tiles * te
    if raw["src"].shape[0] != want:
        raise ValueError(
            f"native tile arrays hold {raw['src'].shape[0]} edge slots but "
            f"fixed_edge_tiles={fixed_edge_tiles} x te={te} = {want}"
        )
    # leaves stay NUMPY: per-batch tiles cross to the device exactly once
    # (inside the jit call); jnp conversion here would add a device round
    # trip per batch in the DP stack path (stack_batches pulls them back)
    dst_side = _TileSide(
        ids_grp=raw["dst"][None],
        other_grp=raw["src"][None],
        rel_offsets=raw["tile_offsets"][None],
    )
    src_side = _TileSide(
        ids_grp=raw["src_sorted_ids"][None],
        other_grp=raw["dst_of_src"][None],
        rel_offsets=raw["src_tile_offsets"][None],
    )
    return EdgeTiles(
        src=raw["src"],
        dst=raw["dst"],
        tile_offsets=raw["tile_offsets"],
        num_nodes=max_nodes,
        num_node_tiles=num_node_tiles,
        src_sorted_ids=raw["src_sorted_ids"],
        gather_perm=raw["gather_perm"],
        src_tile_offsets=raw["src_tile_offsets"],
        tile_e=te,
        num_chunks=1,
        tiles_per_chunk=num_node_tiles,
        dst_side=dst_side,
        src_side=src_side,
    )


def setup_full_graph(
    graph, heads, out_dims, *, labels=None, budget_bytes=None, tile_e=None
):
    """One-stop full-graph Pallas setup shared by the Trainer, bench, and
    predict: builds the (auto-chunked) edge tiling and pads the node dim of
    features/labels ONCE so no padded activation copies materialize inside
    the step.

    labels: override (e.g. split-masked) label array; default graph.labels.
    Returns (edge_tiles, features, labels, num_valid) where num_valid is
    None when no padding row was added. Padding labels are -1 (ignored by
    the loss).
    """
    e = graph.num_edges
    if budget_bytes is None:
        budget_bytes = default_chunk_budget(e)
    max_hd = max(-(-h * d // 128) * 128 for h, d in zip(heads, out_dims))
    # per-KERNEL lane width: >STATS_L-head layers run as <=16-head groups
    kernel_hd = max(
        -(-min(h, STATS_L) * d // 128) * 128 for h, d in zip(heads, out_dims)
    )
    et = prepare_edge_tiles(
        graph.row_ptr, graph.col_idx, graph.num_nodes, tile_e=tile_e,
        num_chunks=suggest_num_chunks(e, max_hd, budget_bytes=budget_bytes),
        max_hd=kernel_hd,
    )
    feats = graph.features
    labels = graph.labels if labels is None else labels
    num_valid = None
    n, n_pad = graph.num_nodes, et.padded_num_nodes
    if n_pad != n:
        f_pad = np.zeros((n_pad, graph.feature_dim), np.float32)
        f_pad[:n] = graph.features
        l_pad = np.full(n_pad, -1, np.int32)
        l_pad[:n] = labels
        feats, labels, num_valid = f_pad, l_pad, n
    return et, feats, labels, num_valid


def default_chunk_budget(num_edges: int) -> int:
    """Edge-temporary HBM budget for auto-chunking — THE single policy
    shared by setup_full_graph (pallas + sell) and bench's sharded path
    (previously three drifting copies).

    6 GB below 30M edges: big enough that arxiv-scale graphs (~5.4 GB
    unchunked emit_c1 live set at hd=256) keep the fast packet path —
    round 3 ran arxiv chunked under a 4 GB budget and paid ~1.5x epoch
    time for the 2hd+128-lane phase-2b recompute streams. 2 GB at >=30M
    edges: products-full keeps enough HBM headroom for its feature matrix
    and per-layer activations on a 16 GB chip."""
    return (2 << 30) if num_edges >= 30_000_000 else (6 << 30)


def suggest_num_chunks(
    num_edges: int, max_hd: int, *, budget_bytes: int = 4 << 30
) -> int:
    """Chunk count so edge-space temporaries stay under budget_bytes.

    Two regimes with different live sets:
    - UNCHUNKED (G=1): backward phase 1 runs emit_c1, whose simultaneous
      live set is zs [E, hd] + [zd | g | sigma_r] [E, 2*hd + 128] + the c1
      packet output [E, hd] = (4*hd + 128) f32 lanes per edge — G=1 is only
      chosen if THAT fits the budget.
    - CHUNKED (G>1): the widest live set is phase 2b (no c1 buffer): zs
      [E/G, hd] + the stream [E/G, 2*hd + 128], i.e. (3*hd + 128) lanes
      (phase 1 without emit_c1 is the same width; the forward is
      narrower)."""
    if num_edges * (4 * max_hd + 128) * 4 <= budget_bytes:
        return 1
    need = num_edges * (3 * max_hd + 128) * 4
    return max(2, -(-need // budget_bytes))


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _attention_kernel(
    # scalar prefetch
    tile_offsets_ref,  # [T+1] int32 (edge-tile units, chunk-relative)
    # inputs
    zs_hbm,  # [E_chunk, HD] ANY (gathered src projections)
    zd_hbm,  # [E_chunk, HD] ANY (gathered dst projections; 0 on padding)
    dst_hbm,  # [1, E_chunk] int32 ANY
    a_sel_ref,  # [HD, 128] VMEM  (a_sel[h*D+d, h] = a[h,d])
    r_ref,  # [128, HD] VMEM  (r[h, h*D+d] = 1)
    # outputs (grid-blocked)
    out_ref,  # [TILE_N, HD] VMEM
    m_out_ref,  # [TILE_N, 128] VMEM — final per-(node, head) max (bwd residual)
    l_out_ref,  # [TILE_N, 128] VMEM — final per-(node, head) sum-exp
    # scratch
    zs_t,  # [2, tile_e, HD] double-buffered edge stream
    zd_t,  # [2, tile_e, HD]
    dst_t,  # [2, 1, tile_e] int32
    m_scr,  # [TILE_N, 128]
    l_scr,  # [TILE_N, 128]
    acc_scr,  # [TILE_N, HD]
    tmax_scr,  # [TILE_N, 128]
    sems,  # DMA semaphores (2, 3)
    *,
    num_heads: int,
    negative_slope: float,
    precision=_HIGHEST,
    tile_e: int = TILE_E,
    normalize: bool = True,  # False: emit the UNNORMALIZED accumulator
    #   u = sum exp(e - m)·zs (multi-pass softmax merge, see
    #   edge_attention_pallas_merge); m/l outputs are unchanged
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

    node_ids = i * TILE_N + jax.lax.broadcasted_iota(
        jnp.int32, (TILE_N, tile_e), 0
    )

    def dmas(slot, k):
        off = pl.multiple_of((t0 + k) * tile_e, tile_e)
        return (
            pltpu.make_async_copy(
                zs_hbm.at[pl.ds(off, tile_e), :], zs_t.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                zd_hbm.at[pl.ds(off, tile_e), :], zd_t.at[slot], sems.at[slot, 1]
            ),
            pltpu.make_async_copy(
                dst_hbm.at[:, pl.ds(off, tile_e)], dst_t.at[slot],
                sems.at[slot, 2],
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
        # zd arrives per-edge from the XLA row-gather (free DMA bandwidth;
        # the in-kernel one-hot gather matmul this replaces was an MXU pass
        # per tile at a 128x structural-FLOP factor)
        s = zs_t[slot] + zd_t[slot]
        s = jnp.where(s > 0, s, negative_slope * s)
        # per-head attention dot, transposed: scT[h, e] = sum_f a_sel[f, h] s[e, f]
        sc_t = _kdot(a_sel_ref[:], s, (((0,), (1,)), ((), ())), precision,
                     sensitive=True)  # [128, tile_e]

        # masked per-(node, head) max of this tile
        for h in range(num_heads):
            tmax_scr[:, h : h + 1] = jnp.max(
                jnp.where(mask, sc_t[h : h + 1, :], NEG_INF), axis=1, keepdims=True
            )
        m_prev = m_scr[:]
        new_m = jnp.maximum(m_prev, tmax_scr[:])
        c = jnp.exp(m_prev - new_m)  # [TILE_N, 128] rescale factor

        # gather each edge's dst max: m_g[h, e] = sum_n new_m[n, h] mask[n, e]
        m_g = _kdot(new_m, mask_f, (((0,), (0,)), ((), ())), precision,
                    exact_arg=1)  # [128, tile_e]
        p_t = jnp.exp(jnp.clip(sc_t - m_g, EXP_CLAMP, 0.0))  # [128(h), tile_e]

        # l += M . p : contract edge dims
        l_scr[:] = c * l_scr[:] + _kdot(mask_f, p_t, (((1,), (1,)), ((), ())), precision, exact_arg=0)
        # expand p to feature lanes: p_rep[e, h*D+d] = p[h, e]
        p_rep = _kdot(p_t, r_ref[:], (((0,), (0,)), ((), ())), precision, exact_arg=1)  # [tile_e, HD]
        c_rep = _kdot(c, r_ref[:], (((1,), (0,)), ((), ())), precision, exact_arg=1)  # [TILE_N, HD]
        acc_scr[:] = c_rep * acc_scr[:] + _kdot(mask_f, p_rep * zs_t[slot], (((1,), (0,)), ((), ())), precision, exact_arg=0)
        m_scr[:] = new_m
        return 0

    jax.lax.fori_loop(0, ntiles, body, 0)

    if normalize:
        l_rep = _kdot(l_scr[:], r_ref[:], (((1,), (0,)), ((), ())), precision, exact_arg=1)
        out_ref[:] = acc_scr[:] / (l_rep + SOFTMAX_EPS)
    else:
        out_ref[:] = acc_scr[:]
    m_out_ref[:] = m_scr[:]
    l_out_ref[:] = l_scr[:]


def _forward_chunk(
    zs_e: jax.Array,  # [E_chunk, HD] gathered src projections (lane-padded)
    zd_e: jax.Array,  # [E_chunk, HD] gathered dst projections (0 on padding)
    dst_flat: jax.Array,  # [1, E_chunk] int32
    rel_offsets: jax.Array,  # [T_c+1] int32
    a_sel: jax.Array,
    r_mat: jax.Array,
    *,
    num_heads: int,
    negative_slope: float,
    te: int,
    precision: str,
    interpret: bool,
    normalize: bool = True,
):
    t_c = rel_offsets.shape[0] - 1
    hd = zs_e.shape[1]
    e_chunk = zs_e.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_c,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # zs_e
            pl.BlockSpec(memory_space=pl.ANY),  # zd_e
            pl.BlockSpec(memory_space=pl.ANY),  # dst ids
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_sel
            pl.BlockSpec(memory_space=pltpu.VMEM),  # r_mat
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, hd), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, te, hd), jnp.float32),
            pltpu.VMEM((2, te, hd), jnp.float32),
            pltpu.VMEM((2, 1, te), jnp.int32),
            pltpu.VMEM((TILE_N, 128), jnp.float32),
            pltpu.VMEM((TILE_N, 128), jnp.float32),
            pltpu.VMEM((TILE_N, hd), jnp.float32),
            pltpu.VMEM((TILE_N, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    kernel = functools.partial(
        _attention_kernel, num_heads=num_heads, negative_slope=negative_slope,
        precision=_prec_for(precision, interpret), tile_e=te, normalize=normalize,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_c * TILE_N, hd), jnp.float32),
            jax.ShapeDtypeStruct((t_c * TILE_N, 128), jnp.float32),
            jax.ShapeDtypeStruct((t_c * TILE_N, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * e_chunk * (2 * hd + 3 * 128) * 2,
            bytes_accessed=e_chunk * hd * 8 + t_c * TILE_N * hd * 4,
            transcendentals=e_chunk * 128,
        ),
        interpret=interpret,
    )(rel_offsets, zs_e, zd_e, dst_flat, a_sel, r_mat)


# ---------------------------------------------------------------------------
# backward phase 1 (dst-tiled): d_zd, d_a, softmax-Jacobian segment term r
# ---------------------------------------------------------------------------


def _sigma_r_table(m16, l16, rsum16):
    """Compact per-node backward softmax stats, [n, 128]:

      lanes [0, STATS_L)          sigma = m + log(l + eps)
      lanes [STATS_L, 2*STATS_L)  r     (softmax-Jacobian segment term
                                         <g, out>, see bwd_pallas)
      lanes beyond                0

    sigma is the log-sum-exp offset: alpha_e = exp(sc_e - sigma[dst_e])
    replaces exp(sc - m[dst]) / (l[dst] + eps) — the two forward stats
    collapse into ONE per-edge streamed value and the division disappears.
    Isolated nodes (m == -1e30, l == 0) give sigma ~ -1e30: finite, and no
    edge references them. sc <= m <= sigma for any node WITH edges (its max
    edge contributes exp(0) = 1 to l, so log(l + eps) >= 0), hence
    clip(sc - sigma, -80, 0) never clips a real value at the top."""
    sigma = m16 + jnp.log(l16 + SOFTMAX_EPS)
    return jnp.pad(
        jnp.concatenate([sigma, rsum16], axis=1),
        ((0, 0), (0, 128 - 2 * STATS_L)),
    )


def _edge_backward_core(
    zs_e, zd_e, g_e, sr, a_sel, r_mat, precision, negative_slope,
    tile_e, want_c1,
):
    """Shared per-edge backward math for the dst-tiled (phase 1) and
    src-tiled (phase 2b) kernels — all inputs are EDGE-MAJOR [tile_e, .]
    (pre-gathered by the caller: XLA row-gathers for off-tile operands,
    the in-tile one-hot matmul for the tile's own side). Keeping it in ONE
    place guarantees both phases use bit-identical math.

    sr is the compact [tile_e, 128] sigma_r stream (_sigma_r_table rows
    gathered by dst): sigma in lanes [0, STATS_L), r in the next STATS_L
    lanes — ONE lane-roll (VPU) stands in for the separate m/l/r gather
    matmuls of the round-2 design. Lane hygiene: lanes >= num_heads of
    alpha are finite garbage (exp of clipped junk, <= 1) and lanes
    [112, 128) of r_g hold wrapped sigma values (|.| up to 1e30) — every
    consumer multiplies by r_mat/a-selector rows that are exactly zero
    there, so they never reach an output (0 * huge == 0; nothing is inf).

    Returns (de_rep, alpha_rep_or_None, s_raw, s_act).
    """
    s_raw = zs_e + zd_e
    s_act = jnp.where(s_raw > 0, s_raw, negative_slope * s_raw)
    sc_e = _kdot(s_act, a_sel, (((1,), (0,)), ((), ())), precision,
                 sensitive=True)  # [tile_e, 128]
    alpha_e = jnp.exp(jnp.clip(sc_e - sr, EXP_CLAMP, 0.0))
    r_g = pltpu.roll(sr, shift=128 - STATS_L, axis=1)  # lane h <- h+STATS_L
    dalpha_e = _kdot(g_e * zs_e, r_mat, (((1,), (1,)), ((), ())),
                     precision, exact_arg=1)  # [tile_e, 128]
    de_e = alpha_e * (dalpha_e - r_g)
    if want_c1:
        # one fused head->feature expansion for de AND alpha
        both = jnp.concatenate([de_e, alpha_e], axis=0)  # [2*tile_e, 128]
        both_rep = _kdot(both, r_mat, (((1,), (0,)), ((), ())), precision,
                         exact_arg=1)  # [2*tile_e, HD]
        de_rep = both_rep[:tile_e]
        alpha_rep = both_rep[tile_e:]
    else:
        de_rep = _kdot(de_e, r_mat, (((1,), (0,)), ((), ())), precision,
                       exact_arg=1)
        alpha_rep = None
    return de_rep, alpha_rep, s_raw, s_act


def _bwd_dst_kernel(
    # scalar prefetch
    tile_offsets_ref,  # [T_c+1] int32 (chunk-relative edge-tile units)
    # inputs
    zs_hbm,  # [E_chunk, HD] ANY (gathered src projections, rematerialized)
    xg_hbm,  # [E_chunk, 2*HD+128] ANY — per-edge [zd | g | sigma_r], row-
    #          gathered by dst in XLA (zero rows on padding edges)
    dst_hbm,  # [1, E_chunk] int32 ANY (chunk-relative dst ids, pad == rows)
    a_sel_ref,  # [HD, 128] VMEM (a_sel[h*D+d, h] = a[h,d])
    r_ref,  # [128, HD] VMEM (r[h, h*D+d] = 1)
    a_rep_ref,  # [1, HD] VMEM (a_rep[0, h*D+d] = a[h,d])
    # outputs
    dzd_ref,  # [TILE_N, HD] VMEM blocked — dL/dzd for this dst tile
    da_ref,  # [8, HD] VMEM blocked — this tile's dL/da contribution (row 0;
    #          8 sublanes only to satisfy the (8, 128) min tile)
    *rest,  # with emit_c1: c1_hbm output [E_chunk, HD] ANY, then scratch
    #         (zs_t, xg_t, dst_t, [c1_t], sems)
    num_heads: int,
    negative_slope: float,
    emit_c1: bool = False,
    precision=_HIGHEST,
    tile_e: int = TILE_E,
    hd: int = 128,
):
    """dst-tiled backward phase 1, ONE streaming pass over the tile's edges
    — 4 MXU products per edge tile (score SDDMM, dalpha, the fused
    de/alpha head->feature expansion, and the dzd one-hot reduction).

    All dst-side operands arrive PRE-GATHERED per edge (the xg stream):
    this kernel is MXU-bound while HBM streaming rides otherwise-idle DMA
    bandwidth, so trading the round-2 one-hot gather matmuls (zd, g, m, l,
    r — five MXU passes at a 128x structural-FLOP factor) for one wider
    stream is the core round-3 speedup.

    The forward softmax stats travel as sigma = m + log(l + eps): alpha_e
    = exp(sc_e - sigma[dst_e]) in one exp, no division. The softmax-
    Jacobian segment term r_j = sum_k alpha_k dalpha_k collapses to the
    node-space dot <g_j, out_j> (flash-attention identity) and rides the
    same stream (the reference loops the whole neighborhood per edge
    instead — O(sum deg^2), compute_grad_attn_score_kernel
    GATv2_edge_based.cu:654-696).

    Per edge: de_e = alpha_e (dalpha_e - r[dst_e]); ds_e = (de ⊗ a) *
    LReLU'(s); d_zd[j] += sum_e ds_e (one-hot matmul); d_a += sum_e de_e ⊗
    LReLU(s).

    Padding edges gather the APPENDED ZERO ROW of the xg table (their
    stream id equals the chunk's row count): g_e = 0 kills dalpha, sigma =
    r = 0 make de = alpha * (0 - 0) = 0, so ds, c1 and the da contribution
    are exact zeros; the dzd one-hot column is zero as before.

    With emit_c1 (the unchunked fast path) the pass additionally stages the
    per-edge packet c1 = alpha * g[dst] + ds and streams it to HBM for the
    permute+segment-sum phase 2 (_segsum_src_kernel) — one packet write
    instead of phase 2's dst-order gathers + recompute.
    """
    if emit_c1:
        c1_hbm, zs_t, xg_t, dst_t, c1_t, sems = rest
    else:
        zs_t, xg_t, dst_t, sems = rest
        c1_hbm = c1_t = None
    i = pl.program_id(0)
    t0 = tile_offsets_ref[i]
    ntiles = tile_offsets_ref[i + 1] - t0

    dzd_ref[:] = jnp.zeros(dzd_ref.shape, jnp.float32)
    da_ref[:] = jnp.zeros(da_ref.shape, jnp.float32)

    node_ids = i * TILE_N + jax.lax.broadcasted_iota(
        jnp.int32, (TILE_N, tile_e), 0
    )

    def dmas(slot, k):
        off = pl.multiple_of((t0 + k) * tile_e, tile_e)
        return (
            pltpu.make_async_copy(
                zs_hbm.at[pl.ds(off, tile_e), :], zs_t.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                xg_hbm.at[pl.ds(off, tile_e), :], xg_t.at[slot], sems.at[slot, 1]
            ),
            pltpu.make_async_copy(
                dst_hbm.at[:, pl.ds(off, tile_e)], dst_t.at[slot],
                sems.at[slot, 2],
            ),
        )

    def c1_dma(slot, k):
        off = pl.multiple_of((t0 + k) * tile_e, tile_e)
        return pltpu.make_async_copy(
            c1_t.at[slot], c1_hbm.at[pl.ds(off, tile_e), :], sems.at[slot, 3]
        )

    @pl.when(ntiles > 0)
    def _():
        for cp in dmas(0, 0):
            cp.start()

    def body_c(k, _):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < ntiles)
        def _():
            for cp in dmas(jax.lax.rem(k + 1, 2), k + 1):
                cp.start()

        for cp in dmas(slot, k):
            cp.wait()
        if emit_c1:
            # the c1 store from iteration k-2 must drain before we reuse
            # this slot's staging buffer
            @pl.when(k >= 2)
            def _():
                c1_dma(slot, k - 2).wait()
        xg = xg_t[slot]  # [tile_e, 2*hd + 128]
        zd_e = xg[:, :hd]
        g_e = xg[:, hd : 2 * hd]
        sr = xg[:, 2 * hd :]
        de_rep, alpha_rep, s_raw, s_act = _edge_backward_core(
            zs_t[slot], zd_e, g_e, sr, a_sel_ref[:], r_ref[:],
            precision, negative_slope, tile_e, want_c1=emit_c1,
        )
        lrelu_grad = jnp.where(s_raw > 0, 1.0, negative_slope)
        ds = de_rep * a_rep_ref[:] * lrelu_grad  # [tile_e, HD]
        if emit_c1:
            c1_t[slot] = alpha_rep * g_e + ds
            c1_dma(slot, k).start()
        mask_f = (dst_t[slot] == node_ids).astype(jnp.float32)
        dzd_ref[:] = dzd_ref[:] + _kdot(
            mask_f, ds, (((1,), (0,)), ((), ())), precision, exact_arg=0
        )
        da_tile = jnp.sum(de_rep * s_act, axis=0, keepdims=True)  # [1, HD]
        row0 = jax.lax.broadcasted_iota(jnp.int32, da_ref.shape, 0) == 0
        da_ref[:] = da_ref[:] + jnp.where(
            row0, jnp.broadcast_to(da_tile, da_ref.shape), 0.0
        )
        return 0

    jax.lax.fori_loop(0, ntiles, body_c, 0)

    if emit_c1:
        # drain the last two c1 stores
        def drain(k, _):
            c1_dma(jax.lax.rem(k, 2), k).wait()
            return 0

        jax.lax.fori_loop(jnp.maximum(ntiles - 2, 0), ntiles, drain, 0)


def _bwd_dst_chunk(
    zs_e, xg_e, dst_flat, rel_offsets, a_sel, r_mat, a_rep,
    *, num_heads, negative_slope, te, precision, interpret, emit_c1=False,
):
    t_c = rel_offsets.shape[0] - 1
    hd = zs_e.shape[1]
    e_chunk = zs_e.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_c,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # zs_e
            pl.BlockSpec(memory_space=pl.ANY),  # xg_e  [zd | g | sigma_r]
            pl.BlockSpec(memory_space=pl.ANY),  # dst ids
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_sel
            pl.BlockSpec(memory_space=pltpu.VMEM),  # r_mat
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_rep
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, hd), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hd), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec(memory_space=pl.ANY)] if emit_c1 else []),
        scratch_shapes=[
            pltpu.VMEM((2, te, hd), jnp.float32),
            pltpu.VMEM((2, te, 2 * hd + 128), jnp.float32),
            pltpu.VMEM((2, 1, te), jnp.int32),
        ] + ([pltpu.VMEM((2, te, hd), jnp.float32)] if emit_c1 else []) + [
            pltpu.SemaphoreType.DMA((2, 4 if emit_c1 else 3)),
        ],
    )
    kernel = functools.partial(
        _bwd_dst_kernel, num_heads=num_heads, negative_slope=negative_slope,
        emit_c1=emit_c1, precision=_prec_for(precision, interpret), tile_e=te,
        hd=hd,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_c * TILE_N, hd), jnp.float32),
            jax.ShapeDtypeStruct((t_c * 8, hd), jnp.float32),
        ] + ([jax.ShapeDtypeStruct((e_chunk, hd), jnp.float32)] if emit_c1 else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * e_chunk * (3 * hd + 3 * 128) * 2,
            bytes_accessed=e_chunk * (4 * hd + 128) * 4 + t_c * TILE_N * hd * 4,
            transcendentals=e_chunk * 128,
        ),
        interpret=interpret,
    )(rel_offsets, zs_e, xg_e, dst_flat, a_sel, r_mat, a_rep)


# ---------------------------------------------------------------------------
# backward phase 2a (unchunked fast path): permute packets + segment sum
# ---------------------------------------------------------------------------


def _segsum_src_kernel(
    # scalar prefetch
    tile_offsets_ref,  # [T+1] int32 (edge-tile units)
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
    precision=_HIGHEST,
):
    """src-tiled segment sum: dzs[i] = sum_{e: src_e == i} c1_e — consumes
    the packets _bwd_dst_kernel(emit_c1=True) wrote, after an XLA gather
    permutes them to src-sorted order."""
    i = pl.program_id(0)
    t0 = tile_offsets_ref[i]
    ntiles = tile_offsets_ref[i + 1] - t0
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
        dzs_ref[:] = dzs_ref[:] + _kdot(
            mask_f, c1_t[slot], (((1,), (0,)), ((), ())), precision, exact_arg=0
        )
        return 0

    jax.lax.fori_loop(0, ntiles, body, 0)


def _segsum_src(c1s, sid_flat, src_tile_offsets, t, *, te, hd, precision, interpret):
    grid_spec = pltpu.PrefetchScalarGridSpec(
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
    e2 = c1s.shape[0]
    return pl.pallas_call(
        functools.partial(
            _segsum_src_kernel, tile_e=te, precision=_prec_for(precision, interpret)
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t * TILE_N, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * e2 * hd,
            bytes_accessed=e2 * hd * 4 + t * TILE_N * hd * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(src_tile_offsets, c1s, sid_flat)


# ---------------------------------------------------------------------------
# backward phase 2b (chunked path): d_zs by per-edge recompute
# ---------------------------------------------------------------------------


def _bwd_src_kernel(
    # scalar prefetch
    tile_offsets_ref,  # [T_c+1] int32 (chunk-relative edge-tile units)
    # inputs
    zs_e_hbm,  # [E_chunk, HD] ANY — zs[src_e] (0 on padding edges)
    zd_e_hbm,  # [E_chunk, HD] ANY — zd[dst_e]
    g_e_hbm,  # [E_chunk, HD] ANY — g[dst_e]
    sr_e_hbm,  # [E_chunk, 128] ANY — sigma_r[dst_e]
    sid_hbm,  # [1, E_chunk] int32 ANY — chunk-relative src ids (pad == rows)
    a_sel_ref,  # [HD, 128] VMEM
    r_ref,  # [128, HD] VMEM
    a_rep_ref,  # [1, HD] VMEM
    # outputs
    dzs_ref,  # [TILE_N, HD] VMEM blocked
    # scratch
    zs_t,  # [2, tile_e, HD]
    zd_t,  # [2, tile_e, HD]
    g_t,  # [2, tile_e, HD]
    sr_t,  # [2, tile_e, 128]
    sid_t,  # [2, 1, tile_e] int32
    sems,  # DMA semaphores (2, 5)
    *,
    num_heads: int,
    negative_slope: float,
    precision=_HIGHEST,
    tile_e: int = TILE_E,
    hd: int = 128,
):
    """src-tiled backward phase 2: recomputes each edge's packet
        c1_e = alpha_e * g[dst_e] + ds_e
    from fully pre-gathered per-edge streams (zs by src; zd, g, sigma_r by
    dst — three SEPARATE streams, all in src-sorted order) and
    one-hot-matmuls it into
        d_zs[i] = sum_{e: src_e == i} c1_e
    — 4 MXU products per edge tile (score SDDMM, dalpha, fused de/alpha
    expansion, dzs reduction), mirroring phase 1's stream design.

    The dst-side operands arrive as separate streams rather than one fused
    [E, 2*HD+128] buffer: the dst ids are GLOBAL node ids, so a fused
    stream needs either a node-space concat table held across the chunk
    scan (~4 GB at Products scale) or an edge-space concatenate that
    re-streams the widest per-edge buffer through HBM once more per chunk.
    Separate DMAs move the same bytes with zero extra copies.

    The deterministic TPU replacement for the reference's atomicAdd scatter
    in compute_features_input_gradients (GATv2_edge_based.cu:801-874) —
    with NO per-edge packet buffer in HBM (it is consumed as produced).
    Padding slots: zs streams exact zeros (the caller's table appends a
    zero row), but the dst-side streams carry node 0's REAL [zd | g |
    sigma_r] (dst ids are zero-filled on padding) — the resulting
    finite-garbage packets are annihilated ONLY by the reduction mask
    (padding sid == chunk row count, outside every tile), so nothing may
    consume c1 before that mask.
    """
    i = pl.program_id(0)
    t0 = tile_offsets_ref[i]
    ntiles = tile_offsets_ref[i + 1] - t0
    dzs_ref[:] = jnp.zeros(dzs_ref.shape, jnp.float32)
    node_ids = i * TILE_N + jax.lax.broadcasted_iota(
        jnp.int32, (TILE_N, tile_e), 0
    )

    def dmas(slot, k):
        off = pl.multiple_of((t0 + k) * tile_e, tile_e)
        return (
            pltpu.make_async_copy(
                zs_e_hbm.at[pl.ds(off, tile_e), :], zs_t.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                zd_e_hbm.at[pl.ds(off, tile_e), :], zd_t.at[slot], sems.at[slot, 1]
            ),
            pltpu.make_async_copy(
                g_e_hbm.at[pl.ds(off, tile_e), :], g_t.at[slot], sems.at[slot, 2]
            ),
            pltpu.make_async_copy(
                sr_e_hbm.at[pl.ds(off, tile_e), :], sr_t.at[slot], sems.at[slot, 3]
            ),
            pltpu.make_async_copy(
                sid_hbm.at[:, pl.ds(off, tile_e)], sid_t.at[slot],
                sems.at[slot, 4],
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
        g_c = g_t[slot]
        de_rep, alpha_rep, s_raw, _ = _edge_backward_core(
            zs_t[slot], zd_t[slot], g_c, sr_t[slot],
            a_sel_ref[:], r_ref[:],
            precision, negative_slope, tile_e, want_c1=True,
        )
        ds = de_rep * a_rep_ref[:] * jnp.where(s_raw > 0, 1.0, negative_slope)
        c1 = alpha_rep * g_c + ds
        mask_f = (sid_t[slot] == node_ids).astype(jnp.float32)
        dzs_ref[:] = dzs_ref[:] + _kdot(
            mask_f, c1, (((1,), (0,)), ((), ())), precision, exact_arg=0
        )
        return 0

    jax.lax.fori_loop(0, ntiles, body, 0)


def _bwd_src_chunk(
    zs_e, zd_e, g_e, sr_e, sid_flat, rel_offsets, a_sel, r_mat, a_rep, t_c,
    *, num_heads, negative_slope, te, precision, interpret,
):
    hd = zs_e.shape[1]
    e_chunk = zs_e.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_c,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # zs_e
            pl.BlockSpec(memory_space=pl.ANY),  # zd_e
            pl.BlockSpec(memory_space=pl.ANY),  # g_e
            pl.BlockSpec(memory_space=pl.ANY),  # sr_e
            pl.BlockSpec(memory_space=pl.ANY),  # sid
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_sel
            pl.BlockSpec(memory_space=pltpu.VMEM),  # r_mat
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_rep
        ],
        out_specs=pl.BlockSpec(
            (TILE_N, hd), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, te, hd), jnp.float32),
            pltpu.VMEM((2, te, hd), jnp.float32),
            pltpu.VMEM((2, te, hd), jnp.float32),
            pltpu.VMEM((2, te, 128), jnp.float32),
            pltpu.VMEM((2, 1, te), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 5)),
        ],
    )
    kernel = functools.partial(
        _bwd_src_kernel, num_heads=num_heads, negative_slope=negative_slope,
        precision=_prec_for(precision, interpret), tile_e=te, hd=hd,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_c * TILE_N, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * e_chunk * (4 * hd + 3 * 128) * 2,
            bytes_accessed=e_chunk * (3 * hd + 128) * 4 + t_c * TILE_N * hd * 4,
            transcendentals=e_chunk * 128,
        ),
        interpret=interpret,
    )(rel_offsets, zs_e, zd_e, g_e, sr_e, sid_flat, a_sel, r_mat, a_rep)


# ---------------------------------------------------------------------------
# lane-layout helpers + public entry point
# ---------------------------------------------------------------------------


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


def _chunk_slice(arr: jax.Array, g: int, rows: int) -> jax.Array:
    return jax.lax.slice_in_dim(arr, g * rows, (g + 1) * rows, axis=0)


def edge_attention_pallas(
    zs: jax.Array,  # [N, H, D] or flat [N, H*D] (preferred: avoids copies)
    zd: jax.Array,  # same shape as zs
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
    if not interpret and jax.default_backend() == "cpu":
        # Pallas TPU kernels only lower on TPU; on the CPU backend fall back
        # to the interpreter so the CLI/tests run everywhere unmodified
        interpret = True
    if num_nodes not in (edge_tiles.num_nodes, edge_tiles.padded_num_nodes):
        raise ValueError(
            f"edge_tiles built for {edge_tiles.num_nodes} "
            f"(padded {edge_tiles.padded_num_nodes}) dst nodes, got {num_nodes}"
        )
    if zs.shape[0] not in (edge_tiles.src_num_nodes, edge_tiles.padded_src_nodes):
        raise ValueError(
            f"zs has {zs.shape[0]} rows; edge_tiles src space is "
            f"{edge_tiles.src_num_nodes} (padded {edge_tiles.padded_src_nodes})"
        )
    if a.shape[0] > STATS_L:
        # compact softmax-stat lanes hold STATS_L heads per kernel pass;
        # heads are embarrassingly parallel (head-major layouts throughout,
        # like the reference's [H, E] buffers, GATv2_edge_based.cu:297), so
        # larger head counts run as independent <=STATS_L-head groups. The
        # custom VJPs compose through the slice/concat automatically.
        num_heads, hd = int(a.shape[0]), int(a.shape[1])
        outs = []
        for h0 in range(0, num_heads, STATS_L):
            h1 = min(h0 + STATS_L, num_heads)
            if zs.ndim == 2:  # flat [N, H*D], head-major columns
                zs_g, zd_g = zs[:, h0 * hd : h1 * hd], zd[:, h0 * hd : h1 * hd]
            else:
                zs_g, zd_g = zs[:, h0:h1], zd[:, h0:h1]
            outs.append(
                edge_attention_pallas(
                    zs_g, zd_g, a[h0:h1], src, dst, num_nodes,
                    negative_slope=negative_slope, edge_tiles=edge_tiles,
                    interpret=interpret, bwd_impl=bwd_impl,
                    precision=precision,
                )
            )
        return jnp.concatenate(outs, axis=-1 if zs.ndim == 2 else 1)
    if bwd_impl == "xla" and edge_tiles.num_chunks > 1:
        raise ValueError(
            "bwd_impl='xla' is unavailable for chunked edge_tiles (the flat "
            "COO layout is not kept when num_chunks > 1); use the default "
            "bwd_impl='pallas'"
        )
    if bwd_impl == "xla" and edge_tiles.num_src_nodes >= 0:
        raise ValueError(
            "bwd_impl='xla' supports monopartite tiles only (bipartite "
            "src/dst spaces need the Pallas backward); use bwd_impl='pallas'"
        )
    et = edge_tiles
    te = et.tile_e
    g_chunks = et.num_chunks
    t_c = et.tiles_per_chunk
    rows_c = t_c * TILE_N  # dst-space rows per chunk
    n_pad = et.padded_num_nodes  # dst space
    num_src = et.src_num_nodes
    ns_pad = et.padded_src_nodes
    t_c_src = ns_pad // (g_chunks * TILE_N)
    rows_c_src = t_c_src * TILE_N  # src-space rows per chunk
    kw = dict(
        num_heads=int(a.shape[0]), negative_slope=negative_slope, te=te,
        precision=precision, interpret=interpret,
    )
    num_heads, head_dim = int(a.shape[0]), int(a.shape[1])
    hd_real = num_heads * head_dim
    flat_io = zs.ndim == 2  # [N, H*D] in -> [N, H*D] out (and grads)

    from gatv2_tpu.ops.attention import _edge_attention_xla

    def _prep(z, rows=None):
        """[N, H, D] or [N, H*D] -> lane-padded node-space [rows, hd].

        Free (no copy) when callers pass flat inputs with the node dim
        already padded and H*D a lane multiple — the Trainer arranges
        exactly that for big graphs (see train/loop.py)."""
        rows = n_pad if rows is None else rows
        n = z.shape[0]
        hd = -(-hd_real // 128) * 128
        z = z.reshape(n, hd_real)
        if hd != hd_real:
            z = jnp.pad(z, ((0, 0), (0, hd - hd_real)))
        if n != rows:
            z = jnp.pad(z, ((0, rows - n), (0, 0)))
        return z, hd

    def _forward_all(zs, zd, a, et_):
        dst_ids = et_.dst_side.ids_grp  # [G, Ec]
        dst_other = et_.dst_side.other_grp  # [G, Ec] src ids
        dst_rel = et_.dst_side.rel_offsets  # [G, T_c+1]
        zs_flat, hd = _prep(zs, ns_pad)
        zd_flat, _ = _prep(zd)
        a_sel, r_mat, _ = _head_matrices(a, hd)

        def one(g, ids_g, other_g, rel_g):
            zs_e = _take(zs_flat, other_g)  # [Ec, hd]
            # dst projections pre-gathered per edge (ids are chunk-relative;
            # padding slots index the appended zero row, so padding edges
            # see zd == 0 exactly as the old in-kernel one-hot gather did)
            zd_z = jnp.concatenate(
                [
                    jax.lax.dynamic_slice_in_dim(zd_flat, g * rows_c, rows_c),
                    jnp.zeros((1, hd), jnp.float32),
                ],
                axis=0,
            )
            zd_e = _take(zd_z, jnp.minimum(ids_g, rows_c))
            return _forward_chunk(
                zs_e,
                zd_e,
                ids_g[None, :],
                rel_g,
                a_sel,
                r_mat,
                **kw,
            )

        if g_chunks == 1:
            out, m, l = one(0, dst_ids[0], dst_other[0], dst_rel[0])
            return out, m, l
        # lax.scan forces chunk-sequential execution: only one chunk's
        # [E/G, hd] gather is ever live in HBM
        def body(_, x):
            g, ids_g, other_g, rel_g = x
            return 0, one(g, ids_g, other_g, rel_g)

        _, (outs, ms, ls) = jax.lax.scan(
            body, 0, (jnp.arange(g_chunks), dst_ids, dst_other, dst_rel)
        )
        return (
            outs.reshape(-1, outs.shape[-1]),
            ms.reshape(-1, 128),
            ls.reshape(-1, 128),
        )

    def _restore(out2d):
        if flat_io:
            return out2d
        return out2d.reshape(num_nodes, num_heads, head_dim)

    @jax.custom_vjp
    def attn(zs, zd, a, et_):
        out, _, _ = _forward_all(zs, zd, a, et_)
        return _restore(out[:num_nodes, :hd_real])

    def fwd(zs, zd, a, et_):
        out, m_stats, l_stats = _forward_all(zs, zd, a, et_)
        out_r = _restore(out[:num_nodes, :hd_real])
        # keep only the real head lanes of the softmax stats as residuals
        # (8x memory cut; Products-scale full-graph fits one chip). out_r
        # rides along so the backward's softmax-Jacobian segment term is a
        # node-space dot (see bwd_pallas) instead of an edge pass.
        res = (
            (zs, zd, a, m_stats[:, :STATS_L], l_stats[:, :STATS_L], out_r, et_)
            if bwd_impl == "pallas"
            else (zs, zd, a, et_)
        )
        return out_r, res

    def bwd_xla(res, g):
        zs, zd, a, et_ = res
        # the recompute must run in the REAL node space: the flat layout's
        # padding edges carry dst == et_.num_nodes, which is only out of
        # segment range when num_segments == the real count. Inputs may be
        # node-padded (Trainer layouts); slice them down and zero-pad the
        # grads back (padded rows feed constant-zero outputs, so their true
        # cotangent is zero).
        n_real = et_.num_nodes

        def f(zs_r, zd_r, a_):
            # the tiled flat layout interleaves padding ids (== num_nodes)
            # BETWEEN tiles, so dst is NOT globally sorted here
            out3 = _edge_attention_xla(
                zs_r.reshape(n_real, num_heads, head_dim),
                zd_r.reshape(n_real, num_heads, head_dim),
                a_, et_.src, et_.dst, n_real,
                negative_slope=negative_slope, indices_sorted=False,
            )
            return out3.reshape(n_real, hd_real) if flat_io else out3

        _, vjp = jax.vjp(f, zs[:n_real], zd[:n_real], a)
        dzs_r, dzd_r, da = vjp(g[:n_real])

        def padback(d, like):
            pad = like.shape[0] - n_real
            if pad == 0:
                return d
            return jnp.pad(d, ((0, pad),) + ((0, 0),) * (d.ndim - 1))

        return padback(dzs_r, zs), padback(dzd_r, zd), da, None

    def bwd_pallas(res, gout):
        zs, zd, a = res[0], res[1], res[2]
        m16, l16, out_r, et_ = res[3], res[4], res[5], res[6]
        dst_ids = et_.dst_side.ids_grp
        dst_other = et_.dst_side.other_grp
        dst_rel = et_.dst_side.rel_offsets
        sid_ids = et_.src_side.ids_grp
        sid_other = et_.src_side.other_grp
        src_rel = et_.src_side.rel_offsets
        zs_flat, hd = _prep(zs, ns_pad)
        zd_flat, _ = _prep(zd)
        a_sel, r_mat, a_rep = _head_matrices(a, hd)
        g_flat, _ = _prep(gout)
        out_flat, _ = _prep(out_r)
        # softmax-Jacobian segment term by the flash-attention identity:
        #   r_j = sum_{k in N(j)} alpha_kj dalpha_kj
        #       = <g_j, sum_k alpha_kj zs_k> = <g_j, out_j>   (per head)
        # — a node-space dot. The reference builds this with a per-edge loop
        # over the whole destination neighborhood, O(sum deg^2)
        # (compute_grad_attn_score_kernel, GATv2_edge_based.cu:654-696);
        # round 2 of this file used a full edge-space kernel pass. Both
        # collapse to O(N * HD) VPU work.
        prod = (g_flat * out_flat)[:, :hd_real].reshape(
            -1, num_heads, head_dim
        )
        rsum16 = jnp.pad(
            prod.sum(-1), ((0, 0), (0, STATS_L - num_heads))
        )  # [n_pad, 16]
        # compact per-node stats [n_pad, 128]: sigma = m + log(l+eps) in the
        # first STATS_L lanes, r in the next (see _sigma_r_table)
        sig_r = _sigma_r_table(m16, l16, rsum16)
        xg_width = 2 * hd + 128
        # phase 1: dst-tiled -> d_zd, d_a; unchunked additionally emits the
        # per-edge packets c1
        emit_c1 = g_chunks == 1

        def phase1(g, ids_g, other_g, rel_g):
            zs_e = _take(zs_flat, other_g)
            # per-edge [zd | g | sigma_r] stream, row-gathered in XLA: ids
            # are chunk-relative and padding slots carry rows_c — exactly
            # the appended zero row, so padding edges stream zeros
            table = jnp.concatenate(
                [
                    jax.lax.dynamic_slice_in_dim(zd_flat, g * rows_c, rows_c),
                    jax.lax.dynamic_slice_in_dim(g_flat, g * rows_c, rows_c),
                    jax.lax.dynamic_slice_in_dim(sig_r, g * rows_c, rows_c),
                ],
                axis=1,
            )
            table = jnp.concatenate(
                [table, jnp.zeros((1, xg_width), jnp.float32)], axis=0
            )
            xg_e = _take(table, jnp.minimum(ids_g, rows_c))
            return _bwd_dst_chunk(
                zs_e,
                xg_e,
                ids_g[None, :],
                rel_g,
                a_sel, r_mat, a_rep,
                emit_c1=emit_c1,
                **kw,
            )

        if emit_c1:
            dzd_pad, da_parts, c1 = phase1(
                0, dst_ids[0], dst_other[0], dst_rel[0]
            )
            da = jnp.sum(da_parts, axis=0)
            # phase 2a (fast path): permute packets to src-sorted order,
            # one-hot segment-sum per src tile
            c1s = _take(c1, et_.gather_perm)
            dzs_pad = _segsum_src(
                c1s,
                et_.src_sorted_ids[None, :],
                et_.src_tile_offsets,
                t_c_src,
                te=te, hd=hd, precision=precision, interpret=interpret,
            )
        else:
            def body1(_, x):
                g, ids_g, other_g, rel_g = x
                dzd_c, da_c = phase1(g, ids_g, other_g, rel_g)
                return 0, (dzd_c, jnp.sum(da_c, axis=0))

            _, (dzd_s, da_s) = jax.lax.scan(
                body1, 0, (jnp.arange(g_chunks), dst_ids, dst_other, dst_rel)
            )
            dzd_pad = dzd_s.reshape(-1, hd)
            da = jnp.sum(da_s, axis=0)

            # phase 2b (chunked): per-edge recompute, O(E/G) temporaries.
            # All operands stream pre-gathered: the dst-side zd / g /
            # sigma_r operands gather PER CHUNK from their separate
            # node-space tables and stay SEPARATE streams into the kernel
            # (three DMAs) — neither the [n_pad, 2hd+128] node-space
            # concat (~4 GB held across the whole phase-2b scan at
            # Products scale) nor an edge-space concatenate (an extra
            # full write+read of the widest per-edge stream per chunk)
            # is ever materialized. (src-sorted dids always index real
            # rows; padding edges carry dst 0 — finite garbage the src-id
            # reduction mask annihilates.) zs gathers chunk-locally with
            # an appended zero row (padding sids == rows_c_src exactly).
            def body2(_, x):
                g, sids_g, dids_g, rel_g = x
                zd_e = _take(zd_flat, dids_g)
                ge_e = _take(g_flat, dids_g)
                sr_e = _take(sig_r, dids_g)
                zs_z = jnp.concatenate(
                    [
                        jax.lax.dynamic_slice_in_dim(
                            zs_flat, g * rows_c_src, rows_c_src
                        ),
                        jnp.zeros((1, hd), jnp.float32),
                    ],
                    axis=0,
                )
                zs_e = _take(zs_z, jnp.minimum(sids_g, rows_c_src))
                dzs_c = _bwd_src_chunk(
                    zs_e, zd_e, ge_e, sr_e, sids_g[None, :], rel_g,
                    a_sel, r_mat, a_rep, t_c_src,
                    **kw,
                )
                return 0, dzs_c

            _, dzs_s = jax.lax.scan(
                body2, 0, (jnp.arange(g_chunks), sid_ids, sid_other, src_rel)
            )
            dzs_pad = dzs_s.reshape(-1, hd)

        dzs = dzs_pad[: zs.shape[0], :hd_real].reshape(zs.shape)
        dzd = dzd_pad[: zd.shape[0], :hd_real].reshape(zd.shape)
        # None cotangent for the (integer) edge-layout pytree
        return dzs, dzd, da[:hd_real].reshape(num_heads, head_dim), None

    attn.defvjp(fwd, bwd_pallas if bwd_impl == "pallas" else bwd_xla)
    return attn(zs, zd, a, et)


# ---------------------------------------------------------------------------
# multi-pass merged attention (halo/compute overlap on the Pallas path)
# ---------------------------------------------------------------------------


def edge_attention_pallas_merge(
    zs_parts,  # K src-space projections, each [N_k, H, D] or flat [N_k, H*D]
    zd: jax.Array,  # [N_dst, H, D] / [N_dst, H*D] dst projections
    a: jax.Array,  # [H, D]
    num_nodes: int,  # real dst-node count
    *,
    negative_slope: float,
    edge_tiles_parts,  # K bipartite EdgeTiles (num_chunks=1, same dst space)
    interpret: bool = False,
    precision: str = "highest",
) -> jax.Array:
    """Fused attention over K edge subsets whose per-destination softmax is
    MERGED across subsets — the kernel-level building block for
    halo/compute-overlapped sharded layers (local-src edges in one pass,
    halo-src edges in another; the all_to_all only gates the halo pass).

    Each pass runs the forward kernel unnormalized (u_k = sum exp(e - m_k)
    zs, plus stats m_k / l_k); passes merge with the standard online-softmax
    rescale (the graph analog of ring attention's stat merge):

        M = max_k m_k;  h = sum_k e^{m_k - M} u_k / (sum_k e^{m_k - M} l_k + eps)

    The backward is exact: the softmax-Jacobian segment term r_j spans ALL
    passes, but by the flash-attention identity it equals <g_j, h_j> with
    the MERGED output h — a node-space dot, no per-pass edge kernels.
    Phase 1 is then the per-pass application (_bwd_dst_kernel, emit_c1)
    with the merged (M, L, r) stats; phase 2 is the per-pass packet
    permute + src-tiled segment sum, giving each pass's d_zs in its own
    src space.
    """
    ets = tuple(edge_tiles_parts)
    zs_parts = tuple(zs_parts)
    if len(ets) != len(zs_parts) or not ets:
        raise ValueError("need one EdgeTiles per zs part")
    if any(et.num_chunks != 1 for et in ets):
        raise ValueError("merge path supports num_chunks == 1 tiles only")
    n_pad = ets[0].padded_num_nodes
    if any(et.padded_num_nodes != n_pad for et in ets):
        raise ValueError("all parts must share the dst node space")
    num_heads, head_dim = int(a.shape[0]), int(a.shape[1])
    if num_heads > STATS_L:
        raise ValueError(
            f"edge_attention_pallas_merge supports at most {STATS_L} heads"
        )
    for zs_k, et in zip(zs_parts, ets):
        if zs_k.shape[0] not in (et.src_num_nodes, et.padded_src_nodes):
            raise ValueError(
                f"zs part has {zs_k.shape[0]} rows; its tiles' src space is "
                f"{et.src_num_nodes} (padded {et.padded_src_nodes})"
            )
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    hd_real = num_heads * head_dim
    flat_io = zs_parts[0].ndim == 2

    def prep(z, rows):
        n = z.shape[0]
        hd = -(-hd_real // 128) * 128
        z = z.reshape(n, hd_real)
        if hd != hd_real:
            z = jnp.pad(z, ((0, 0), (0, hd - hd_real)))
        if n != rows:
            z = jnp.pad(z, ((0, rows - n), (0, 0)))
        return z, hd

    def rep_heads(x_heads, hd):
        """[n, 128] per-head stats -> [n, hd] feature-lane broadcast."""
        r = jnp.repeat(x_heads[:, :num_heads], head_dim, axis=1)
        return jnp.pad(r, ((0, 0), (0, hd - hd_real)))

    def forward_parts(zs_t, zd_, a_, ets_):
        zd_flat, hd = prep(zd_, n_pad)
        # appended zero row: padding edges carry dst id == n_pad and stream
        # zeros, exactly like the single-pass path (see edge_attention_pallas)
        zd_z = jnp.concatenate(
            [zd_flat, jnp.zeros((1, hd), jnp.float32)], axis=0
        )
        a_sel, r_mat, _ = _head_matrices(a_, hd)
        outs = []
        for zs_k, et in zip(zs_t, ets_):
            zs_flat, _ = prep(zs_k, et.padded_src_nodes)
            ids = et.dst_side.ids_grp[0]
            zs_e = _take(zs_flat, et.dst_side.other_grp[0])
            zd_e = _take(zd_z, jnp.minimum(ids, n_pad))
            outs.append(
                _forward_chunk(
                    zs_e, zd_e, ids[None, :],
                    et.dst_side.rel_offsets[0], a_sel, r_mat,
                    num_heads=num_heads, negative_slope=negative_slope,
                    te=et.tile_e, precision=precision, interpret=interpret,
                    normalize=False,
                )
            )
        return outs, hd

    def merge(outs, hd):
        m_all = outs[0][1]
        for _, m_k, _ in outs[1:]:
            m_all = jnp.maximum(m_all, m_k)
        m_safe = jnp.where(m_all <= NEG_INF, 0.0, m_all)
        u_tot = jnp.zeros((n_pad, hd), jnp.float32)
        l_tot = jnp.zeros((n_pad, 128), jnp.float32)
        for u_k, m_k, l_k in outs:
            c = jnp.where(m_k <= NEG_INF, 0.0, jnp.exp(m_k - m_safe))
            u_tot = u_tot + u_k * rep_heads(c, hd)
            l_tot = l_tot + l_k * c
        h = u_tot / (rep_heads(l_tot, hd) + SOFTMAX_EPS)
        return h, m_all, l_tot

    def restore(out2d):
        out = out2d[:num_nodes, :hd_real]
        return out if flat_io else out.reshape(num_nodes, num_heads, head_dim)

    # the tiles ride as an ARGUMENT of the custom_vjp function (closure
    # capture would leak tracers when called inside shard_map) and get a
    # None cotangent
    @jax.custom_vjp
    def attn(zs_t, zd_, a_, ets_):
        outs, hd = forward_parts(zs_t, zd_, a_, ets_)
        h, _, _ = merge(outs, hd)
        return restore(h)

    def fwd(zs_t, zd_, a_, ets_):
        outs, hd = forward_parts(zs_t, zd_, a_, ets_)
        h, m_all, l_tot = merge(outs, hd)
        h_r = restore(h)
        res = (zs_t, zd_, a_, m_all[:, :STATS_L], l_tot[:, :STATS_L], h_r, ets_)
        return h_r, res

    def bwd(res, gout):
        zs_t, zd_, a_, m16, l16, h_r, ets_ = res
        zd_flat, hd = prep(zd_, n_pad)
        g_flat, _ = prep(gout, n_pad)
        h_flat, _ = prep(h_r, n_pad)
        a_sel, r_mat, a_rep = _head_matrices(a_, hd)
        # merged softmax-Jacobian segment term, node space (see bwd_pallas):
        # r_j = <g_j, h_j> with the MERGED output h — spans all passes
        prodm = (g_flat * h_flat)[:, :hd_real].reshape(
            -1, num_heads, head_dim
        )
        rsum16 = jnp.pad(
            prodm.sum(-1), ((0, 0), (0, STATS_L - num_heads))
        )
        # per-edge [zd | g | sigma_r] stream with the MERGED stats; the
        # appended zero row serves padding edges (ids == n_pad), and
        # padding NODE rows (m == -1e30 -> sigma ~ -1e30, g == 0) already
        # produce exact-zero contributions (see _bwd_dst_kernel docstring)
        sig_r = _sigma_r_table(m16, l16, rsum16)
        xg_width = 2 * hd + 128
        table = jnp.concatenate([zd_flat, g_flat, sig_r], axis=1)
        table = jnp.concatenate(
            [table, jnp.zeros((1, xg_width), jnp.float32)], axis=0
        )
        zs_es = []
        for zs_k, et in zip(zs_t, ets_):
            zs_flat, _ = prep(zs_k, et.padded_src_nodes)
            zs_es.append(_take(zs_flat, et.dst_side.other_grp[0]))

        # per-pass gradient application with merged stats
        dzd_pad = jnp.zeros((n_pad, hd), jnp.float32)
        da_acc = jnp.zeros((hd,), jnp.float32)
        dzs_out = []
        for zs_k, zs_e, et in zip(zs_t, zs_es, ets_):
            ids = et.dst_side.ids_grp[0]
            xg_e = _take(table, jnp.minimum(ids, n_pad))
            dzd_k, da_k, c1_k = _bwd_dst_chunk(
                zs_e, xg_e,
                ids[None, :], et.dst_side.rel_offsets[0],
                a_sel, r_mat, a_rep,
                num_heads=num_heads, negative_slope=negative_slope,
                te=et.tile_e, precision=precision, interpret=interpret,
                emit_c1=True,
            )
            dzd_pad = dzd_pad + dzd_k
            da_acc = da_acc + jnp.sum(da_k, axis=0)
            c1s = _take(c1_k, et.gather_perm)
            t_src = et.padded_src_nodes // TILE_N
            dzs_pad = _segsum_src(
                c1s, et.src_sorted_ids[None, :], et.src_tile_offsets, t_src,
                te=et.tile_e, hd=hd, precision=precision, interpret=interpret,
            )
            dzs_out.append(
                dzs_pad[: zs_k.shape[0], :hd_real].reshape(zs_k.shape)
            )

        dzd = dzd_pad[: zd_.shape[0], :hd_real].reshape(zd_.shape)
        da = da_acc[:hd_real].reshape(num_heads, head_dim)
        return tuple(dzs_out), dzd, da, None

    attn.defvjp(fwd, bwd)
    return attn(zs_parts, zd, a, ets)
