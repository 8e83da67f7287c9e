"""Host-side graph partitioning for multi-chip training.

The reference is strictly single-GPU (SURVEY.md §2.5: no NCCL/MPI anywhere);
this module adds the scale-out layer the TPU framework needs. Strategy =
**edge partitioning by destination-node blocks** (the graph analog of
sequence/context parallelism):

  - nodes are split into `num_shards` contiguous, equal-size blocks
    (padded with isolated dummy nodes, label -1);
  - every edge lives on the shard that owns its DESTINATION, so the
    segment softmax and segment-sum aggregation are entirely LOCAL to the
    shard (edges stay dst-sorted within a shard);
  - only the source-side projections (zs = X @ W_src^T) cross shards —
    exchanged with one all_gather per layer inside the sharded step, which
    XLA schedules over ICI (see parallel/sharded.py).

Per-shard edge counts are padded to the max across shards so every device
runs the same static shapes (padding edges: dst_local = nodes_per_shard,
dropped by the segment ops; src = 0).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gatv2_tpu.data.graph import Graph


@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    """Stacked per-shard arrays; axis 0 is sharded over the 'graph' mesh axis
    when passed into the sharded step (global shapes shown).

    Nodes live in contiguous global-id blocks (block s = global ids
    [node_bounds[s], node_bounds[s+1])), each padded to the common
    `nodes_per_shard`. The padded SLOT id of global node g in block s is
    `s * nodes_per_shard + (g - node_bounds[s])`; `src` is stored in slot
    ids so the sharded layer's gather indexes the all_gather/halo output
    directly, independent of how the block boundaries were chosen.

    features  [S * nodes_per_shard, F]   (block-scattered, 0 on padding)
    labels    [S * nodes_per_shard]      (-1 on padding slots)
    src       [S * edges_per_shard]      source SLOT ids (see above)
    dst_local [S * edges_per_shard]      dst id RELATIVE to its shard block
                                         (= nodes_per_shard on padding edges)
    """

    features: np.ndarray
    labels: np.ndarray
    src: np.ndarray
    dst_local: np.ndarray
    num_shards: int
    nodes_per_shard: int
    edges_per_shard: int
    num_real_nodes: int
    num_real_edges: int
    node_bounds: np.ndarray  # [S+1] global-id block boundaries
    edge_counts: np.ndarray  # [S] real (pre-padding) edges per shard

    @property
    def padded_num_nodes(self) -> int:
        return self.num_shards * self.nodes_per_shard

    def slot_of(self, global_ids: np.ndarray) -> np.ndarray:
        """Global node ids -> padded slot ids."""
        g = np.asarray(global_ids, np.int64)
        s = np.searchsorted(self.node_bounds, g, side="right") - 1
        return (s * self.nodes_per_shard + g - self.node_bounds[s]).astype(
            np.int64
        )

    def scatter_nodes(self, values: np.ndarray, fill) -> np.ndarray:
        """Re-lay a [N, ...] global-node-order array into partition (slot)
        order, with `fill` on padding slots. Used for split masks/labels."""
        values = np.asarray(values)
        out = np.full(
            (self.padded_num_nodes,) + values.shape[1:], fill, values.dtype
        )
        out[self.slot_of(np.arange(self.num_real_nodes))] = values
        return out

    def balance_report(self) -> str:
        c = self.edge_counts
        lo, hi = (int(c.min()), int(c.max())) if c.size else (0, 0)
        waste = 1.0 - c.sum() / max(
            self.num_shards * self.edges_per_shard, 1
        )
        blocks = np.diff(self.node_bounds)
        return (
            f"edges/shard min={lo} max={hi} (ratio "
            f"{hi / max(lo, 1):.2f}), padded to {self.edges_per_shard} "
            f"({waste * 100:.1f}% padding); nodes/shard "
            f"min={int(blocks.min()) if blocks.size else 0} "
            f"max={int(blocks.max()) if blocks.size else 0} "
            f"(padded to {self.nodes_per_shard})"
        )


def partition_graph(
    graph: Graph, num_shards: int, *, edge_multiple: int = 128,
    node_multiple: int = 8, balance: str = "edges",
) -> PartitionedGraph:
    """Partition by contiguous dst blocks.

    balance='edges' (default): block boundaries are chosen by cumulative
    edge count (searchsorted on row_ptr), so every shard owns ~E/S edges
    even on power-law graphs where equal node blocks would be badly skewed
    (each shard's edge buffer is padded to the max across shards — skew is
    pure padding waste AND straggler compute).
    balance='nodes': equal node blocks (the round-1 layout).
    """
    n, f = graph.num_nodes, graph.feature_dim
    if balance not in ("edges", "nodes"):
        raise ValueError(f"balance must be 'edges' or 'nodes', got {balance!r}")

    row_ptr = graph.row_ptr.astype(np.int64)
    e_total = graph.num_edges
    if balance == "edges" and e_total > 0:
        targets = (np.arange(1, num_shards, dtype=np.int64) * e_total) // num_shards
        inner = np.searchsorted(row_ptr, targets, side="left")
        node_bounds = np.concatenate(([0], inner, [n])).astype(np.int64)
        node_bounds = np.maximum.accumulate(node_bounds)  # monotone guard
        # cap node-block sizes at 2x the even share: every shard's padded
        # node buffer (features/labels/projections) is nodes_per_shard =
        # MAX block size, so unbounded edge balancing on a degree-sorted
        # graph could give one shard ~all N nodes and blow padded memory
        # S-fold. Two steps, provably bounding EVERY block at <= cap while
        # staying as close to edge-balanced as the cap allows:
        #   1. clamp b_s <= s*cap (so no prefix outruns the cap budget);
        #   2. backward pass b_s = max(b_s, b_{s+1} - cap) — after it,
        #      block s = b_{s+1} - b_s <= cap for all s, and monotonicity
        #      plus b_s <= s*cap are preserved (b_{s+1} - cap <= s*cap).
        cap = min(n, 2 * (-(-n // num_shards)))
        s_idx = np.arange(num_shards + 1, dtype=np.int64)
        node_bounds = np.minimum(node_bounds, s_idx * cap)
        for s in range(num_shards - 1, 0, -1):
            node_bounds[s] = max(node_bounds[s], node_bounds[s + 1] - cap)
    else:
        per = -(-n // num_shards)
        node_bounds = np.minimum(
            np.arange(num_shards + 1, dtype=np.int64) * per, n
        )

    block_sizes = np.diff(node_bounds)
    nodes_per_shard = int(block_sizes.max()) if num_shards else 0
    nodes_per_shard = max(
        node_multiple, -(-nodes_per_shard // node_multiple) * node_multiple
    )
    n_pad = num_shards * nodes_per_shard

    features = np.zeros((n_pad, f), np.float32)
    labels = np.full(n_pad, -1, np.int32)
    for s in range(num_shards):
        lo, hi = node_bounds[s], node_bounds[s + 1]
        o = s * nodes_per_shard
        features[o : o + (hi - lo)] = graph.features[lo:hi]
        labels[o : o + (hi - lo)] = graph.labels[lo:hi]

    src, dst = graph.src, graph.dst  # dst sorted ascending
    # shard s owns dst in [node_bounds[s], node_bounds[s+1]); edges stay
    # contiguous because dst is sorted
    ebounds = row_ptr[node_bounds]
    counts = np.diff(ebounds)
    edges_per_shard = int(counts.max()) if counts.size else 0
    edges_per_shard = max(
        edge_multiple, -(-edges_per_shard // edge_multiple) * edge_multiple
    )

    # src global id -> slot id (block + offset)
    src_block = np.searchsorted(node_bounds, src, side="right") - 1
    src_slot = (
        src_block.astype(np.int64) * nodes_per_shard
        + src.astype(np.int64)
        - node_bounds[src_block]
    ).astype(np.int32)

    src_p = np.zeros((num_shards, edges_per_shard), np.int32)
    dst_l = np.full((num_shards, edges_per_shard), nodes_per_shard, np.int32)
    for s in range(num_shards):
        lo, hi = ebounds[s], ebounds[s + 1]
        c = hi - lo
        src_p[s, :c] = src_slot[lo:hi]
        dst_l[s, :c] = dst[lo:hi] - node_bounds[s]

    return PartitionedGraph(
        features=features,
        labels=labels,
        src=src_p.reshape(-1),
        dst_local=dst_l.reshape(-1),
        num_shards=num_shards,
        nodes_per_shard=nodes_per_shard,
        edges_per_shard=edges_per_shard,
        num_real_nodes=n,
        num_real_edges=graph.num_edges,
        node_bounds=node_bounds,
        edge_counts=counts.astype(np.int64),
    )


def _shard_csr(dst_shard, src_shard, nps):
    """Filter one shard's padded edge slice down to its real edges and
    rebuild the local CSR: returns (row_ptr [nps+1], src_s). dst stays
    sorted (partition slices are dst-sorted; the mask filters in order).
    Shared by every per-shard layout builder."""
    real = dst_shard < nps
    dst_s = dst_shard[real]
    src_s = src_shard[real]
    counts = np.bincount(dst_s, minlength=nps)
    row_ptr = np.zeros(nps + 1, np.int64)
    np.cumsum(counts, out=row_ptr[1:])
    return row_ptr, src_s


def prepare_partitioned_tiles(
    pg: PartitionedGraph, tile_e: int | None = 128, num_chunks: int = 1,
    halo_plan: "HaloPlan | None" = None, max_hd: int | None = None,
):
    """Per-shard Pallas edge tilings, stacked on a leading shard axis.

    Each shard's edge set is BIPARTITE: destinations are the shard's local
    nodes, sources are GLOBAL node ids (gathered from the halo all_gather's
    output inside the sharded step). All shards are padded to identical
    array shapes so the stacked EdgeTiles can be shard_map'ed over the
    'graph' mesh axis (see parallel/sharded.py).
    """
    import jax
    import jax.numpy as jnp

    from gatv2_tpu.ops.pallas_attention import EdgeTiles, prepare_edge_tiles

    s_count = pg.num_shards
    nps = pg.nodes_per_shard
    if halo_plan is not None:
        # src ids index the per-shard gather space [zs_loc | halo rows]
        n_glob = halo_plan.space_size
        src_all = halo_plan.src_halo
    else:
        n_glob = pg.padded_num_nodes
        src_all = pg.src.reshape(s_count, -1)
    dst_all = pg.dst_local.reshape(s_count, -1)

    per_shard = []
    for s in range(s_count):
        row_ptr, src_s = _shard_csr(dst_all[s], src_all[s], nps)
        per_shard.append(
            # max_hd (the widest layer's lane count) VMEM-caps the
            # auto-selected tile size exactly like setup_full_graph does
            # on the unsharded path; moot at the default tile_e=128
            prepare_edge_tiles(
                row_ptr, src_s, nps, tile_e=tile_e, num_chunks=num_chunks,
                num_src_nodes=n_glob, max_hd=max_hd,
            )
        )
        if tile_e is None:
            # tile_e=None auto-selects per degree profile; the stacked
            # layout's static aux (shard 0's) must describe EVERY shard,
            # so pin the remaining shards to shard 0's choice
            tile_e = per_shard[0].tile_e

    return _stack_tiles(per_shard)


def _build_sell_shards(src_all, dst_all, nps, n_glob, split_cap="default",
                       num_chunks=1):
    """Stacked per-shard bipartite SELL layouts with both sides' column
    AND row-slice counts forced to the cross-shard max (fixed mode), so
    every stacked leaf has identical shape and the static aux agrees.

    split_cap: "default" uses the library default (hub rows split into
    virtual rows); None disables splitting (required by the merge path)."""
    from gatv2_tpu.ops.sell_attention import (
        DEFAULT_SPLIT_CAP,
        TILE_N,
        _side_geometry,
        prepare_sell_tiles,
    )

    cap = DEFAULT_SPLIT_CAP if split_cap == "default" else split_cap
    shards = []
    cols_d = cols_s = tiles_d = tiles_s = 1
    max_deg_d = max_deg_s = 0
    for s in range(len(dst_all)):
        row_ptr, src_s = _shard_csr(dst_all[s], src_all[s], nps)
        shards.append((row_ptr, src_s))
        deg_d = np.diff(row_ptr)
        deg_s = np.bincount(src_s, minlength=n_glob)
        # geometry under the ACTUAL chunk count: t2 is rounded to
        # num_chunks * slices-per-chunk, so the cross-shard max stays a
        # valid fixed tile count for every shard's chunk grid
        t_d, _, e_ell, _ = _side_geometry(deg_d, num_chunks, split_cap=cap)
        t_s, _, e2_ell, _ = _side_geometry(deg_s, num_chunks, split_cap=cap)
        cols_d = max(cols_d, e_ell // TILE_N)
        cols_s = max(cols_s, e2_ell // TILE_N)
        tiles_d = max(tiles_d, t_d)
        tiles_s = max(tiles_s, t_s)
        max_deg_d = max(max_deg_d, int(deg_d.max(initial=0)))
        max_deg_s = max(max_deg_s, int(deg_s.max(initial=0)))

    if cap is None:
        from gatv2_tpu.ops.sell_attention import DEFAULT_SPLIT_CAP as _dc

        hub = max(max_deg_d, max_deg_s)
        if hub > 4 * _dc:
            raise ValueError(
                f"split_cap=None (the merged-softmax overlap path) on a "
                f"hub-heavy partition: max degree {hub} would pad its "
                f"whole SELL slice to the hub degree (10-49x measured on "
                f"Zipf graphs). Use the single-pass sharded SELL layer "
                f"(no --overlap), which splits hub rows."
            )

    # the "is this side split" decision must be UNIFORM across shards (it
    # is static aux): split whenever ANY shard would split
    any_split_d = cap is not None and max_deg_d > cap
    any_split_s = cap is not None and max_deg_s > cap

    if len(shards) == 1:
        # single shard: no stacking constraints — build the tight layout
        # (chunked or not) without fixed-mode padding
        row_ptr, src_s = shards[0]
        return _stack_tiles([
            prepare_sell_tiles(
                row_ptr, src_s, nps, num_src_nodes=n_glob,
                num_chunks=num_chunks, split_cap=cap,
            )
        ])
    # multi-shard (chunked or not): fixed mode forces both sides' column
    # and row-slice counts to the cross-shard max so every stacked leaf
    # has identical shape; for chunked layouts the per-chunk grouped
    # arrays are additionally padded to the cross-shard max by
    # _stack_tiles (pad slots re-filled with the side's sentinel)
    per_shard = [
        prepare_sell_tiles(
            row_ptr, src_s, nps, num_src_nodes=n_glob,
            fixed=(cols_d, cols_s, tiles_d, tiles_s),
            split_cap=cap, num_chunks=num_chunks,
            force_split=(any_split_d, any_split_s),
        )
        for row_ptr, src_s in shards
    ]
    return _stack_tiles(per_shard)


def prepare_partitioned_sell_tiles(
    pg: PartitionedGraph, halo_plan: "HaloPlan | None" = None,
    num_chunks: int | None = 1, heads=None, out_dims=None,
    budget_bytes=None,
):
    """Per-shard SELL layouts (ops.sell_attention), stacked on a leading
    shard axis — the impl='sell' counterpart of prepare_partitioned_tiles.

    Each shard's edge set is bipartite (dst = the shard's local nodes,
    src = the per-shard gather space: [local | halo rows] with a halo
    plan, the padded global space otherwise).

    num_chunks=None auto-picks the chunk count from the model widths
    (heads/out_dims, like setup_full_graph_sell) so per-shard edge-space
    temporaries fit budget_bytes: the WORST shard's edge set decides (all
    shards must share one chunk grid — static aux), evaluated on every
    shard's real CSR."""
    s_count = pg.num_shards
    nps = pg.nodes_per_shard
    if halo_plan is not None:
        n_glob = halo_plan.space_size
        src_all = halo_plan.src_halo
    else:
        n_glob = pg.padded_num_nodes
        src_all = pg.src.reshape(s_count, -1)
    dst_all = pg.dst_local.reshape(s_count, -1)
    if num_chunks is None:
        from gatv2_tpu.ops.sell_attention import suggest_chunks_for_graph

        num_chunks = 1
        if heads is not None:
            for s in range(s_count):
                row_ptr, src_s = _shard_csr(dst_all[s], src_all[s], nps)
                num_chunks = max(num_chunks, suggest_chunks_for_graph(
                    row_ptr, src_s, n_glob, heads, out_dims,
                    budget_bytes=budget_bytes,
                ))
    return _build_sell_shards(
        src_all, dst_all, nps, n_glob, num_chunks=num_chunks
    )


def prepare_overlap_sell_tiles(
    pg: PartitionedGraph, plan: "HaloPlan", split: "OverlapSplit"
):
    """Per-shard SELL layout PAIRS for the halo/compute-overlap layer
    (ops.sell_attention.sell_attention_merge): the LOCAL pass's src space
    is the shard's own nodes, the HALO pass's src space is the halo table.
    Returns (stacked_local_tiles, stacked_halo_tiles)."""
    nps = pg.nodes_per_shard
    # the merged-softmax kernels need UNSPLIT layouts (their per-pass
    # stats merge across passes, not across a node's virtual rows)
    return (
        _build_sell_shards(
            split.local_src, split.local_dst, nps, nps, split_cap=None
        ),
        _build_sell_shards(
            split.halo_src, split.halo_dst, nps, plan.halo_size,
            split_cap=None,
        ),
    )


def _stack_tiles(per_shard):
    """Pad every array leaf to the max shape across shards and stack on a
    leading shard axis (tail regions are never referenced: the per-tile
    offsets only cover real edge tiles). The static aux data (tile_e,
    chunking, node counts) is taken from shard 0 and must agree across
    shards — enforced here because a silent mismatch would make the kernel
    stream wrong edge ranges."""
    import jax
    import jax.numpy as jnp

    leaves = [jax.tree.flatten(t)[0] for t in per_shard]
    treedef = jax.tree.flatten(per_shard[0])[1]
    for s, t in enumerate(per_shard[1:], 1):
        if jax.tree.flatten(t)[1] != treedef:
            raise ValueError(
                f"shard {s}'s tile aux data (tile_e/chunking/node counts) "
                f"differs from shard 0's — stacked tiles must be uniform"
            )
    stacked = []
    for i in range(len(leaves[0])):
        arrs = [np.asarray(l[i]) for l in leaves]
        max_shape = tuple(
            max(a.shape[d] for a in arrs) for d in range(arrs[0].ndim)
        )
        padded = []
        for a in arrs:
            pad = [(0, m - sz) for sz, m in zip(a.shape, max_shape)]
            padded.append(np.pad(a, pad))
        stacked.append(jnp.asarray(np.stack(padded)))
    out = jax.tree.unflatten(treedef, stacked)
    return _harden_stacked_pad_ids(out, per_shard)


def _harden_stacked_pad_ids(out, per_shard):
    """Re-fill the regions cross-shard stacking ADDED to the gather-id
    arrays with each side's pad sentinel instead of np.pad's zeros.

    The kernels never stream those regions (rel_offsets/col_off bound the
    real columns), so zeros are safe today — but a zero aliases chunk row
    0, and a future kernel change that read one slot too many would
    silently accumulate into a real row. The sentinel (the opposite
    side's padded node count) makes such a bug gather the appended zero
    row instead."""
    import dataclasses as _dc

    import jax.numpy as jnp

    def refill(stacked_arr, originals, sentinel):
        a = np.array(stacked_arr)  # writable copy (device arrays view-only)
        changed = False
        for s, orig in enumerate(originals):
            o = np.asarray(orig)
            if o.shape == a.shape[1:]:
                continue
            mask = np.ones(a.shape[1:], bool)
            mask[tuple(slice(0, d) for d in o.shape)] = False
            a[s][mask] = sentinel
            changed = True
        return jnp.asarray(a) if changed else stacked_arr

    first = per_shard[0]
    if hasattr(first, "dst_side") and first.dst_side is not None:
        # pallas EdgeTiles: ids_grp pads match no row of the chunk grid
        from gatv2_tpu.ops.pallas_attention import TILE_N as _tn

        d_pad = out.tiles_per_chunk * _tn
        s_tiles = (
            out.src_tiles_per_chunk
            if out.src_tiles_per_chunk >= 0
            else out.tiles_per_chunk
        )
        out = _dc.replace(
            out,
            dst_side=_dc.replace(
                out.dst_side,
                ids_grp=refill(
                    out.dst_side.ids_grp,
                    [t.dst_side.ids_grp for t in per_shard], d_pad,
                ),
            ),
            src_side=_dc.replace(
                out.src_side,
                ids_grp=refill(
                    out.src_side.ids_grp,
                    [t.src_side.ids_grp for t in per_shard],
                    s_tiles * _tn,
                ),
            ),
        )
    elif hasattr(first, "srcs"):
        # SellTiles: gather ids address the OPPOSITE side's node grid
        out = _dc.replace(
            out,
            dst=_dc.replace(
                out.dst,
                gather_ids=refill(
                    out.dst.gather_ids,
                    [t.dst.gather_ids for t in per_shard],
                    out.padded_src_nodes,
                ),
                ids_grp=refill(
                    out.dst.ids_grp,
                    [t.dst.ids_grp for t in per_shard],
                    out.padded_src_nodes,
                ),
            ),
            srcs=_dc.replace(
                out.srcs,
                gather_ids=refill(
                    out.srcs.gather_ids,
                    [t.srcs.gather_ids for t in per_shard],
                    out.padded_num_nodes,
                ),
                ids_grp=refill(
                    out.srcs.ids_grp,
                    [t.srcs.ids_grp for t in per_shard],
                    out.padded_num_nodes,
                ),
            ),
        )
    return out


def prepare_overlap_tiles(
    pg: PartitionedGraph, plan: "HaloPlan", split: "OverlapSplit",
    tile_e: int = 128,
):
    """Per-shard tile PAIRS for the Pallas halo/compute-overlap layer
    (ops.pallas_attention.edge_attention_pallas_merge): the LOCAL pass's
    src space is the shard's own nodes, the HALO pass's src space is the
    halo table. Returns (stacked_local_tiles, stacked_halo_tiles)."""
    from gatv2_tpu.ops.pallas_attention import prepare_edge_tiles

    s_count, nps = pg.num_shards, pg.nodes_per_shard

    def build(src_all, dst_all, n_src):
        per = []
        for s in range(s_count):
            row_ptr, src_s = _shard_csr(dst_all[s], src_all[s], nps)
            per.append(
                prepare_edge_tiles(
                    row_ptr, src_s, nps, tile_e=tile_e, num_src_nodes=n_src
                )
            )
        return _stack_tiles(per)

    return (
        build(split.local_src, split.local_dst, nps),
        build(split.halo_src, split.halo_dst, plan.halo_size),
    )


@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Boundary-only exchange plan (SURVEY.md §5 'long-context' row).

    Instead of all_gathering every node's src projection, each shard sends
    only the rows its peers' edges reference. OWN-shard rows are never
    exchanged: the sharded layer gathers from the concatenation
    [zs_loc (nps rows) | halo table (S*M exchanged rows)], so only the
    cross-shard edge cut moves over ICI (a shard's densest block is
    usually its own diagonal — including it used to inflate M and could
    even disable the plan on exactly the high-locality partitions it
    targets).

      send_ids [S, S, M]  send_ids[i, j] = i-local node ids shard j needs
                          from shard i (0-padded to the common OFF-DIAGONAL
                          max M; the i == j block is unused);
      src_halo [S, E_s]   each edge's src remapped to its gather slot:
                          LOCAL src -> its zs_loc row (< nps); remote src
                          from shard i at send position k -> nps + i*M + k.

    Communication volume is O(S * M * HD) per shard, M tracking the
    cross-shard edge cut. (On locality-free random graphs M ~ N/S and the
    plan degenerates to an all_gather's volume — use the all_gather path
    there.)
    """

    send_ids: np.ndarray  # [S, S, M] int32
    src_halo: np.ndarray  # [S, edges_per_shard] int32 (gather-slot ids)
    halo_size: int  # S * M (exchanged rows per shard; gather space adds nps)
    m_per_pair: int
    nodes_per_shard: int  # local rows preceding the halo table in the space

    @property
    def space_size(self) -> int:
        """Rows of the per-shard gather space: [zs_loc | halo table]."""
        return self.nodes_per_shard + self.halo_size


def halo_exchange_plan(pg: PartitionedGraph, *, pad_multiple: int = 8) -> HaloPlan:
    s_count, nps = pg.num_shards, pg.nodes_per_shard
    src = pg.src.reshape(s_count, -1)
    dst = pg.dst_local.reshape(s_count, -1)

    # per (owner i, consumer j != i): sorted unique i-local ids j references
    needed: list[list[np.ndarray]] = []
    m = 1
    for j in range(s_count):
        real = dst[j] < nps
        uniq = np.unique(src[j][real])
        owners = uniq // nps
        per_owner = []
        for i in range(s_count):
            if i == j:
                # own rows come straight from zs_loc — never exchanged
                per_owner.append(np.empty(0, np.int64))
                continue
            ids = uniq[owners == i] - i * nps
            per_owner.append(ids.astype(np.int64))
            m = max(m, len(ids))
        needed.append(per_owner)
    m = -(-m // pad_multiple) * pad_multiple

    send_ids = np.zeros((s_count, s_count, m), np.int32)
    for j in range(s_count):
        for i in range(s_count):
            ids = needed[j][i]
            send_ids[i, j, : len(ids)] = ids

    # remap each shard's edge srcs to gather slots in [zs_loc | halo table]
    src_halo = np.zeros((s_count, src.shape[1]), np.int32)
    for j in range(s_count):
        real = dst[j] < nps
        g_ids = src[j][real].astype(np.int64)
        owners = g_ids // nps
        local = g_ids - owners * nps
        slots = np.empty(g_ids.shape[0], np.int64)
        for i in range(s_count):
            sel = owners == i
            if not sel.any():
                continue
            if i == j:
                slots[sel] = local[sel]  # direct zs_loc rows
                continue
            # position of each referenced id inside the (sorted) send list
            k = np.searchsorted(needed[j][i], local[sel])
            slots[sel] = nps + i * m + k
        src_halo[j, real] = slots.astype(np.int32)
    return HaloPlan(
        send_ids=send_ids,
        src_halo=src_halo,
        halo_size=s_count * m,
        m_per_pair=m,
        nodes_per_shard=nps,
    )


@dataclasses.dataclass(frozen=True)
class OverlapSplit:
    """Edge split for halo/compute overlap (SURVEY.md §5 long-context row).

    Each shard's edges are divided by src ownership:
      - LOCAL edges (src owned by the shard) read zs_loc directly and can
        run while the halo all_to_all is in flight;
      - HALO edges read the exchanged halo-table rows.
    The destination softmax spans both sets, so the sharded layer computes
    per-set online-softmax stats (m, Σexp, Σexp·zs) and merges them — the
    graph-world analog of ring-attention's stat merge.

    local_src [S, E_l]  src row idx INTO zs_loc (pad 0)
    local_dst [S, E_l]  local dst (pad nodes_per_shard)
    halo_src  [S, E_h]  slot idx into the halo table (pad 0)
    halo_dst  [S, E_h]  local dst (pad nodes_per_shard)
    """

    local_src: np.ndarray
    local_dst: np.ndarray
    halo_src: np.ndarray
    halo_dst: np.ndarray


def overlap_split_plan(
    pg: PartitionedGraph, plan: HaloPlan, *, pad_multiple: int = 8
) -> OverlapSplit:
    s_count, nps = pg.num_shards, pg.nodes_per_shard
    src = pg.src.reshape(s_count, -1)  # slot ids
    dst = pg.dst_local.reshape(s_count, -1)
    halo = plan.src_halo  # [S, E_s] halo-slot ids (valid on real edges)

    locals_, halos = [], []
    for j in range(s_count):
        real = dst[j] < nps
        own = (src[j] // nps) == j
        li = real & own
        hi = real & ~own
        locals_.append((src[j][li] % nps, dst[j][li]))
        # src_halo numbers remote rows nps + slot (the concat gather space);
        # the overlap halo pass gathers from the halo TABLE alone
        halos.append((halo[j][hi] - nps, dst[j][hi]))

    def pad_stack(pairs):
        m = max((p[0].shape[0] for p in pairs), default=0)
        m = max(pad_multiple, -(-m // pad_multiple) * pad_multiple)
        s_arr = np.zeros((s_count, m), np.int32)
        d_arr = np.full((s_count, m), nps, np.int32)
        for j, (s_, d_) in enumerate(pairs):
            s_arr[j, : s_.shape[0]] = s_
            d_arr[j, : d_.shape[0]] = d_
        return s_arr, d_arr

    ls, ld = pad_stack(locals_)
    hs, hd = pad_stack(halos)
    return OverlapSplit(local_src=ls, local_dst=ld, halo_src=hs, halo_dst=hd)
