// Native neighbor sampler: host-side frontier expansion for minibatch
// training (gatv2_tpu/data/sampling.py is the Python fallback with the same
// semantics). The reference has no sampling at all (full-graph only,
// GATv2_edge_based.cu:1370-1438); this is the scale path for OGBN-Products,
// where Python per-node loops would starve the device.
//
// One call = one GraphSAGE-style layer-wise sample:
//   - seeds get local ids 0..num_seeds-1,
//   - L rounds of frontier expansion picking at most fanout[l] in-neighbors
//     per frontier node (all of them when degree <= fanout, else a uniform
//     without-replacement draw via Floyd's algorithm),
//   - emitted edges (src_local, dst_local) are counting-sorted by dst.
//
// RNG: splitmix64 streams seeded per call — deterministic for a given
// (seed, batch) and independent across batches. (The Python fallback uses
// numpy's Philox; the two produce differently-seeded but identically-
// distributed samples.)
//
// Build: make -C native  ->  libgatv2_loader.so (shared with loader.cpp)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <sched.h>

#include "cpuinfo.h"
#include <thread>
#include <vector>

namespace {

struct SplitMix64 {
  uint64_t state;
  explicit SplitMix64(uint64_t seed) : state(seed) {}
  uint64_t next() {
    uint64_t z = (state += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  // uniform in [0, n) without modulo bias (Lemire)
  uint64_t bounded(uint64_t n) {
    while (true) {
      uint64_t x = next();
      __uint128_t m = static_cast<__uint128_t>(x) * n;
      uint64_t lo = static_cast<uint64_t>(m);
      if (lo >= n || lo >= (-n) % n) return static_cast<uint64_t>(m >> 64);
    }
  }
};

// open-addressing hash map: global node id -> local id
struct NodeMap {
  std::vector<int64_t> keys;   // -1 = empty
  std::vector<int32_t> vals;
  size_t mask;
  explicit NodeMap(size_t capacity) {
    size_t sz = 16;
    while (sz < capacity * 2) sz <<= 1;
    keys.assign(sz, -1);
    vals.assign(sz, -1);
    mask = sz - 1;
  }
  // returns local id, or -1 if absent and insert_id < 0
  int32_t get_or_insert(int64_t key, int32_t insert_id) {
    size_t h = static_cast<uint64_t>(key) * 0x9e3779b97f4a7c15ULL;
    size_t i = h & mask;
    while (true) {
      if (keys[i] == key) return vals[i];
      if (keys[i] < 0) {
        if (insert_id < 0) return -1;
        keys[i] = key;
        vals[i] = insert_id;
        return insert_id;
      }
      i = (i + 1) & mask;
    }
  }
};

}  // namespace

extern "C" {

// Draw exactly min(deg, fanout) distinct neighbor EDGE indices for one
// node into `dst` (preallocated). Deterministic per (rng_seed, layer,
// v_glob) — the per-node stream makes the draws thread-order-independent,
// so frontier expansion parallelizes without changing results.
static void draw_neighbors(
    const int64_t* row_ptr, int32_t v_glob, int64_t fanout,
    uint64_t rng_seed, int layer, int64_t* dst) {
  const int64_t lo = row_ptr[v_glob], hi = row_ptr[v_glob + 1];
  const int64_t deg = hi - lo;
  if (deg <= 0) return;
  if (deg <= fanout) {
    for (int64_t e = lo; e < hi; ++e) *dst++ = e;
    return;
  }
  uint64_t node_seed = rng_seed;
  node_seed ^= (static_cast<uint64_t>(v_glob) + 0x9e3779b97f4a7c15ULL) *
               0xbf58476d1ce4e5b9ULL;
  node_seed ^= (static_cast<uint64_t>(layer) + 1) * 0x94d049bb133111ebULL;
  SplitMix64 rng(node_seed);
  // Floyd's algorithm: fanout distinct draws from [0, deg)
  NodeMap seen(static_cast<size_t>(fanout));
  int32_t cnt = 0;
  for (int64_t j = deg - fanout; j < deg; ++j) {
    int64_t t = static_cast<int64_t>(rng.bounded(j + 1));
    if (seen.get_or_insert(t, cnt) != cnt) {
      seen.get_or_insert(j, cnt);  // t already taken -> take j
      *dst++ = lo + j;
    } else {
      *dst++ = lo + t;
    }
    ++cnt;
  }
}

// Samples one minibatch subgraph. Returns the number of batch nodes, or -1
// on invalid arguments. Outputs:
//   out_nodes     [max_nodes]  global ids of batch nodes (local id = index)
//   out_src/out_dst [max_edges] local-id edges, dst-sorted; padding slots
//                 get src=0, dst=max_nodes
//   out_num_edges [1]          real edge count
//
// Per layer the expensive part — RNG draws + Floyd sampling over the whole
// frontier — runs in parallel (per-node RNG streams keep it deterministic);
// only the dedup/emit walk over the drawn edges is sequential (hash-map
// inserts assign local ids in frontier order).
long long sample_batch(
    const int64_t* row_ptr, const int32_t* col_idx, long long graph_nodes,
    const int32_t* seeds, long long num_seeds,
    const int32_t* fanouts, int num_layers,
    long long max_nodes, long long max_edges,
    uint64_t rng_seed,
    int32_t* out_nodes, int32_t* out_src, int32_t* out_dst,
    long long* out_num_edges) {
  if (num_seeds <= 0 || num_seeds > max_nodes || num_layers < 0) return -1;
  const uint64_t seed_base =
      rng_seed * 0x2545f4914f6cdd1dULL + 0x9e3779b97f4a7c15ULL;

  NodeMap map(static_cast<size_t>(max_nodes));
  std::vector<int32_t> nodes;
  nodes.reserve(static_cast<size_t>(max_nodes));
  for (long long i = 0; i < num_seeds; ++i) {
    int64_t s = seeds[i];
    if (s < 0 || s >= graph_nodes) return -1;
    if (map.get_or_insert(s, static_cast<int32_t>(nodes.size())) ==
        static_cast<int32_t>(nodes.size())) {
      nodes.push_back(static_cast<int32_t>(s));
    }
  }

  std::vector<int32_t> esrc, edst;
  esrc.reserve(static_cast<size_t>(max_edges));
  edst.reserve(static_cast<size_t>(max_edges));

  std::vector<int32_t> frontier(nodes);  // global ids
  std::vector<int32_t> next_frontier;

  for (int l = 0; l < num_layers; ++l) {
    const int64_t fanout = fanouts[l];
    const size_t fsize = frontier.size();

    // Phase A (parallel): draws land in ONE flat buffer at per-node
    // offsets (each node draws exactly min(deg, fanout) — prefix-summed),
    // and the cache-miss-heavy col_idx resolution happens here too; the
    // sequential phase keeps only the dedup.
    unsigned hw = gatv2_usable_cpus();
    unsigned nt = fsize >= 1024 ? hw : 1;
    if (nt > fsize && fsize > 0) nt = static_cast<unsigned>(fsize);
    if (nt == 0) nt = 1;
    std::vector<size_t> off(fsize + 1, 0);
    for (size_t f = 0; f < fsize; ++f) {
      const int64_t deg =
          row_ptr[frontier[f] + 1] - row_ptr[frontier[f]];
      const int64_t take = deg < fanout ? (deg > 0 ? deg : 0) : fanout;
      off[f + 1] = off[f] + static_cast<size_t>(take);
    }
    std::vector<int64_t> drawn(off[fsize]);
    {
      std::vector<std::thread> threads;
      threads.reserve(nt);
      for (unsigned t = 0; t < nt; ++t) {
        const size_t lo_f = fsize * t / nt;
        const size_t hi_f = fsize * (t + 1) / nt;
        auto work = [&, lo_f, hi_f]() {
          for (size_t f = lo_f; f < hi_f; ++f) {
            int64_t* p = drawn.data() + off[f];
            draw_neighbors(row_ptr, frontier[f], fanout, seed_base, l, p);
            for (size_t k = off[f]; k < off[f + 1]; ++k)
              drawn[k] = col_idx[drawn[k]];
          }
        };
        if (nt == 1) {
          work();
        } else {
          threads.emplace_back(work);
        }
      }
      for (auto& th : threads) th.join();
    }

    // Phase B (sequential): dedup + edge emission in frontier order.
    next_frontier.clear();
    for (size_t f = 0; f < fsize; ++f) {
      const int32_t v_loc = map.get_or_insert(frontier[f], -1);
      for (size_t k = off[f]; k < off[f + 1]; ++k) {
        const int64_t u_glob = drawn[k];
        if (u_glob < 0 || u_glob >= graph_nodes) return -1;
        int32_t u_loc = map.get_or_insert(u_glob, -1);
        if (u_loc < 0) {
          if (static_cast<long long>(nodes.size()) >= max_nodes) {
            continue;  // static budget exhausted (rare)
          }
          u_loc = static_cast<int32_t>(nodes.size());
          map.get_or_insert(u_glob, u_loc);
          nodes.push_back(static_cast<int32_t>(u_glob));
          next_frontier.push_back(static_cast<int32_t>(u_glob));
        }
        if (static_cast<long long>(esrc.size()) >= max_edges) continue;
        esrc.push_back(u_loc);
        edst.push_back(v_loc);
      }
    }
    frontier.swap(next_frontier);
  }

  // counting sort by dst (stable) into the padded output
  const size_t num_edges = esrc.size();
  const size_t nn = nodes.size();
  std::vector<int64_t> counts(nn + 1, 0);
  for (size_t e = 0; e < num_edges; ++e) counts[edst[e]]++;
  int64_t acc = 0;
  for (size_t i = 0; i <= nn; ++i) {
    int64_t c = counts[i];
    counts[i] = acc;
    acc += c;
  }
  for (long long e = 0; e < max_edges; ++e) {
    out_src[e] = 0;
    out_dst[e] = static_cast<int32_t>(max_nodes);
  }
  for (size_t e = 0; e < num_edges; ++e) {
    int64_t pos = counts[edst[e]]++;
    out_src[pos] = esrc[e];
    out_dst[pos] = edst[e];
  }
  for (size_t i = 0; i < nn; ++i) out_nodes[i] = nodes[i];
  for (long long i = static_cast<long long>(nn); i < max_nodes; ++i) {
    out_nodes[i] = 0;
  }
  *out_num_edges = static_cast<long long>(num_edges);
  return static_cast<long long>(nn);
}

// Emits the fixed-budget Pallas edge tiling for one sampled batch — the
// native counterpart of ops.pallas_attention.prepare_edge_tiles(...,
// fixed_edge_tiles=K, num_chunks=1), byte-identical output. Moving this
// from numpy into C++ removes the last host-side bottleneck of the
// minibatch pipeline (per-batch tile prep was ~60% of host time).
//
// Inputs: (src, dst) local-id edges, dst-SORTED (sample_batch's output
// layout), num_edges real edges, max_nodes a multiple of 128 (the node
// tile), te the edge-tile width, want = fixed_edge_tiles * te.
// Outputs (lengths: want unless noted; T = max_nodes/128 node tiles):
//   flat dst-sorted layout : out_src_flat (pad 0), out_dst_flat
//                            (pad max_nodes), out_tile_offsets [T+1]
//   src-sorted mirror      : out_src_sorted_ids (pad max_nodes),
//                            out_gather_perm (pad 0, positions in the
//                            padded dst layout), out_dst_of_src (pad 0),
//                            out_src_tile_offsets [T+1]
// Returns 0, or -1 when the fixed budget/arguments don't fit.
long long emit_tiles(
    const int32_t* src, const int32_t* dst, long long num_edges,
    long long max_nodes, long long te, long long want,
    int32_t* out_src_flat, int32_t* out_dst_flat, int32_t* out_tile_offsets,
    int32_t* out_src_sorted_ids, int32_t* out_gather_perm,
    int32_t* out_dst_of_src, int32_t* out_src_tile_offsets) {
  constexpr long long kTileN = 128;
  if (max_nodes <= 0 || max_nodes % kTileN || te <= 0 || num_edges < 0) {
    return -1;
  }
  const long long num_tiles = max_nodes / kTileN;

  // --- dst-sorted layout: per-node-tile contiguous runs, te-padded -------
  std::vector<int64_t> counts_d(num_tiles, 0);
  for (long long e = 0; e < num_edges; ++e) {
    const int32_t d = dst[e];
    if (d < 0 || d >= max_nodes) return -1;
    if (e > 0 && dst[e - 1] > d) return -1;  // must be dst-sorted
    counts_d[d / kTileN]++;
  }
  out_tile_offsets[0] = 0;
  for (long long i = 0; i < num_tiles; ++i) {
    out_tile_offsets[i + 1] =
        out_tile_offsets[i] + static_cast<int32_t>((counts_d[i] + te - 1) / te);
  }
  if (static_cast<long long>(out_tile_offsets[num_tiles]) * te > want) {
    return -1;
  }
  for (long long i = 0; i < want; ++i) {
    out_src_flat[i] = 0;
    out_dst_flat[i] = static_cast<int32_t>(max_nodes);
  }
  std::vector<int32_t> flat_pos(num_edges);  // padded-layout position of e
  {
    long long e = 0;
    for (long long i = 0; i < num_tiles; ++i) {
      long long o = static_cast<long long>(out_tile_offsets[i]) * te;
      for (long long c = 0; c < counts_d[i]; ++c, ++e, ++o) {
        out_src_flat[o] = src[e];
        out_dst_flat[o] = dst[e];
        flat_pos[e] = static_cast<int32_t>(o);
      }
    }
  }

  // --- src-sorted mirror: stable counting sort by src node ---------------
  std::vector<int64_t> node_pos(max_nodes + 1, 0);
  for (long long e = 0; e < num_edges; ++e) {
    const int32_t s = src[e];
    if (s < 0 || s >= max_nodes) return -1;
    node_pos[s + 1]++;
  }
  for (long long i = 0; i < max_nodes; ++i) node_pos[i + 1] += node_pos[i];
  std::vector<int32_t> srt_src(num_edges), srt_flat(num_edges);
  for (long long e = 0; e < num_edges; ++e) {
    const int64_t p = node_pos[src[e]]++;
    srt_src[p] = src[e];
    srt_flat[p] = flat_pos[e];
  }
  std::vector<int64_t> counts_s(num_tiles, 0);
  for (long long e = 0; e < num_edges; ++e) counts_s[srt_src[e] / kTileN]++;
  out_src_tile_offsets[0] = 0;
  for (long long i = 0; i < num_tiles; ++i) {
    out_src_tile_offsets[i + 1] =
        out_src_tile_offsets[i] +
        static_cast<int32_t>((counts_s[i] + te - 1) / te);
  }
  if (static_cast<long long>(out_src_tile_offsets[num_tiles]) * te > want) {
    return -1;
  }
  for (long long i = 0; i < want; ++i) {
    out_src_sorted_ids[i] = static_cast<int32_t>(max_nodes);
    out_gather_perm[i] = 0;
    out_dst_of_src[i] = 0;
  }
  {
    long long e = 0;
    for (long long i = 0; i < num_tiles; ++i) {
      long long o = static_cast<long long>(out_src_tile_offsets[i]) * te;
      for (long long c = 0; c < counts_s[i]; ++c, ++e, ++o) {
        out_src_sorted_ids[o] = srt_src[e];
        out_gather_perm[o] = srt_flat[e];
        out_dst_of_src[o] = out_dst_flat[srt_flat[e]];
      }
    }
  }
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// SELL-128 minibatch layout emission (impl='sell' minibatch training)
// ---------------------------------------------------------------------------
//
// Native counterpart of ops.sell_attention.prepare_minibatch_sell_tiles —
// byte-identical output for the forced-split, num_chunks=1, fixed-geometry
// configuration that per-batch layouts use (the numpy build costs ~700 ms
// per Products-scale batch, dominated by argsorts the small value ranges
// here replace with counting sorts).

namespace {

// One SELL side (forced virtual-row splitting, one chunk). Mirrors
// _build_sell_side(ptr, opp, num_rows, opp_pad_rows, 1, fixed=(cols,tiles),
// split_cap=cap, force_split=True) exactly. `ptr`/`opp`: this side's CSR
// view (edges sorted by this side's node id, stable). `slot[e]` receives
// each edge's ELL slot in this side's edge order. Returns 0, or -1 when
// the fixed geometry does not fit.
int build_sell_side(
    const int64_t* ptr, const int32_t* opp, int64_t num_rows,
    int64_t num_edges, int64_t opp_pad_rows, int64_t cap,
    int64_t fixed_cols, int64_t fixed_tiles,
    int32_t* out_perm, int32_t* out_vsort, int32_t* out_sids,
    int32_t* out_gather, int32_t* out_cnt, int32_t* out_col_off,
    int64_t* slot) {
  constexpr int64_t kTileN = 128;
  // virtual-row decomposition: nonempty nodes get ceil(deg/cap) rows
  std::vector<int64_t> vbase(num_rows + 1, 0);
  for (int64_t i = 0; i < num_rows; ++i) {
    const int64_t deg = ptr[i + 1] - ptr[i];
    vbase[i + 1] = vbase[i] + (deg > 0 ? (deg + cap - 1) / cap : 0);
  }
  const int64_t nvr = vbase[num_rows];
  const int64_t t_real =
      ((nvr > 1 ? nvr : 1) + kTileN - 1) / kTileN;
  if (t_real > fixed_tiles) return -1;
  const int64_t t2 = fixed_tiles;
  const int64_t rows_pad = t2 * kTileN;
  const int64_t node_pad =
      num_rows > kTileN ? ((num_rows + kTileN - 1) / kTileN) * kTileN
                        : kTileN;

  // vnode / vlen per virtual row (node order)
  std::vector<int32_t> vnode(nvr);
  std::vector<int32_t> vlen(nvr);
  for (int64_t i = 0; i < num_rows; ++i) {
    const int64_t deg = ptr[i + 1] - ptr[i];
    for (int64_t k = vbase[i]; k < vbase[i + 1]; ++k) {
      vnode[k] = static_cast<int32_t>(i);
      const int64_t rem = deg - (k - vbase[i]) * cap;
      vlen[k] = static_cast<int32_t>(rem < cap ? rem : cap);
    }
  }

  // descending stable sort by length == counting sort over [0, cap]
  // (padding rows vlen 0 sort last, in index order — matches
  // np.argsort(-vlen_pad, kind='stable'))
  std::vector<int64_t> bucket(cap + 2, 0);
  for (int64_t r = 0; r < nvr; ++r) bucket[vlen[r]]++;
  bucket[0] += rows_pad - nvr;  // padding rows
  std::vector<int64_t> start(cap + 1, 0);
  {
    int64_t acc = 0;
    for (int64_t L = cap; L >= 0; --L) {
      start[L] = acc;
      acc += bucket[L];
    }
  }
  std::vector<int32_t> vorder(rows_pad);
  {
    std::vector<int64_t> pos(start);
    for (int64_t r = 0; r < rows_pad; ++r) {
      const int32_t L = r < nvr ? vlen[r] : 0;
      vorder[pos[L]++] = static_cast<int32_t>(r);
    }
  }
  std::vector<int32_t> vpos(rows_pad);
  for (int64_t p = 0; p < rows_pad; ++p) vpos[vorder[p]] = p;

  // perm + slice widths + col_off + per-column counts
  std::vector<int64_t> colw(t2);
  out_col_off[0] = 0;
  for (int64_t s = 0; s < t2; ++s) {
    const int32_t first = vorder[s * kTileN];
    colw[s] = first < nvr ? vlen[first] : 0;  // rows descend within slices
    out_col_off[s + 1] = out_col_off[s] + static_cast<int32_t>(colw[s]);
  }
  if (static_cast<int64_t>(out_col_off[t2]) > fixed_cols) return -1;
  const int64_t e_ell = fixed_cols * kTileN;
  for (int64_t i = 0; i < e_ell; ++i) {
    out_gather[i] = static_cast<int32_t>(opp_pad_rows);
  }
  for (int64_t i = 0; i < fixed_cols; ++i) out_cnt[i] = 0;
  std::vector<int64_t> hist(cap + 2);
  for (int64_t s = 0; s < t2; ++s) {
    const int64_t w = colw[s];
    if (!w) continue;
    std::fill(hist.begin(), hist.end(), 0);
    for (int64_t j = 0; j < kTileN; ++j) {
      const int32_t r = vorder[s * kTileN + j];
      hist[r < nvr ? vlen[r] : 0]++;
    }
    // cnt[c] = #rows in slice with vlen > c (suffix sums of the histogram)
    int64_t gt = 0;
    std::vector<int64_t> suff(cap + 2, 0);
    for (int64_t L = cap; L >= 0; --L) {
      suff[L] = gt;
      gt += hist[L];
    }
    const int64_t c0 = out_col_off[s];
    for (int64_t c = 0; c < w; ++c) {
      out_cnt[c0 + c] = static_cast<int32_t>(suff[c]);
    }
  }
  for (int64_t p = 0; p < rows_pad; ++p) {
    const int32_t r = vorder[p];
    out_perm[p] =
        r < nvr ? vnode[r] : static_cast<int32_t>(node_pad);
  }

  // edge slots: edge e of node i at rank r -> virtual row vbase[i] + r/cap,
  // column (within-row offset), final position via vpos
  for (int64_t i = 0; i < num_rows; ++i) {
    for (int64_t e = ptr[i]; e < ptr[i + 1]; ++e) {
      const int64_t r = e - ptr[i];
      const int64_t vr0 = vbase[i] + r / cap;
      const int64_t within = r % cap;
      const int64_t p = vpos[vr0];
      const int64_t sl =
          (static_cast<int64_t>(out_col_off[p / kTileN]) + within) * kTileN +
          p % kTileN;
      out_gather[sl] = opp[e];
      slot[e] = sl;
    }
  }
  (void)num_edges;

  // vsort: ascending stable sort of perm values (0..node_pad) — counting
  // sort again (matches np.argsort(perm, kind='stable')); sids = perm[vsort]
  std::vector<int64_t> vcnt(node_pad + 2, 0);
  for (int64_t p = 0; p < rows_pad; ++p) vcnt[out_perm[p] + 1]++;
  for (int64_t v = 0; v <= node_pad; ++v) vcnt[v + 1] += vcnt[v];
  for (int64_t p = 0; p < rows_pad; ++p) {
    const int64_t q = vcnt[out_perm[p]]++;
    out_vsort[q] = static_cast<int32_t>(p);
  }
  for (int64_t p = 0; p < rows_pad; ++p) {
    out_sids[p] = out_perm[out_vsort[p]];
  }
  return 0;
}

}  // namespace

extern "C" {

// Emits the fixed-geometry two-sided SELL-128 layout for one sampled batch
// (ops.sell_attention.prepare_minibatch_sell_tiles, byte-identical). Edge
// list: local ids, dst-SORTED (sample_batch output), only the first
// num_edges entries real. Geometry from sell_minibatch_geometry:
// (cols_d, cols_s, tiles_d, tiles_s) with split_cap-forced virtual rows.
// Outputs per side: perm/vsort/sids [tiles*128], gather [cols*128],
// cnt [cols], col_off [tiles+1]; plus ell_perm [cols_s*128] (src-ELL slot
// -> dst-ELL slot; padding = cols_d*128). Returns 0, or -1 when the fixed
// geometry does not fit / bad inputs.
long long emit_sell_tiles(
    const int32_t* src, const int32_t* dst, long long num_edges,
    long long max_nodes, long long split_cap,
    long long cols_d, long long cols_s, long long tiles_d, long long tiles_s,
    int32_t* out_perm_d, int32_t* out_vsort_d, int32_t* out_sids_d,
    int32_t* out_gather_d, int32_t* out_cnt_d, int32_t* out_col_off_d,
    int32_t* out_perm_s, int32_t* out_vsort_s, int32_t* out_sids_s,
    int32_t* out_gather_s, int32_t* out_cnt_s, int32_t* out_col_off_s,
    int32_t* out_ell_perm) {
  constexpr int64_t kTileN = 128;
  if (max_nodes <= 0 || split_cap <= 0 || num_edges < 0) return -1;
  const int64_t node_pad =
      max_nodes > kTileN ? ((max_nodes + kTileN - 1) / kTileN) * kTileN
                         : kTileN;

  // dst-side CSR view (edges arrive dst-sorted)
  std::vector<int64_t> dptr(max_nodes + 1, 0);
  for (int64_t e = 0; e < num_edges; ++e) {
    const int32_t d = dst[e];
    if (d < 0 || d >= max_nodes) return -1;
    if (e > 0 && dst[e - 1] > d) return -1;  // must be dst-sorted
    dptr[d + 1]++;
  }
  for (int64_t i = 0; i < max_nodes; ++i) dptr[i + 1] += dptr[i];

  // the two sides are independent — build them in parallel (each includes
  // its own counting sorts and output fills; src additionally CSC-sorts)
  std::vector<int64_t> slot_d(num_edges);
  std::vector<int64_t> slot_s(num_edges);
  std::vector<int64_t> order(num_edges);  // src-sorted -> dst-sorted index
  int rc_d = 0, rc_s = 0;
  auto work_d = [&]() {
    rc_d = build_sell_side(dptr.data(), src, max_nodes, num_edges, node_pad,
                           split_cap, cols_d, tiles_d, out_perm_d,
                           out_vsort_d, out_sids_d, out_gather_d, out_cnt_d,
                           out_col_off_d, slot_d.data());
  };
  auto work_s = [&]() {
    // src-side CSC view: stable counting sort by src
    std::vector<int64_t> sptr(max_nodes + 2, 0);
    for (int64_t e = 0; e < num_edges; ++e) {
      const int32_t s = src[e];
      if (s < 0 || s >= max_nodes) {
        rc_s = -1;
        return;
      }
      sptr[s + 1]++;
    }
    for (int64_t i = 0; i <= max_nodes; ++i) sptr[i + 1] += sptr[i];
    std::vector<int32_t> opp_s(num_edges);
    {
      std::vector<int64_t> pos(sptr.begin(), sptr.begin() + max_nodes + 1);
      for (int64_t e = 0; e < num_edges; ++e) {
        const int64_t p = pos[src[e]]++;
        opp_s[p] = dst[e];
        order[p] = e;
      }
    }
    rc_s = build_sell_side(sptr.data(), opp_s.data(), max_nodes, num_edges,
                           node_pad, split_cap, cols_s, tiles_s, out_perm_s,
                           out_vsort_s, out_sids_s, out_gather_s, out_cnt_s,
                           out_col_off_s, slot_s.data());
  };
  if (gatv2_usable_cpus() >= 2 && num_edges >= 65536) {
    std::thread td(work_d);
    work_s();
    td.join();
  } else {
    work_d();
    work_s();
  }
  if (rc_d != 0 || rc_s != 0) return -1;

  const int64_t e_ell = cols_d * kTileN;
  const int64_t e2_ell = cols_s * kTileN;
  for (int64_t i = 0; i < e2_ell; ++i) {
    out_ell_perm[i] = static_cast<int32_t>(e_ell);
  }
  for (int64_t p = 0; p < num_edges; ++p) {
    out_ell_perm[slot_s[p]] = static_cast<int32_t>(slot_d[order[p]]);
  }
  return 0;
}

}  // extern "C"

extern "C" {

// Parallel row gather: out[i] = src[idx[i]] for i < k; rows i >= k zeroed
// up to out_rows. The feature-matrix copy is the host-side cost of every
// sampled minibatch (tens of MB); numpy's fancy indexing is single-threaded.
void gather_rows_f32(
    const float* src, long long src_rows, long long row_len,
    const int32_t* idx, long long k,
    float* out, long long out_rows, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  // never oversubscribe a cgroup/affinity-limited box
  unsigned cap = gatv2_usable_cpus();
  if (static_cast<unsigned>(num_threads) > cap)
    num_threads = static_cast<int>(cap);
  const long long total = out_rows;
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  const size_t row_bytes = static_cast<size_t>(row_len) * sizeof(float);
  for (int t = 0; t < num_threads; ++t) {
    const long long lo = total * t / num_threads;
    const long long hi = total * (t + 1) / num_threads;
    threads.emplace_back([=]() {
      for (long long i = lo; i < hi; ++i) {
        float* dst = out + i * row_len;
        if (i < k) {
          const int64_t r = idx[i];
          if (r >= 0 && r < src_rows) {
            std::memcpy(dst, src + r * row_len, row_bytes);
            continue;
          }
        }
        std::memset(dst, 0, row_bytes);
      }
    });
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
