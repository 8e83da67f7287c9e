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
