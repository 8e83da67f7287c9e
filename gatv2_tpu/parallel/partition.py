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

    features  [S * nodes_per_shard, F]
    labels    [S * nodes_per_shard]       (-1 on padding nodes)
    src       [S * edges_per_shard]       global source node ids
    dst_local [S * edges_per_shard]       dst id RELATIVE to its shard block
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

    @property
    def padded_num_nodes(self) -> int:
        return self.num_shards * self.nodes_per_shard


def partition_graph(
    graph: Graph, num_shards: int, *, edge_multiple: int = 128,
    node_multiple: int = 8,
) -> PartitionedGraph:
    n, f = graph.num_nodes, graph.feature_dim
    nodes_per_shard = -(-n // num_shards)
    nodes_per_shard = -(-nodes_per_shard // node_multiple) * node_multiple
    n_pad = num_shards * nodes_per_shard

    features = np.zeros((n_pad, f), np.float32)
    features[:n] = graph.features
    labels = np.full(n_pad, -1, np.int32)
    labels[:n] = graph.labels

    src, dst = graph.src, graph.dst  # dst sorted ascending
    # shard s owns dst in [s*nps, (s+1)*nps); edges stay contiguous because
    # dst is sorted — find the boundaries with searchsorted
    bounds = np.searchsorted(
        dst, np.arange(num_shards + 1) * nodes_per_shard, side="left"
    )
    counts = np.diff(bounds)
    edges_per_shard = int(counts.max()) if counts.size else 0
    edges_per_shard = max(
        edge_multiple, -(-edges_per_shard // edge_multiple) * edge_multiple
    )

    src_p = np.zeros((num_shards, edges_per_shard), np.int32)
    dst_l = np.full((num_shards, edges_per_shard), nodes_per_shard, np.int32)
    for s in range(num_shards):
        lo, hi = bounds[s], bounds[s + 1]
        c = hi - lo
        src_p[s, :c] = src[lo:hi]
        dst_l[s, :c] = dst[lo:hi] - s * nodes_per_shard

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
    )
