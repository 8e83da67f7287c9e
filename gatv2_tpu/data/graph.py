"""Graph container: CSR adjacency + node features + labels.

The reference stores the graph as CSR (row_ptr over destination nodes,
col_idx listing in-neighbors / sources) and expands to COO on device
(csr_to_coo_kernel, GATv2_edge_based.cu:67-84: src[e]=col_idx[e],
dst[e]=row owning e). We keep the same convention: `row_ptr[j]..row_ptr[j+1]`
delimits the edges whose *destination* is node j, so the COO `dst` array is
sorted ascending — which is exactly what deterministic segment reductions
want on TPU (no atomics needed, unlike the reference's atomicAdd scatter,
GATv2_edge_based.cu:415-423).

Self-loops are NOT added implicitly (parity with the reference: whatever is
in col_idx defines N(j); SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Graph:
    """Host-side graph. All arrays are numpy; convert at the jit boundary."""

    features: np.ndarray  # [N, F] float32
    row_ptr: np.ndarray  # [N+1] int32, CSR over destination nodes
    col_idx: np.ndarray  # [E] int32, source node of each edge
    labels: np.ndarray  # [N] int32

    def __post_init__(self):
        self.features = np.ascontiguousarray(self.features, dtype=np.float32)
        self.row_ptr = np.ascontiguousarray(self.row_ptr, dtype=np.int32)
        self.col_idx = np.ascontiguousarray(self.col_idx, dtype=np.int32)
        self.labels = np.ascontiguousarray(self.labels, dtype=np.int32)
        n = self.features.shape[0]
        if self.row_ptr.shape[0] != n + 1:
            raise ValueError(
                f"row_ptr length {self.row_ptr.shape[0]} != num_nodes+1 ({n + 1})"
            )
        if self.labels.shape[0] != n:
            raise ValueError(f"labels length {self.labels.shape[0]} != num_nodes {n}")
        if self.row_ptr[-1] != self.col_idx.shape[0]:
            raise ValueError(
                f"row_ptr[-1]={self.row_ptr[-1]} != num_edges={self.col_idx.shape[0]}"
            )
        # catch malformed exports at LOAD time: inside jit, out-of-range
        # gather indices clamp silently (wrong results, no error), and the
        # two sampler engines would diverge from the full-graph path
        if (np.diff(self.row_ptr) < 0).any():
            raise ValueError("row_ptr must be non-decreasing")
        if self.col_idx.size:
            lo, hi = int(self.col_idx.min()), int(self.col_idx.max())
            if lo < 0 or hi >= n:
                raise ValueError(
                    f"col_idx contains node id {lo if lo < 0 else hi} outside "
                    f"[0, {n}) — is the dataset 1-indexed?"
                )

    @property
    def num_nodes(self) -> int:
        return self.features.shape[0]

    @property
    def num_edges(self) -> int:
        return self.col_idx.shape[0]

    @property
    def feature_dim(self) -> int:
        return self.features.shape[1]

    @property
    def num_classes(self) -> int:
        """Inferred as max(label)+1 (reference: thrust max_element, E:1106-1107)."""
        return int(self.labels.max()) + 1 if self.labels.size else 0

    @property
    def src(self) -> np.ndarray:
        """COO source indices == col_idx (csr_to_coo_kernel, E:67-84)."""
        return self.col_idx

    _dst_cache: np.ndarray | None = dataclasses.field(
        default=None, repr=False, compare=False
    )

    @property
    def dst(self) -> np.ndarray:
        """COO destination indices: row index repeated by in-degree (sorted)."""
        if self._dst_cache is None:
            degrees = np.diff(self.row_ptr)
            self._dst_cache = np.repeat(
                np.arange(self.num_nodes, dtype=np.int32), degrees
            )
        return self._dst_cache

    @property
    def in_degrees(self) -> np.ndarray:
        return np.diff(self.row_ptr).astype(np.int32)

    @property
    def max_degree(self) -> int:
        """Max in-degree (compute_max_degree, E:89-99; printed at E:1103-1104)."""
        return int(self.in_degrees.max()) if self.num_nodes else 0

    def padded_edges(self, multiple: int = 128) -> "PaddedEdges":
        """Edge arrays padded to a multiple (TPU static shapes / lane tiling).

        Padding edges use dst = num_nodes (an out-of-range segment id that
        `segment_sum(num_segments=N)` drops) and src = 0.
        """
        e = self.num_edges
        e_pad = ((e + multiple - 1) // multiple) * multiple if e else multiple
        src = np.zeros(e_pad, np.int32)
        dst = np.full(e_pad, self.num_nodes, np.int32)
        src[:e] = self.src
        dst[:e] = self.dst
        return PaddedEdges(src=src, dst=dst, num_real=e)


@dataclasses.dataclass(frozen=True)
class PaddedEdges:
    src: np.ndarray
    dst: np.ndarray
    num_real: int


def edges_to_csr(
    src: np.ndarray, dst: np.ndarray, num_nodes: int, *,
    make_undirected: bool = False, dedup: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Directed edge list -> (row_ptr, col_idx) CSR over DESTINATIONS, the
    framework's canonical layout (dst-major stable sort). Shared by the
    dataset tools so every converter normalizes edges identically.

    make_undirected: add the reversed edges first.
    dedup: drop duplicate (src, dst) pairs (multi-edges kept by default —
    the reference treats repeated col_idx entries as distinct edges).
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    if make_undirected:
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    order = np.lexsort((src, dst)) if dedup else np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    if dedup and src.size:
        keep = np.ones(src.shape[0], bool)
        keep[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
        src, dst = src[keep], dst[keep]
    row_ptr = np.zeros(num_nodes + 1, np.int64)
    np.cumsum(np.bincount(dst, minlength=num_nodes), out=row_ptr[1:])
    return row_ptr, src
