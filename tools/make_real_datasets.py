#!/usr/bin/env python
"""Generate genuine (non-synthetic) datasets in the reference's 4-file text
format, from data shipped inside offline Python packages.

The reference's dataset catalog (Cora/Citeseer/Pubmed/Arxiv/Products,
/root/reference/README.md:22-35) requires network downloads that this
environment cannot perform. These two datasets are REAL data available
offline, written in the exact `features.txt/row_ptr.txt/col_idx.txt/
labels.txt` layout the reference documents (README.md:22-27), plus the
framework's optional split-mask files:

  karate — Zachary's karate club (networkx.karate_club_graph): the classic
      real social network. 34 nodes, 156 directed edges, 2 classes (the
      club each member joined after the split). Features are one-hot node
      identity (the standard treatment for featureless graphs).

  digits — sklearn.datasets.load_digits: 1,797 real 8x8 handwritten-digit
      images (64 features, scaled to [0,1]), 10 classes. The graph is a
      symmetrized 8-nearest-neighbor graph in feature space with self-loops
      — the standard way to pose an offline tabular dataset as a
      node-classification benchmark.

Both get deterministic train/val/test masks (data.splits conventions).

Usage: python tools/make_real_datasets.py [--out DIR]   (default ./data)
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from gatv2_tpu.data.graph import Graph
from gatv2_tpu.data.io import save_dataset
from gatv2_tpu.data.splits import random_splits, save_split_files


def _csr_from_edges(src: np.ndarray, dst: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Dedup'd dst-CSR via the shared converter (data.graph.edges_to_csr)."""
    from gatv2_tpu.data.graph import edges_to_csr

    row_ptr, col_idx = edges_to_csr(src, dst, n, dedup=True)
    return row_ptr.astype(np.int32), col_idx.astype(np.int32)


def make_karate() -> Graph:
    import networkx as nx

    g = nx.karate_club_graph()
    n = g.number_of_nodes()
    labels = np.array(
        [0 if g.nodes[i]["club"] == "Mr. Hi" else 1 for i in range(n)], np.int32
    )
    und = np.array(g.edges(), np.int64)
    src = np.concatenate([und[:, 0], und[:, 1]])
    dst = np.concatenate([und[:, 1], und[:, 0]])
    row_ptr, col_idx = _csr_from_edges(src, dst, n)
    features = np.eye(n, dtype=np.float32)
    return Graph(features=features, row_ptr=row_ptr, col_idx=col_idx, labels=labels)


def make_digits(k: int = 8) -> Graph:
    from sklearn.datasets import load_digits
    from sklearn.neighbors import kneighbors_graph

    ds = load_digits()
    x = (ds.data / 16.0).astype(np.float32)  # pixel counts 0..16 -> [0,1]
    labels = ds.target.astype(np.int32)
    n = x.shape[0]
    knn = kneighbors_graph(x, k, mode="connectivity", include_self=False)
    knn = knn.tocoo()
    # symmetrize (i->j implies j->i) and add self-loops
    src = np.concatenate([knn.row, knn.col, np.arange(n)])
    dst = np.concatenate([knn.col, knn.row, np.arange(n)])
    row_ptr, col_idx = _csr_from_edges(src.astype(np.int64), dst.astype(np.int64), n)
    return Graph(features=x, row_ptr=row_ptr, col_idx=col_idx, labels=labels)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data")
    args = ap.parse_args(argv)
    out = pathlib.Path(args.out)

    for name, builder, fractions in (
        ("karate", make_karate, (0.4, 0.2, 0.4)),
        ("digits", make_digits, (0.6, 0.2, 0.2)),
    ):
        g = builder()
        d = out / name
        save_dataset(g, d)
        splits = random_splits(g.num_nodes, fractions, seed=0)
        save_split_files(splits, d)
        print(
            f"{name}: N={g.num_nodes} E={g.num_edges} F={g.feature_dim} "
            f"C={g.num_classes} splits={splits.counts} -> {d}/"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
