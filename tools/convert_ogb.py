#!/usr/bin/env python
"""Convert an OGB node-property-prediction dataset (ogbn-arxiv,
ogbn-products, ...) to this framework's 4-file text format
(features.txt / row_ptr.txt / col_idx.txt / labels.txt — the reference's
dataset format, reference README.md:22-27), plus split mask files
(train_mask.txt / val_mask.txt / test_mask.txt, see gatv2_tpu.data.splits).

Two input modes (no network access needed at convert time):
  1. --ogb-root pointing at an existing OGB download (uses the `ogb`
     package if installed);
  2. --raw-dir pointing at an OGB raw/ directory (edge.csv.gz,
     node-feat.csv.gz, node-label.csv.gz + split/<name>/{train,valid,test}.csv.gz)
     — parsed with numpy only.

Edges are interpreted as directed src->dst and stored CSR-by-destination
(in-neighbor lists), matching the reference's convention. Use
--make-undirected to add reverse edges (standard for arxiv/products).
"""

from __future__ import annotations

import argparse
import gzip
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from gatv2_tpu.data.graph import Graph  # noqa: E402
from gatv2_tpu.data.io import save_dataset  # noqa: E402
from gatv2_tpu.data.splits import Splits, save_split_files  # noqa: E402


def _read_csv_gz(path: pathlib.Path, dtype) -> np.ndarray:
    with gzip.open(path, "rt") as f:
        return np.loadtxt(f, delimiter=",", dtype=dtype, ndmin=2)


def load_from_raw(raw_dir: pathlib.Path, split_name: str = "sales_ranking"):
    edges = _read_csv_gz(raw_dir / "edge.csv.gz", np.int64)  # [E, 2] src,dst
    feats = _read_csv_gz(raw_dir / "node-feat.csv.gz", np.float32)
    labels = _read_csv_gz(raw_dir / "node-label.csv.gz", np.int64).reshape(-1)
    split_dir = raw_dir / "split"
    splits = None
    if split_dir.exists():
        candidates = (
            [split_dir / split_name] if (split_dir / split_name).exists()
            else sorted(p for p in split_dir.iterdir() if p.is_dir())
        )
        if candidates:
            sd = candidates[0]
            n = feats.shape[0]
            masks = {}
            for part, fname in (
                ("train", "train.csv.gz"),
                ("val", "valid.csv.gz"),
                ("test", "test.csv.gz"),
            ):
                idx = _read_csv_gz(sd / fname, np.int64).reshape(-1)
                m = np.zeros(n, bool)
                m[idx] = True
                masks[part] = m
            splits = Splits(**masks)
    return edges, feats, labels, splits


def load_from_ogb(name: str, ogb_root: pathlib.Path):
    from ogb.nodeproppred import NodePropPredDataset

    ds = NodePropPredDataset(name=name, root=str(ogb_root))
    graph, labels = ds[0]
    edges = graph["edge_index"].T.astype(np.int64)  # [E, 2]
    feats = graph["node_feat"].astype(np.float32)
    labels = labels.reshape(-1).astype(np.int64)
    idx = ds.get_idx_split()
    n = feats.shape[0]

    def mask(key):
        m = np.zeros(n, bool)
        m[idx[key]] = True
        return m

    splits = Splits(train=mask("train"), val=mask("valid"), test=mask("test"))
    return edges, feats, labels, splits


def to_csr_by_dst(edges: np.ndarray, n: int, make_undirected: bool):
    from gatv2_tpu.data.graph import edges_to_csr

    return edges_to_csr(
        edges[:, 0], edges[:, 1], n, make_undirected=make_undirected
    )


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--name", default="ogbn-arxiv",
                    help="OGB dataset name (for --ogb-root mode)")
    ap.add_argument("--ogb-root", type=pathlib.Path, default=None,
                    help="root of an existing OGB download")
    ap.add_argument("--raw-dir", type=pathlib.Path, default=None,
                    help="an OGB raw/ directory (csv.gz files)")
    ap.add_argument("--out", type=pathlib.Path, required=True,
                    help="output dataset directory")
    ap.add_argument("--make-undirected", action="store_true")
    args = ap.parse_args()

    if args.raw_dir:
        edges, feats, labels, splits = load_from_raw(args.raw_dir)
    elif args.ogb_root:
        edges, feats, labels, splits = load_from_ogb(args.name, args.ogb_root)
    else:
        ap.error("one of --raw-dir / --ogb-root is required")

    n = feats.shape[0]
    row_ptr, col_idx = to_csr_by_dst(edges, n, args.make_undirected)
    g = Graph(
        features=feats, row_ptr=row_ptr, col_idx=col_idx,
        labels=labels.astype(np.int32),
    )
    save_dataset(g, args.out)
    if splits is not None:
        save_split_files(splits, args.out)
    print(
        f"wrote {args.out}: {g.num_nodes} nodes, {g.num_edges} edges, "
        f"{g.feature_dim} features, {int(labels.max()) + 1} classes"
        + (", with split masks" if splits is not None else "")
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
