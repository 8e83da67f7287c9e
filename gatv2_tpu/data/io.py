"""Dataset IO: the reference's four-file whitespace text CSR format.

Format (reference README.md:22-27):
  features.txt — one line per node, F floats separated by spaces
  row_ptr.txt  — N+1 ints (CSR row pointer over destination nodes)
  col_idx.txt  — E ints (source/neighbor indices)
  labels.txt   — N ints (one class label per node)

Dataset directory resolution mirrors the reference (GATv2_edge_based.cu:
1050-1073): `--data-root` flag, else env `DATA_ROOT`, else `./data`;
the dataset lives in `<root>/<name>/`.

Parsing is done by the native C++ loader when available (fast path for
multi-hundred-MB feature files, see native/loader.cpp), falling back to
numpy. Both produce identical arrays; see tests/test_io.py.
"""

from __future__ import annotations

import os
import pathlib

import numpy as np

from gatv2_tpu.data.graph import Graph
from gatv2_tpu.utils import native_loader


def resolve_dataset_dir(
    dataset: str, data_root: str | None = None
) -> pathlib.Path:
    """Resolve `<root>/<dataset>/` with the reference's precedence rules."""
    if data_root is None:
        data_root = os.environ.get("DATA_ROOT", "./data")
    return pathlib.Path(data_root) / dataset


def _parse_floats(path: pathlib.Path) -> np.ndarray:
    arr = native_loader.parse_float_file(path)
    if arr is not None:
        return arr
    return np.fromfile(path, dtype=np.float32, sep=" ")


def load_features(path: pathlib.Path) -> np.ndarray:
    """Dense [N, F] float32; N and F inferred from the file; ragged rows
    are an error (reference load_features, GATv2_edge_based.cu:24-51)."""
    with open(path) as f:
        first = f.readline()
    ncols = len(first.split())
    if ncols == 0:
        raise ValueError(f"{path}: empty first row")
    flat = _parse_floats(path)
    if flat.size % ncols != 0:
        raise ValueError(
            f"{path}: total value count {flat.size} is not a multiple of the "
            f"first row's width {ncols} (ragged rows?)"
        )
    return flat.reshape(-1, ncols)


def load_int_array(path: pathlib.Path) -> np.ndarray:
    """Whitespace-separated ints (reference load_int_array, E:53-64)."""
    arr = native_loader.parse_int_file(path)
    if arr is not None:
        return arr
    return np.fromfile(path, dtype=np.int64, sep=" ").astype(np.int32)


def load_dataset(dataset: str, data_root: str | None = None) -> Graph:
    d = resolve_dataset_dir(dataset, data_root)
    if not d.is_dir():
        raise FileNotFoundError(
            f"Dataset directory not found: {d} (dataset={dataset!r}). "
            f"Expected features.txt/row_ptr.txt/col_idx.txt/labels.txt inside."
        )
    for fname in ("features.txt", "row_ptr.txt", "col_idx.txt", "labels.txt"):
        if not (d / fname).is_file():
            raise FileNotFoundError(f"Missing {fname} in {d}")
    features = load_features(d / "features.txt")
    row_ptr = load_int_array(d / "row_ptr.txt")
    col_idx = load_int_array(d / "col_idx.txt")
    labels = load_int_array(d / "labels.txt")
    return Graph(features=features, row_ptr=row_ptr, col_idx=col_idx, labels=labels)


def save_dataset(graph: Graph, directory: str | os.PathLike) -> None:
    """Write a Graph back out in the reference's text format (for tests)."""
    d = pathlib.Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    with open(d / "features.txt", "w") as f:
        for row in graph.features:
            f.write(" ".join(repr(float(v)) for v in row) + "\n")
    np.savetxt(d / "row_ptr.txt", graph.row_ptr[None], fmt="%d")
    np.savetxt(d / "col_idx.txt", graph.col_idx[None], fmt="%d")
    np.savetxt(d / "labels.txt", graph.labels[:, None], fmt="%d")
