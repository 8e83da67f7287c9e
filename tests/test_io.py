"""Dataset IO: text CSR round-trip, resolution rules, native loader parity."""

import os

import numpy as np
import pytest

from gatv2_tpu.data.io import load_dataset, resolve_dataset_dir, save_dataset
from gatv2_tpu.data.synthetic import random_graph
from gatv2_tpu.utils import native_loader


def test_roundtrip(tmp_path, tiny_graph):
    save_dataset(tiny_graph, tmp_path / "toy")
    g = load_dataset("toy", str(tmp_path))
    np.testing.assert_allclose(g.features, tiny_graph.features, rtol=1e-6)
    np.testing.assert_array_equal(g.row_ptr, tiny_graph.row_ptr)
    np.testing.assert_array_equal(g.col_idx, tiny_graph.col_idx)
    np.testing.assert_array_equal(g.labels, tiny_graph.labels)
    assert g.num_classes == tiny_graph.num_classes
    assert g.max_degree == tiny_graph.max_degree


def test_data_root_env_fallback(tmp_path, tiny_graph, monkeypatch):
    """Reference resolution: --data-root flag, else env DATA_ROOT, else ./data
    (GATv2_edge_based.cu:1050-1073)."""
    save_dataset(tiny_graph, tmp_path / "envds")
    monkeypatch.setenv("DATA_ROOT", str(tmp_path))
    assert resolve_dataset_dir("envds").is_dir()
    g = load_dataset("envds")
    assert g.num_nodes == tiny_graph.num_nodes


def test_missing_dataset_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_dataset("nope", str(tmp_path))


def test_missing_file_errors(tmp_path, tiny_graph):
    save_dataset(tiny_graph, tmp_path / "broken")
    os.remove(tmp_path / "broken" / "labels.txt")
    with pytest.raises(FileNotFoundError, match="labels.txt"):
        load_dataset("broken", str(tmp_path))


def test_ragged_features_error(tmp_path):
    d = tmp_path / "ragged"
    d.mkdir()
    (d / "features.txt").write_text("1 2 3\n4 5\n")
    (d / "row_ptr.txt").write_text("0 0\n")
    (d / "col_idx.txt").write_text("")
    (d / "labels.txt").write_text("0\n")
    with pytest.raises(ValueError, match="ragged|multiple"):
        load_dataset("ragged", str(tmp_path))


def test_graph_shape_validation(tiny_graph):
    from gatv2_tpu.data.graph import Graph

    with pytest.raises(ValueError, match="row_ptr"):
        Graph(
            features=tiny_graph.features,
            row_ptr=tiny_graph.row_ptr[:-1],
            col_idx=tiny_graph.col_idx,
            labels=tiny_graph.labels,
        )


def test_coo_expansion(tiny_graph):
    """dst = row repeated by degree (csr_to_coo_kernel, E:67-84)."""
    g = tiny_graph
    dst = g.dst
    assert dst.shape == g.col_idx.shape
    assert (np.diff(dst) >= 0).all()  # sorted
    for j in (0, g.num_nodes // 2, g.num_nodes - 1):
        assert (dst[g.row_ptr[j] : g.row_ptr[j + 1]] == j).all()


def test_padded_edges(tiny_graph):
    pe = tiny_graph.padded_edges(128)
    assert pe.src.shape[0] % 128 == 0
    assert (pe.dst[pe.num_real :] == tiny_graph.num_nodes).all()
    np.testing.assert_array_equal(pe.src[: pe.num_real], tiny_graph.src)


@pytest.mark.skipif(
    not (native_loader.available() or native_loader.build()),
    reason="native loader toolchain unavailable",
)
def test_native_loader_matches_numpy(tmp_path, tiny_graph):
    save_dataset(tiny_graph, tmp_path / "nat")
    f = native_loader.parse_float_file(tmp_path / "nat" / "features.txt")
    assert f is not None
    np.testing.assert_allclose(
        f.reshape(tiny_graph.features.shape), tiny_graph.features, rtol=1e-6
    )
    ints = native_loader.parse_int_file(tmp_path / "nat" / "row_ptr.txt")
    np.testing.assert_array_equal(ints, tiny_graph.row_ptr)


def test_graph_rejects_out_of_range_col_idx():
    """Malformed (e.g. 1-indexed) datasets fail at LOAD time instead of
    silently clamping inside jit (round-2 review finding)."""
    import pytest

    from gatv2_tpu.data.graph import Graph

    feats = np.zeros((3, 2), np.float32)
    with pytest.raises(ValueError, match="outside"):
        Graph(features=feats, row_ptr=np.array([0, 1, 2, 3]),
              col_idx=np.array([1, 2, 3]), labels=np.zeros(3, np.int32))
    with pytest.raises(ValueError, match="non-decreasing"):
        Graph(features=feats, row_ptr=np.array([0, 2, 1, 3]),
              col_idx=np.array([0, 1, 2]), labels=np.zeros(3, np.int32))
