"""Metrics sink, checkpoint mechanics, io validation errors."""

import json

import numpy as np
import pytest

from gatv2_tpu.utils.metrics import JsonlSink, device_memory_report


def test_jsonl_sink(tmp_path):
    path = tmp_path / "m.jsonl"
    sink = JsonlSink(str(path))
    sink.write({"epoch": 1, "loss": 0.5})
    sink.write({"epoch": 2, "loss": 0.25})
    sink.close()
    rows = [json.loads(l) for l in path.read_text().splitlines()]
    assert [r["epoch"] for r in rows] == [1, 2]
    assert all("ts" in r for r in rows)


def test_device_memory_report_shape():
    rep = device_memory_report()
    assert isinstance(rep, dict)
    for k, v in rep.items():
        assert isinstance(v, int)


def test_checkpoint_latest_and_roundtrip(tmp_path):
    import jax.numpy as jnp

    from gatv2_tpu.train import checkpoint as ckpt

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
    opt = {"m": {"w": jnp.zeros((2, 3)), "b": jnp.zeros(3)}}
    ckpt.save(tmp_path, params, opt, epoch=3)
    ckpt.save(tmp_path, params, opt, epoch=7)
    assert ckpt.latest_path(tmp_path).name.endswith("00000007.npz")
    p2, o2, ep = ckpt.restore(ckpt.latest_path(tmp_path), params, opt)
    assert ep == 7
    np.testing.assert_array_equal(np.asarray(p2["w"]), np.arange(6.0).reshape(2, 3))


def test_io_validation_errors(tmp_path):
    from gatv2_tpu.data.graph import Graph

    feats = np.zeros((4, 2), np.float32)
    with pytest.raises(ValueError, match="row_ptr length"):
        Graph(features=feats, row_ptr=np.zeros(3, np.int32),
              col_idx=np.zeros(0, np.int32), labels=np.zeros(4, np.int32))
    with pytest.raises(ValueError, match="labels length"):
        Graph(features=feats, row_ptr=np.zeros(5, np.int32),
              col_idx=np.zeros(0, np.int32), labels=np.zeros(3, np.int32))
    rp = np.array([0, 1, 1, 1, 2], np.int32)
    with pytest.raises(ValueError, match="num_edges"):
        Graph(features=feats, row_ptr=rp, col_idx=np.zeros(5, np.int32),
              labels=np.zeros(4, np.int32))


def test_native_parser_rejects_malformed(tmp_path):
    from gatv2_tpu.utils import native_loader

    if not native_loader.available() and not native_loader.build():
        pytest.skip("native library unavailable")
    bad = tmp_path / "bad.txt"
    bad.write_text("1.0 2.0 abc 4.0\n")
    with pytest.raises(IOError):
        native_loader.parse_float_file(bad)
    ok = tmp_path / "ok.txt"
    ok.write_text("1.5 -2 3e2\n")
    np.testing.assert_allclose(
        native_loader.parse_float_file(ok), [1.5, -2.0, 300.0]
    )


def test_bench_flops_accounting():
    """bench.py's FLOPs model: dense projections dominate high-F configs;
    structural (one-hot) FLOPs only exist on the pallas path."""
    import bench

    fl_pl = bench.flops_per_epoch("citeseer3", "pallas")
    fl_xla = bench.flops_per_epoch("citeseer3", "xla")
    assert fl_pl["model_gflop"] == fl_xla["model_gflop"]
    assert fl_xla["structural_gflop"] == 0
    assert fl_pl["structural_gflop"] > 0
    # citeseer3: F=3703 dense projections dominate the per-edge work
    assert fl_pl["dense_gflop"] > 10 * fl_pl["edge_gflop"]
    # rough magnitude: ~40 GFLOP/epoch (VERDICT round-1 estimate)
    assert 20 < fl_pl["model_gflop"] < 80
    assert bench._peak_tflops("TPU v5 lite0") == 197.0
    assert bench._peak_tflops("unknown device") is None
