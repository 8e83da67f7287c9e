"""CLI parity tests: flags, defaults, validation, config echo format."""

import pytest

from gatv2_tpu import cli


def test_defaults_match_reference():
    mc, tc, _ = cli.parse_args([])
    assert mc.num_layers == 2
    assert tc.epochs == 200
    assert tc.optimizer == "sgd"
    assert tc.lr == pytest.approx(1e-4)
    assert tc.beta1 == 0.9 and tc.beta2 == 0.999
    assert tc.clip is False
    assert tc.dataset == "pubmed"


def test_full_flag_set_readme_example():
    mc, tc, _ = cli.parse_args(
        "--num-layers 3 --heads 4,1,1 --outdims 64,32,16 --epochs 200 "
        "--optimizer adam --beta1 0.9 --beta2 0.999 --lr 0.01 --clip "
        "--dataset citeseer --data-root /data/graphs".split()
    )
    assert mc.num_layers == 3
    assert mc.heads == (4, 1, 1)
    assert mc.out_dims == (64, 32, 16)
    assert tc.optimizer == "adam"
    assert tc.clip is True
    assert tc.dataset == "citeseer"


def test_order_insensitive_parsing():
    """Improvement over the reference's order-sensitivity (README.md:136-140)."""
    mc, _, _ = cli.parse_args("--heads 4,1 --outdims 8,8 --num-layers 2".split())
    assert mc.heads == (4, 1)


def test_wrong_heads_count_errors():
    with pytest.raises(SystemExit):
        cli.parse_args("--num-layers 3 --heads 4,1 --outdims 8,8,8".split())


def test_adam_beta_out_of_range_errors():
    """Mirrors GATv2_edge_based.cu:1011-1015."""
    with pytest.raises(SystemExit):
        cli.parse_args("--optimizer adam --beta1 1.5".split())


def test_sgd_with_betas_warns(capsys):
    """Mirrors GATv2_edge_based.cu:1017-1019."""
    cli.parse_args("--optimizer sgd --beta1 0.5".split())
    assert "ignored" in capsys.readouterr().err


def test_config_echo_format():
    mc, tc, _ = cli.parse_args(
        "--num-layers 3 --heads 4,1,1 --outdims 64,32,16 --optimizer adam "
        "--lr 0.01 --clip".split()
    )
    echo = cli.echo_config(mc, tc)
    assert "Number of layers: 3" in echo
    assert "Attention heads: [4, 1, 1]" in echo
    assert "Output dimensions: [64, 32, 16]" in echo
    assert "Gradient clipping: true" in echo
    assert "Optimizer: adam" in echo
    assert "Learning rate: 0.01" in echo


def test_predict_pipeline(tmp_path, learnable_graph):
    """train --save-weights -> predict --load-weights end-to-end."""
    import subprocess
    import sys

    import numpy as np

    from gatv2_tpu.data.io import save_dataset

    import os

    save_dataset(learnable_graph, tmp_path / "tiny")
    env = {**os.environ, "GATV2_PLATFORM": "cpu"}
    common = [
        "--num-layers", "2", "--heads", "2,1", "--outdims", "8,8",
        "--dataset", "tiny", "--data-root", str(tmp_path), "--seed", "0",
    ]
    r = subprocess.run(
        [sys.executable, "train.py", *common, "--epochs", "8",
         "--optimizer", "adam", "--lr", "0.02",
         "--save-weights", str(tmp_path / "w")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr[-800:]
    r = subprocess.run(
        [sys.executable, "predict.py", *common,
         "--load-weights", str(tmp_path / "w"), "--out", str(tmp_path / "p")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr[-800:]
    preds = np.loadtxt(tmp_path / "p" / "predictions.txt", dtype=np.int64)
    assert preds.shape[0] == learnable_graph.num_nodes
    assert (preds >= 0).all() and (preds < learnable_graph.num_classes).all()
    # trained for 8 epochs on a learnable graph: beat chance
    acc = (preds == learnable_graph.labels).mean()
    assert acc > 1.5 / learnable_graph.num_classes


def test_num_layers_validation():
    import pytest

    with pytest.raises(SystemExit, match="num-layers must be >= 1"):
        cli.parse_args(["--num-layers", "0"])


def test_fanout_validation():
    import pytest

    with pytest.raises(SystemExit, match="fanouts entries must be >= 1"):
        cli.parse_args(["--batch-size", "8", "--fanouts", "0,5"])


def test_data_root_resolution(monkeypatch):
    """train_config.data_root carries the documented precedence: flag, else
    DATA_ROOT env, else ./data — directly usable by any consumer."""
    monkeypatch.delenv("DATA_ROOT", raising=False)
    _, tc, _ = cli.parse_args([])
    assert tc.data_root == "./data"
    monkeypatch.setenv("DATA_ROOT", "/somewhere")
    _, tc, _ = cli.parse_args([])
    assert tc.data_root == "/somewhere"
    _, tc, _ = cli.parse_args(["--data-root", "/flag"])
    assert tc.data_root == "/flag"


def test_impl_auto_resolution():
    """--impl auto (the DEFAULT since round 4): pallas for minibatch, xla
    on the CPU backend (the tests run with JAX_PLATFORMS=cpu; on an
    accelerator full-graph auto resolves to sell — exercised by the
    real-chip verify recipe)."""
    _, tc, _ = cli.parse_args("--impl auto --batch-size 64".split())
    assert tc.impl == "pallas"
    _, tc, _ = cli.parse_args(["--impl", "auto"])
    assert tc.impl == "xla"
    # auto is the default: omitting --impl resolves identically
    _, tc, _ = cli.parse_args([])
    assert tc.impl == "xla"
    _, tc, _ = cli.parse_args(["--batch-size", "64"])
    assert tc.impl == "pallas"
