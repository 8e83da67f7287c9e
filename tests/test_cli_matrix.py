"""Every CLI flag combination runs end-to-end — the reference's one binary
supports every flag together (README.md:85-140), so must this train.py.

Uses the committed real dataset `data/karate` (Zachary's karate club, with
split-mask files) as the fixture: a fresh checkout of this repo can run
every one of these commands verbatim.
"""

import pathlib

import pytest

import train as train_main

REPO = pathlib.Path(__file__).resolve().parent.parent
DATA = str(REPO / "data")

BASE = [
    "--dataset", "karate", "--data-root", DATA,
    "--num-layers", "2", "--heads", "2,2", "--outdims", "8,8",
    "--optimizer", "adam", "--lr", "0.01", "--seed", "0",
    "--epochs", "3",
]


def run(argv):
    assert train_main.main(argv) == 0


@pytest.mark.parametrize(
    "extra",
    [
        [],
        ["--impl", "pallas"],
        ["--impl", "sell"],
        ["--variant", "node"],
        ["--variant", "node", "--impl", "pallas"],
        ["--variant", "node", "--impl", "sell"],
        ["--precision", "high"],
        ["--precision", "high", "--impl", "sell"],
        ["--streams", "bf16", "--impl", "sell"],
        ["--remat", "--impl", "sell"],
        ["--clip"],
        ["--mesh", "2"],
        ["--mesh", "2", "--impl", "pallas"],
        ["--mesh", "2", "--impl", "sell"],
        ["--mesh", "2", "--overlap"],
        ["--mesh", "2", "--impl", "pallas", "--overlap"],
        ["--mesh", "2", "--impl", "sell", "--overlap"],
        ["--batch-size", "8", "--fanouts", "4,4", "--sampler-engine", "python"],
        ["--batch-size", "8", "--fanouts", "4,4", "--sampler-engine", "python",
         "--feature-residency", "host"],
        ["--batch-size", "8", "--fanouts", "4,4", "--impl", "pallas",
         "--sampler-engine", "python"],
        ["--mesh", "2", "--batch-size", "8", "--fanouts", "4,4",
         "--sampler-engine", "python"],
        ["--mesh", "2", "--batch-size", "8", "--fanouts", "4,4",
         "--impl", "pallas", "--sampler-engine", "python"],
    ],
    ids=[
        "xla", "pallas", "sell", "node-variant", "node-pallas", "node-sell",
        "precision-high", "precision-high-sell", "streams-bf16-sell",
        "remat-sell",
        "clip", "mesh", "mesh-pallas", "mesh-sell",
        "mesh-overlap", "mesh-pallas-overlap", "mesh-sell-overlap",
        "minibatch", "minibatch-host-feats", "minibatch-pallas",
        "dp-minibatch", "dp-minibatch-pallas",
    ],
)
def test_flag_matrix(extra, capsys):
    run(BASE + extra)
    out = capsys.readouterr().out
    assert "Avg Loss:" in out
    # karate ships mask files -> every path must report held-out accuracy
    assert "Final Test Accuracy:" in out


def test_sell_minibatch_trains(capsys):
    """impl=sell covers minibatch mode since round 5 (per-batch
    fixed-geometry layouts, one compiled step): the combination the CLI
    used to reject now trains end-to-end with exact test eval."""
    run(BASE + ["--impl", "sell", "--batch-size", "8", "--fanouts", "4,4",
                "--sampler-engine", "python"])
    out = capsys.readouterr().out
    assert "Final Test Accuracy" in out


def test_checkpoint_resume_with_mesh(tmp_path, capsys):
    ck = str(tmp_path / "ck")
    run(BASE + ["--mesh", "2", "--checkpoint-dir", ck])
    run(BASE[:-1] + ["6", "--mesh", "2", "--checkpoint-dir", ck, "--resume"])
    out = capsys.readouterr().out
    assert "Resumed from checkpoint at epoch 3" in out
    assert "Epoch 6" in out


def test_checkpoint_resume_minibatch(tmp_path, capsys):
    mb = ["--batch-size", "8", "--fanouts", "4,4", "--sampler-engine", "python"]
    ck = str(tmp_path / "ck")
    run(BASE + mb + ["--checkpoint-dir", ck])
    run(BASE[:-1] + ["5"] + mb + ["--checkpoint-dir", ck, "--resume"])
    out = capsys.readouterr().out
    assert "Resumed from checkpoint at epoch 3" in out


def test_save_then_load_weights(tmp_path, capsys):
    w = str(tmp_path / "w")
    run(BASE + ["--save-weights", w])
    run(BASE + ["--load-weights", w])
    out = capsys.readouterr().out
    assert f"Loaded weights from {w}/" in out


def test_load_weights_with_resume_rejected(tmp_path):
    with pytest.raises(SystemExit, match="--load-weights cannot be combined"):
        run(BASE + ["--load-weights", str(tmp_path), "--resume",
                    "--checkpoint-dir", str(tmp_path)])


def test_resume_with_changed_model_errors(tmp_path):
    from gatv2_tpu.train.checkpoint import CheckpointMismatch

    ck = str(tmp_path / "ck")
    run(BASE + ["--checkpoint-dir", ck])
    wrong = [v if v != "8,8" else "16,16" for v in BASE]
    # the config fingerprint catches it before any shape comparison
    with pytest.raises(CheckpointMismatch, match="out_dims"):
        run(wrong + ["--checkpoint-dir", ck, "--resume"])
    # a changed execution knob (precision tier) must NOT block the resume
    run(BASE[:-1] + ["5", "--precision", "high", "--checkpoint-dir", ck,
                     "--resume"])


def test_predict_from_checkpoint(tmp_path, capsys):
    """predict.py --checkpoint-dir end-to-end (restores weights with an
    empty optimizer template — round-2 review regression)."""
    import predict as predict_main

    ck = str(tmp_path / "ck")
    run(BASE + ["--checkpoint-dir", ck])
    out_dir = str(tmp_path / "preds")
    assert predict_main.main(
        ["--dataset", "karate", "--data-root", DATA,
         "--num-layers", "2", "--heads", "2,2", "--outdims", "8,8",
         "--checkpoint-dir", ck, "--out", out_dir]
    ) == 0
    outp = capsys.readouterr().out
    assert "Loaded checkpoint at epoch 3" in outp
    import numpy as np
    preds = np.loadtxt(f"{out_dir}/predictions.txt", dtype=np.int64)
    assert preds.shape[0] == 34  # karate nodes


def test_predict_from_checkpoint_sell(tmp_path, capsys):
    """predict.py on the SELL path (train with sell, predict with sell)."""
    import numpy as np

    import predict as predict_main

    ck = str(tmp_path / "ck")
    run(BASE + ["--impl", "sell", "--checkpoint-dir", ck])
    out_dir = str(tmp_path / "preds")
    assert predict_main.main(
        ["--dataset", "karate", "--data-root", DATA,
         "--num-layers", "2", "--heads", "2,2", "--outdims", "8,8",
         "--impl", "sell", "--checkpoint-dir", ck, "--out", out_dir]
    ) == 0
    preds = np.loadtxt(f"{out_dir}/predictions.txt", dtype=np.int64)
    assert preds.shape[0] == 34


def test_predict_rejects_mismatched_variant(tmp_path, capsys):
    """predict.py refuses a checkpoint trained with a different model
    configuration even when parameter shapes coincide (edge vs node
    variant; round-2 review finding)."""
    import predict as predict_main

    ck = str(tmp_path / "ck")
    run(BASE + ["--checkpoint-dir", ck])  # variant=edge (default)
    with pytest.raises(SystemExit, match="variant"):
        predict_main.main(
            ["--dataset", "karate", "--data-root", DATA,
             "--num-layers", "2", "--heads", "2,2", "--outdims", "8,8",
             "--variant", "node", "--checkpoint-dir", ck,
             "--out", str(tmp_path / "p")]
        )


@pytest.mark.fast
def test_exact_eval_host_residency_falls_back(capsys):
    """--eval-mode exact + --feature-residency host: exact eval would
    upload the full feature table (host residency exists because it does
    not fit); train.py must fall back to sampled eval with a note."""
    run(BASE + [
        "--batch-size", "8", "--fanouts", "4,4", "--sampler-engine",
        "python", "--feature-residency", "host", "--eval-mode", "exact",
    ])
    out = capsys.readouterr().out
    assert "falling back" in out
    assert "Final Test Accuracy" in out
