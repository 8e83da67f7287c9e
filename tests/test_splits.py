"""Train/val/test split masks + Trainer evaluation protocol."""

import numpy as np
import pytest

from gatv2_tpu.config import ModelConfig, TrainConfig
from gatv2_tpu.data.splits import (
    Splits,
    load_split_files,
    random_splits,
    save_split_files,
)
from gatv2_tpu.train.loop import Trainer


def test_random_splits_partition():
    s = random_splits(1000, (0.6, 0.2, 0.2), seed=1)
    tr, va, te = s.counts
    assert tr + va + te == 1000
    assert tr == 600 and va == 200
    assert not (s.train & s.val).any()
    # deterministic
    s2 = random_splits(1000, (0.6, 0.2, 0.2), seed=1)
    np.testing.assert_array_equal(s.train, s2.train)


def test_masked_labels():
    s = random_splits(50, (0.5, 0.3, 0.2), seed=0)
    labels = np.arange(50, dtype=np.int32) % 4
    ml = s.masked_labels(labels, "train")
    assert (ml[s.train] == labels[s.train]).all()
    assert (ml[~s.train] == -1).all()


def test_split_files_roundtrip(tmp_path):
    s = random_splits(128, (0.7, 0.15, 0.15), seed=2)
    save_split_files(s, tmp_path)
    s2 = load_split_files(tmp_path, 128)
    for a, b in ((s.train, s2.train), (s.val, s2.val), (s.test, s2.test)):
        np.testing.assert_array_equal(a, b)
    assert load_split_files(tmp_path / "missing", 128) is None


def test_overlapping_masks_rejected():
    m = np.zeros(10, bool)
    m[0] = True
    with pytest.raises(ValueError):
        Splits(train=m, val=m, test=np.zeros(10, bool))


def test_trainer_split_evaluation(learnable_graph):
    g = learnable_graph
    config = ModelConfig(
        num_layers=2, heads=(2, 1), out_dims=(8, 8),
        num_classes=g.num_classes, in_dim=g.feature_dim,
    )
    tc = TrainConfig(optimizer="adam", lr=0.02, seed=0, epochs=0)
    splits = random_splits(g.num_nodes, (0.6, 0.2, 0.2), seed=0)
    logs = []
    trainer = Trainer(
        g, config, tc, splits=splits, log_fn=logs.append
    )
    trainer.run(12)
    accs = trainer.evaluate()
    assert set(accs) == {"train", "val", "test"}
    # learnable graph: training on 60% of nodes should still beat chance
    # on the held-out test nodes (4 classes -> 0.25)
    assert accs["train"] > 0.5
    assert accs["test"] > 0.35
    assert any("Train/Val/Test Accuracy" in line for line in logs)


def test_partial_mask_files_error(tmp_path):
    """1-2 of the 3 mask files present is an error (silently ignoring a
    provided train mask would leak held-out nodes into training), while
    none present means 'no masks'."""
    import pytest

    from gatv2_tpu.data.splits import load_split_files

    assert load_split_files(tmp_path, 10) is None
    (tmp_path / "train_mask.txt").write_text(" ".join(["1"] * 10))
    with pytest.raises(FileNotFoundError, match="partial split masks"):
        load_split_files(tmp_path, 10)
