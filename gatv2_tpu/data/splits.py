"""Train/val/test node splits.

The reference trains AND reports accuracy on all N nodes — its README
admits proper test evaluation is future work (reference README.md:134).
This module adds the standard semi-supervised node-classification
protocol on top of the same dataset format:

  - optional mask files `train_mask.txt` / `val_mask.txt` / `test_mask.txt`
    next to the other dataset files (whitespace 0/1 ints, one per node —
    the same text-number convention as the rest of the format);
  - or deterministic random splits by fractions.

Training masks the loss to train nodes (labels of other nodes are set to
-1, which models.gatv2.loss_and_accuracy already ignores); evaluation runs
the same full-graph forward once and reads accuracies per split.
"""

from __future__ import annotations

import dataclasses
import pathlib

import numpy as np

MASK_FILES = ("train_mask.txt", "val_mask.txt", "test_mask.txt")


@dataclasses.dataclass(frozen=True)
class Splits:
    train: np.ndarray  # [N] bool
    val: np.ndarray  # [N] bool
    test: np.ndarray  # [N] bool

    def __post_init__(self):
        for name in ("train", "val", "test"):
            object.__setattr__(
                self, name, np.asarray(getattr(self, name), bool)
            )
        if not (self.train.shape == self.val.shape == self.test.shape):
            raise ValueError("split masks must have equal length")
        overlap = (self.train & self.val) | (self.train & self.test) | (
            self.val & self.test
        )
        if overlap.any():
            raise ValueError("split masks overlap")

    @property
    def counts(self) -> tuple[int, int, int]:
        return int(self.train.sum()), int(self.val.sum()), int(self.test.sum())

    def masked_labels(self, labels: np.ndarray, which: str = "train") -> np.ndarray:
        """Labels with every node outside the split set to -1 (ignored by
        the loss)."""
        mask = getattr(self, which)
        out = np.where(mask, labels, -1).astype(np.int32)
        return out


def random_splits(
    num_nodes: int,
    fractions: tuple[float, float, float] = (0.6, 0.2, 0.2),
    seed: int = 0,
) -> Splits:
    """Deterministic random split by fractions (train, val, test)."""
    if not np.isclose(sum(fractions), 1.0):
        raise ValueError(f"split fractions must sum to 1, got {fractions}")
    rng = np.random.default_rng(seed)
    order = rng.permutation(num_nodes)
    n_train = int(round(fractions[0] * num_nodes))
    n_val = int(round(fractions[1] * num_nodes))
    train = np.zeros(num_nodes, bool)
    val = np.zeros(num_nodes, bool)
    test = np.zeros(num_nodes, bool)
    train[order[:n_train]] = True
    val[order[n_train : n_train + n_val]] = True
    test[order[n_train + n_val :]] = True
    return Splits(train=train, val=val, test=test)


def load_split_files(directory: str | pathlib.Path, num_nodes: int) -> Splits | None:
    """Load mask files from a dataset directory; None if absent.

    PARTIAL mask sets are an error (silently ignoring a provided
    train_mask because test_mask is missing would leak held-out nodes
    into training)."""
    d = pathlib.Path(directory)
    paths = [d / f for f in MASK_FILES]
    present = [p.exists() for p in paths]
    if not any(present):
        return None
    if not all(present):
        missing = [f for f, ok in zip(MASK_FILES, present) if not ok]
        raise FileNotFoundError(
            f"{d}: partial split masks — missing {', '.join(missing)} "
            f"(provide all three of {', '.join(MASK_FILES)}, or none)"
        )
    masks = []
    for p in paths:
        m = np.loadtxt(p, dtype=np.int64).reshape(-1)
        if m.shape[0] != num_nodes:
            raise ValueError(f"{p}: {m.shape[0]} entries != {num_nodes} nodes")
        masks.append(m != 0)
    return Splits(train=masks[0], val=masks[1], test=masks[2])


def save_split_files(splits: Splits, directory: str | pathlib.Path) -> None:
    d = pathlib.Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    for name, mask in zip(MASK_FILES, (splits.train, splits.val, splits.test)):
        with open(d / name, "w") as f:
            f.write(" ".join("1" if v else "0" for v in mask))
