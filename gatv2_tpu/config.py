"""Model / training configuration.

Mirrors the reference CLI surface and defaults (README.md:85-104,
GATv2_edge_based.cu:934-939): L=2 layers, epochs=200, optimizer sgd,
lr=1e-4, betas 0.9/0.999, clip off (threshold 5.0 when on), dataset pubmed,
data root ./data with DATA_ROOT env fallback, LeakyReLU slope 0.01
(GATv2_edge_based.cu:1143).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of a multi-layer GATv2 + linear classifier."""

    num_layers: int = 2
    heads: tuple[int, ...] = (1, 1)
    out_dims: tuple[int, ...] = (16, 16)  # per-head output dim, per layer
    num_classes: int = 0  # inferred from labels (max+1), reference E:1106-1107
    in_dim: int = 0  # feature dim, inferred from features.txt
    negative_slope: float = 0.01
    # 'edge' = fused-W semantics incl. last-layer LeakyReLU-then-mean
    #   (GATv2_edge_based.cu:443-448);
    # 'node' = split-W semantics, last-layer mean-then-LeakyReLU
    #   (GATv2_node_based.cu:548-557).
    variant: str = "edge"
    # dtype for activations/projections; params are kept float32.
    param_dtype: str = "float32"
    compute_dtype: str = "float32"
    # MXU matmul precision: 'highest' = true f32 (reference parity — the CUDA
    # reference is exact f32); 'default' = single-pass bf16 inputs with f32
    # accumulation (the fast TPU-idiomatic mode, ~6x more MXU throughput).
    matmul_precision: str = "highest"
    # rematerialize each GAT layer in the backward pass (jax.checkpoint):
    # trades ~1 extra layer-forward per layer for dropping the per-layer
    # activation/projection residuals — the knob that fits 60M+-edge
    # full-graph training in one chip's HBM.
    remat: bool = False
    # SELL-kernel stream tier: 'f32' (exact, the default) or 'bf16' — the
    # projections are ROUNDED ONCE to bfloat16 and the attention custom-VJP
    # residuals are STORED bf16 (halved residual footprint). Transport and
    # all arithmetic stay f32 on the rounded values (bf16 HBM transport
    # measured 18% SLOWER on chip: gathers read 16-row bf16 tiles per row —
    # the same physical bytes as 8-row f32 tiles — plus convert passes; and
    # remat-off-via-smaller-residuals still exceeds HBM at products-full,
    # the backward's node-space f32 tables dominate). Forward/backward
    # recomputes see the same rounded inputs, so the tier equals running
    # the exact kernels on bf16-rounded projections; g/sigma/r stay exact
    # f32. Orthogonal to matmul_precision (which controls MXU passes).
    streams: str = "f32"

    def __post_init__(self):
        if len(self.heads) != self.num_layers or len(self.out_dims) != self.num_layers:
            raise ValueError(
                f"--heads and --outdims must each have --num-layers={self.num_layers} "
                f"entries; got heads={list(self.heads)} outdims={list(self.out_dims)}"
            )
        if self.variant not in ("edge", "node"):
            raise ValueError(f"variant must be 'edge' or 'node', got {self.variant!r}")
        if self.matmul_precision not in ("highest", "high", "default"):
            raise ValueError(
                f"matmul_precision must be 'highest', 'high' or 'default', "
                f"got {self.matmul_precision!r}"
            )
        if self.streams not in ("f32", "bf16"):
            raise ValueError(
                f"streams must be 'f32' or 'bf16', got {self.streams!r}"
            )

    @property
    def precision(self):
        import jax

        return {
            "highest": jax.lax.Precision.HIGHEST,  # exact f32 (parity mode)
            "high": jax.lax.Precision.HIGH,  # bf16x3 passes, ~f32 accuracy
            "default": jax.lax.Precision.DEFAULT,  # bf16 in, f32 accumulate
        }[self.matmul_precision]

    @property
    def layer_in_dims(self) -> tuple[int, ...]:
        """in_dim of each layer: features, then heads[l-1]*out_dims[l-1].

        Reference: GATv2_edge_based.cu:1115-1118 (next in_dim = H*D concat).
        """
        dims = [self.in_dim]
        for l in range(1, self.num_layers):
            dims.append(self.heads[l - 1] * self.out_dims[l - 1])
        return tuple(dims)

    @property
    def final_dim(self) -> int:
        """Classifier input dim: last layer averages heads -> out_dims[-1]."""
        return self.out_dims[-1]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    epochs: int = 200
    optimizer: str = "sgd"  # 'sgd' | 'adam'
    lr: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    clip: bool = False
    clip_norm: float = 5.0  # fixed threshold, reference E:1561-1567
    seed: int | None = None  # None -> time-based, like reference's time(NULL)
    dataset: str = "pubmed"
    data_root: str = "./data"
    # implementation of the attention/aggregation path:
    #   'xla'    — pure jnp segment ops (oracle, runs everywhere)
    #   'pallas' — fused row-blocked Pallas kernel (TPU)
    impl: str = "xla"
    # minibatch (sampled-subgraph) mode: batch_size > 0 switches the trainer
    # from the reference's full-graph epochs to neighbor-sampled minibatches
    # (fanouts = per-layer in-neighbor caps; engine picks the C++ or numpy
    # sampler). Reference has no such mode (SURVEY.md §2.5).
    batch_size: int = 0
    fanouts: tuple = ()
    sampler_engine: str = "auto"  # 'auto' | 'native' | 'python'
    # static-shape budget policy for sampled subgraphs (data/sampling.py):
    # 'auto' (worst case capped at the graph size, exact), 'worst'
    # (uncapped), 'probe' (sized from probe batches, big padding cut).
    sample_budget: str = "auto"
    # minibatch feature delivery: 'device' keeps the full feature matrix
    # resident on device and gathers batch rows on-chip from node ids
    # (~100x less per-batch transfer); 'host' gathers rows on host per
    # batch — for graphs whose feature matrix exceeds device memory.
    feature_residency: str = "device"
    log_file: str | None = None  # JSONL metrics sink
    checkpoint_dir: str | None = None
    checkpoint_every: int = 0  # epochs; 0 = off
    resume: bool = False

    def validate(self) -> list[str]:
        """Returns warnings; raises on errors (mirrors reference behavior).

        Adam beta range error: GATv2_edge_based.cu:1011-1015;
        SGD beta warning: GATv2_edge_based.cu:1017-1019.
        """
        warnings = []
        if self.optimizer not in ("sgd", "adam"):
            raise ValueError(f"Unknown optimizer: {self.optimizer}")
        if self.optimizer == "adam":
            if not (0.0 < self.beta1 < 1.0 and 0.0 < self.beta2 < 1.0):
                raise ValueError(
                    "Error: beta1 and beta2 must be in range (0,1) for Adam optimizer."
                )
        elif self.optimizer == "sgd":
            if self.beta1 != 0.9 or self.beta2 != 0.999:
                warnings.append(
                    "Warning: beta parameters are ignored when using SGD optimizer."
                )
        if self.feature_residency not in ("device", "host"):
            raise ValueError(
                f"feature_residency must be 'device' or 'host', "
                f"got {self.feature_residency!r}"
            )
        if self.batch_size < 0:
            raise ValueError(f"--batch-size must be >= 0, got {self.batch_size}")
        if self.batch_size > 0 and any(f < 1 for f in self.fanouts):
            # fanout 0 would silently train on edge-free subgraphs (and the
            # two sampler engines diverge on negatives)
            raise ValueError(
                f"--fanouts entries must be >= 1, got {list(self.fanouts)}"
            )
        return warnings
