"""gatv2_tpu — TPU-native GATv2 message-passing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CUDA implementation (`saurabh260918/Graph-Attention-Network-GATv2-`,
/root/reference/GATv2_edge_based.cu and GATv2_node_based.cu): multi-layer,
multi-head GATv2 dynamic attention for single-label full-graph node
classification, trained end-to-end (forward, autodiff backward, SGD/Adam with
optional global-norm clipping), over the four-file text CSR dataset format.

Where the reference parallelizes with a CUDA thread per edge + atomicAdd
scatter (GATv2_edge_based.cu:279-424) or a warp per node (GATv2_node_based.cu:
351-562), this framework uses dense MXU matmuls for feature projection,
dst-sorted segment reductions for softmax/aggregation (deterministic, no
atomics), Pallas row-blocked kernels for the fused attention path, and scales
over TPU meshes with `jax.shard_map` edge partitioning.
"""

from gatv2_tpu.config import ModelConfig, TrainConfig
from gatv2_tpu.data.graph import Graph
from gatv2_tpu.models.gatv2 import (
    GATv2Params,
    init_params,
    model_forward,
    loss_and_accuracy,
)

__version__ = "0.1.0"

__all__ = [
    "ModelConfig",
    "TrainConfig",
    "Graph",
    "GATv2Params",
    "init_params",
    "model_forward",
    "loss_and_accuracy",
]
