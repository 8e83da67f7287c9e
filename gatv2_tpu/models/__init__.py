from gatv2_tpu.models.gatv2 import (
    GATv2Params,
    init_params,
    layer_forward,
    model_forward,
    loss_and_accuracy,
)

__all__ = [
    "GATv2Params",
    "init_params",
    "layer_forward",
    "model_forward",
    "loss_and_accuracy",
]
