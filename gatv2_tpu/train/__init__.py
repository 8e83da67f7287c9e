from gatv2_tpu.train.optim import OptState, init_opt_state, apply_updates, clip_by_group_norm
from gatv2_tpu.train.loop import Trainer, make_train_step

__all__ = [
    "OptState",
    "init_opt_state",
    "apply_updates",
    "clip_by_group_norm",
    "Trainer",
    "make_train_step",
]
