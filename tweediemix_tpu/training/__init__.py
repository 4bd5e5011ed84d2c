from tweediemix_tpu.training.custom_diffusion import (
    TrainConfig,
    TrainState,
    make_optimizer,
    make_train_step,
    trainable_mask,
)

__all__ = [
    "TrainConfig",
    "TrainState",
    "make_optimizer",
    "make_train_step",
    "trainable_mask",
]
