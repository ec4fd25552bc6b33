from unimedvl_tpu.training.trainer import (
    TrainState,
    create_train_state,
    train_step,
    make_train_step,
)

__all__ = ["TrainState", "create_train_state", "train_step", "make_train_step"]
