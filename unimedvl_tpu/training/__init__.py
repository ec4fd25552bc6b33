from unimedvl_tpu.training.trainer import (
    TrainState,
    create_train_state,
    train_step,
    make_train_step,
)
from unimedvl_tpu.training.lora import (
    add_lora,
    merge_lora,
    apply_lora_only,
    lora_labels,
    count_lora_params,
    make_lora_train_step,
)

__all__ = [
    "TrainState", "create_train_state", "train_step", "make_train_step",
    "add_lora", "merge_lora", "apply_lora_only", "lora_labels",
    "count_lora_params", "make_lora_train_step",
]
