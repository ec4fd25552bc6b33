from unimedvl_tpu.eval.vqa import (
    build_transform,
    process_conversation,
    run_vqa_eval,
    exact_match_accuracy,
)

__all__ = [
    "build_transform",
    "process_conversation",
    "run_vqa_eval",
    "exact_match_accuracy",
]
