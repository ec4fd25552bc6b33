from unimedvl_tpu.inference.pipeline import (
    GenContext,
    InterleaveInferencer,
    VLM_THINK_SYSTEM_PROMPT,
    GEN_THINK_SYSTEM_PROMPT,
)

__all__ = [
    "GenContext",
    "InterleaveInferencer",
    "VLM_THINK_SYSTEM_PROMPT",
    "GEN_THINK_SYSTEM_PROMPT",
]
