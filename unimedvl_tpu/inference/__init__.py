from unimedvl_tpu.inference.pipeline import (
    GenContext,
    GenImageJob,
    InterleaveInferencer,
    VLM_THINK_SYSTEM_PROMPT,
    GEN_THINK_SYSTEM_PROMPT,
)

__all__ = [
    "GenContext",
    "GenImageJob",
    "InterleaveInferencer",
    "VLM_THINK_SYSTEM_PROMPT",
    "GEN_THINK_SYSTEM_PROMPT",
]
