from unimedvl_tpu.ops.norms import rms_norm, layer_norm, group_norm
from unimedvl_tpu.ops.rope import rope_cos_sin, apply_rope, rope_2d_tables
from unimedvl_tpu.ops.sincos import (
    get_2d_sincos_pos_embed,
    timestep_embedding,
)
from unimedvl_tpu.ops.activations import gelu_tanh, silu, swish

__all__ = [
    "rms_norm",
    "layer_norm",
    "group_norm",
    "rope_cos_sin",
    "apply_rope",
    "rope_2d_tables",
    "get_2d_sincos_pos_embed",
    "timestep_embedding",
    "gelu_tanh",
    "silu",
    "swish",
]
