"""Activation functions matching the reference's torch/HF flavours."""

import jax


def gelu_tanh(x: jax.Array) -> jax.Array:
    """HF ``gelu_pytorch_tanh`` == tanh-approximated GELU."""
    return jax.nn.gelu(x, approximate=True)


def silu(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)


# marker consumed by qwen2_mot._mlp: the fused Pallas silu·mul·quant kernel
# (ops/act_quant.py) is only numerically valid for THIS activation
silu.is_silu = True


def swish(x: jax.Array) -> jax.Array:
    """FLUX VAE swish (autoencoder.py:34): x * sigmoid(x) == silu."""
    return x * jax.nn.sigmoid(x)


ACT2FN = {
    "gelu_pytorch_tanh": gelu_tanh,
    "silu": silu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "relu": jax.nn.relu,
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
}
