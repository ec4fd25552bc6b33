"""Normalisation primitives with explicit fp32 islands.

XLA fuses these into surrounding element-wise chains; no Pallas needed.
Numerics mirror the reference:
  * rms_norm: modeling_qwen2.py:80-94 (fp32 mean-square, cast back to the
    input dtype BEFORE the weight multiply).
  * layer_norm: torch.nn.LayerNorm under bf16 autocast (fp32 compute).
  * group_norm: torch.nn.GroupNorm(32, eps=1e-6) in the FLUX VAE
    (autoencoder.py:43,75).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm over the last axis. Matches Qwen2RMSNorm numerics exactly."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    return weight * y.astype(x.dtype)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-6
) -> jax.Array:
    """LayerNorm over the last axis, computed in fp32."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y.astype(x.dtype)
    return y * weight + bias


def group_norm(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-6,
) -> jax.Array:
    """GroupNorm for NHWC tensors (channel-last; TPU-friendly conv layout).

    x: [N, H, W, C]; weight/bias: [C].
    """
    n, h, w, c = x.shape
    assert c % num_groups == 0, (c, num_groups)
    x32 = x.astype(jnp.float32).reshape(n, h, w, num_groups, c // num_groups)
    mean = jnp.mean(x32, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2, 4), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(n, h, w, c).astype(x.dtype)
    return y * weight + bias
