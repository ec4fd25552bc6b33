"""Rotary position embeddings (1D for the LLM, 2D for the optional ViT rope).

Numerics mirror the reference:
  * 1D: Qwen2RotaryEmbedding + apply_rotary_pos_emb
    (modeling_qwen2.py:100-222): fp32 angle computation, ``rotate_half``
    (split-halves, NOT interleaved), cos/sin cast to the activation dtype
    before the multiply.
  * 2D: RotaryEmbedding2D (siglip_navit.py:102-142): separate h/w tables of
    dim head_dim//2 applied to the two halves of each head. Unused by the
    released UniMedVL checkpoints (rope=False) but kept for parity.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def rope_inv_freq(head_dim: int, theta: float) -> jax.Array:
    """[head_dim//2] fp32 inverse frequencies."""
    exponent = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta**exponent)


def rope_cos_sin(
    position_ids: jax.Array, head_dim: int, theta: float
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for arbitrary position ids.

    position_ids: int array of any shape [...]; returns fp32 cos/sin of shape
    [..., head_dim] with the (freqs, freqs) duplication convention.
    """
    inv_freq = rope_inv_freq(head_dim, theta)
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    q: jax.Array,
    k: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Apply rotary embedding to q [..., T, H, Dh] and k [..., T, Hk, Dh].

    cos/sin: [..., T, Dh] — broadcast over the head axis. The multiply happens
    in the dtype of q/k (mirrors reference behaviour where cos/sin are cast to
    the activation dtype; pass fp32 q/k for the gen-mode fp32 island).
    """
    cos = cos.astype(q.dtype)[..., :, None, :]
    sin = sin.astype(q.dtype)[..., :, None, :]
    q_out = q * cos + _rotate_half(q) * sin
    k_out = k * cos.astype(k.dtype) + _rotate_half(k) * sin.astype(k.dtype)
    return q_out, k_out


def apply_rope_one(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """apply_rope for a single tensor [..., T, H, Dh] (e.g. the k side when
    the q side is fused into the attention kernel)."""
    cos = cos.astype(x.dtype)[..., :, None, :]
    sin = sin.astype(x.dtype)[..., :, None, :]
    return x * cos + _rotate_half(x) * sin


def rope_2d_tables(
    dim: int, max_h: int, max_w: int, theta: float = 10000.0
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """2D ViT rope tables (siglip_navit.py:102-127).

    ``dim`` is head_dim // 2 (each spatial axis rotates half the head).
    Returns (cos_h, sin_h, cos_w, sin_w), each [max_h*max_w, dim] fp32, indexed
    by flattened position id (row * max_w + col).
    """
    inv_freq = rope_inv_freq(dim, theta)  # [dim//2]
    rows = jnp.arange(max_h, dtype=jnp.float32)[:, None] * jnp.ones((1, max_w))
    cols = jnp.ones((max_h, 1)) * jnp.arange(max_w, dtype=jnp.float32)[None, :]

    def one_side(grid):
        freqs = grid[..., None] * inv_freq  # [H, W, dim//2]
        emb = jnp.concatenate([freqs, freqs], axis=-1).reshape(-1, dim)
        return jnp.cos(emb), jnp.sin(emb)

    cos_h, sin_h = one_side(rows)
    cos_w, sin_w = one_side(cols)
    return cos_h, sin_h, cos_w, sin_w
