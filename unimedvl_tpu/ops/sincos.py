"""Frozen sinusoidal embeddings: 2D sin-cos position tables and DiT timestep
embeddings. Numerics mirror reference modeling_utils.py:23-109 exactly
(including the w-before-h meshgrid quirk and cos-before-sin timestep order).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """(M, embed_dim) = [sin(pos*w), cos(pos*w)] (modeling_utils.py:47-65)."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """(grid_size**2, embed_dim) fp32 table, row-major flattened
    (index = row * grid_size + col), matching modeling_utils.py:23-44.

    Note the reference quirk: np.meshgrid(grid_w, grid_h) puts the *column*
    coordinate in grid[0], so the first embed_dim//2 dims encode the column.
    """
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # grid[0]=col ids, grid[1]=row ids
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    emb_a = _sincos_1d(embed_dim // 2, grid[0])
    emb_b = _sincos_1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_a, emb_b], axis=1).astype(np.float32)


def timestep_embedding(
    t: jax.Array, dim: int, max_period: float = 10000.0
) -> jax.Array:
    """DiT sinusoidal timestep embedding (modeling_utils.py:86-104).

    t: [N] (possibly fractional) timesteps; returns [N, dim] fp32 with the
    reference's **cos-first** ordering: concat([cos(args), sin(args)]).
    """
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb
