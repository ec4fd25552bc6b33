"""End-to-end VAE training extras (reference bagel.py:63-88, 122-199).

Two pieces, both config-gated via ``BagelConfig.e2e``:

* **Latent batch-norm** — the reference wraps VAE latents in a
  ``BatchNorm2d(z_channels, eps=1e-4, affine=False,
  track_running_stats=True)`` (bagel.py:122-135) and applies it in
  ``vae_encode`` / the training forward (bagel.py:168-199, 230-231).
  Functionally here: per-z-channel statistics with an explicit running-stats
  state threaded through the train step (no mutable modules on TPU).
  Operates directly on patchified latent tokens [N, p*p*zc] — element
  grouping by channel is identical to BN2d over the unpatchified latent.

* **REPA-style alignment** — cosine alignment between mid-layer diffusion
  features (the ``diffusion_feature_layer`` tap,
  qwen2_navit.py:1083-1097) and a frozen teacher's features
  (``teacher_config="dinov2_small"`` in the reference; the DINOv2 weights
  are not shipped, so the teacher is pluggable: anything producing
  [N, teacher_feature_dim] features). A learned linear projection maps
  LLM hidden -> teacher dim before the cosine.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from unimedvl_tpu.config import E2EVAEConfig


@struct.dataclass
class BatchNormState:
    """Running statistics for the latent batch-norm (torch BatchNorm2d
    semantics with affine=False)."""

    mean: jax.Array  # [zc]
    var: jax.Array  # [zc]

    @classmethod
    def create(cls, z_channels: int) -> "BatchNormState":
        return cls(
            mean=jnp.zeros((z_channels,), jnp.float32),
            var=jnp.ones((z_channels,), jnp.float32),
        )


def latent_batch_norm(
    tokens: jax.Array,  # [N, p*p*zc] patchified latent tokens
    state: BatchNormState,
    z_channels: int,
    training: bool,
    momentum: float = 0.1,
    eps: float = 1e-4,
) -> Tuple[jax.Array, BatchNormState]:
    """Normalize latent tokens per z-channel. Returns (normed, new_state).

    Training: batch statistics normalize; running stats update with torch's
    convention (running_var uses the UNBIASED batch variance). Eval: running
    stats normalize, state unchanged.
    """
    N, pd = tokens.shape
    pp = pd // z_channels
    x = tokens.reshape(N * pp, z_channels).astype(jnp.float32)
    if training:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
        n = x.shape[0]
        unbiased = var * n / jnp.maximum(n - 1, 1)
        new_state = BatchNormState(
            mean=(1 - momentum) * state.mean + momentum * mean,
            var=(1 - momentum) * state.var + momentum * unbiased,
        )
    else:
        mean, var = state.mean, state.var
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y.reshape(N, pd).astype(tokens.dtype), new_state


def init_repa_params(key: jax.Array, hidden_size: int, cfg: E2EVAEConfig, dtype=jnp.float32) -> Dict:
    """Learned projection LLM hidden -> teacher feature dim."""
    bound = 1.0 / jnp.sqrt(hidden_size)
    return {
        "proj": {
            "kernel": jax.random.uniform(
                key, (hidden_size, cfg.teacher_feature_dim), dtype, -bound, bound
            ),
            "bias": jnp.zeros((cfg.teacher_feature_dim,), dtype),
        }
    }


def repa_alignment_loss(
    diffusion_features: jax.Array,  # [N, C] mid-layer features at vae tokens
    teacher_features: jax.Array,  # [N, Dt] frozen teacher features
    repa_params: Dict,
    weight: jax.Array | None = None,  # [N] optional per-token weight
    alignment_type: str = "cosine",
) -> jax.Array:
    """REPA alignment: 1 - cos(proj(h), teacher), weighted mean over tokens.

    The teacher is treated as frozen (stop_gradient) — gradients flow only
    through the student features and the projection.
    """
    p = repa_params["proj"]
    z = diffusion_features.astype(jnp.float32) @ p["kernel"].astype(jnp.float32)
    z = z + p["bias"].astype(jnp.float32)
    t = jax.lax.stop_gradient(teacher_features.astype(jnp.float32))
    if alignment_type == "cosine":
        # rsqrt(sum² + eps) keeps the gradient finite on all-zero (padded)
        # rows, unlike norm()+eps whose derivative is NaN at exactly 0
        zn = z * jax.lax.rsqrt(jnp.sum(jnp.square(z), -1, keepdims=True) + 1e-12)
        tn = t * jax.lax.rsqrt(jnp.sum(jnp.square(t), -1, keepdims=True) + 1e-12)
        per_tok = 1.0 - jnp.sum(zn * tn, axis=-1)
    elif alignment_type == "l2":
        per_tok = jnp.mean(jnp.square(z - t), axis=-1)
    else:
        raise NotImplementedError(alignment_type)
    if weight is None:
        return jnp.mean(per_tok)
    w = weight.astype(jnp.float32)
    return jnp.sum(per_tok * w) / jnp.maximum(jnp.sum(w), 1.0)
