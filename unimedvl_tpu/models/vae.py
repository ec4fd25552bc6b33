"""FLUX-style conv VAE, TPU-native (NHWC layout, XLA convs, fp32 GroupNorm
islands). Functional: parameters are a plain pytree, all entry points are pure.

Architecture parity with reference autoencoder.py:
  * Encoder (:122-187): conv_in, num_resolutions levels of num_res_blocks
    ResnetBlocks (+Downsample between levels), mid (res, attn, res),
    norm_out + swish + conv_out -> 2*z_channels moments.
  * Decoder (:190-257): conv_in, mid, reversed levels of num_res_blocks+1
    ResnetBlocks (+Upsample), norm_out + swish + conv_out.
  * DiagonalGaussian (:260-272), scale/shift (:300-307).

Weight layout notes: torch convs are OIHW / NCHW; here kernels are HWIO and
activations NHWC (the natural TPU layout). The weight loader transposes.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unimedvl_tpu.config import VAEConfig
from unimedvl_tpu.ops.norms import group_norm
from unimedvl_tpu.ops.activations import swish

Params = Dict


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def conv2d(x: jax.Array, p: Params, stride: int = 1, padding="SAME") -> jax.Array:
    """NHWC conv with HWIO kernel."""
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(x.dtype)


def resnet_block(x: jax.Array, p: Params) -> jax.Array:
    h = group_norm(x, p["norm1"]["scale"], p["norm1"]["bias"], 32, 1e-6)
    h = swish(h)
    h = conv2d(h, p["conv1"])
    h = group_norm(h, p["norm2"]["scale"], p["norm2"]["bias"], 32, 1e-6)
    h = swish(h)
    h = conv2d(h, p["conv2"])
    if "nin_shortcut" in p:
        x = conv2d(x, p["nin_shortcut"])
    return x + h


def attn_block(x: jax.Array, p: Params) -> jax.Array:
    """Single-head full self-attention over H*W positions (autoencoder.py:38-65)."""
    n, h, w, c = x.shape
    y = group_norm(x, p["norm"]["scale"], p["norm"]["bias"], 32, 1e-6)
    q = conv2d(y, p["q"]).reshape(n, h * w, c)
    k = conv2d(y, p["k"]).reshape(n, h * w, c)
    v = conv2d(y, p["v"]).reshape(n, h * w, c)
    # fp32 softmax; matches torch SDPA numerics closely enough for pixel parity.
    logits = jnp.einsum("nqc,nkc->nqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / np.sqrt(c)
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("nqk,nkc->nqc", attn, v).reshape(n, h, w, c)
    return x + conv2d(o, p["proj_out"])


def downsample(x: jax.Array, p: Params) -> jax.Array:
    """Asymmetric pad (right/bottom) + stride-2 valid conv (autoencoder.py:98-108)."""
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(x, p["conv"], stride=2, padding="VALID")


def upsample(x: jax.Array, p: Params) -> jax.Array:
    """Nearest-neighbour 2x then 3x3 conv (autoencoder.py:111-119)."""
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv2d(x, p["conv"])


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------

def encoder_forward(params: Params, cfg: VAEConfig, x_nhwc: jax.Array) -> jax.Array:
    """[N,H,W,3] -> [N,H/8,W/8,2*z] moments (autoencoder.py:169-187)."""
    h = conv2d(x_nhwc, params["conv_in"])
    for i_level in range(cfg.num_resolutions):
        level = params["down"][i_level]
        for i_block in range(cfg.num_res_blocks):
            h = resnet_block(h, level["block"][i_block])
        if i_level != cfg.num_resolutions - 1:
            h = downsample(h, level["downsample"])
    h = resnet_block(h, params["mid"]["block_1"])
    h = attn_block(h, params["mid"]["attn_1"])
    h = resnet_block(h, params["mid"]["block_2"])
    h = group_norm(h, params["norm_out"]["scale"], params["norm_out"]["bias"], 32, 1e-6)
    h = swish(h)
    return conv2d(h, params["conv_out"])


def decoder_forward(params: Params, cfg: VAEConfig, z_nhwc: jax.Array) -> jax.Array:
    """[N,h,w,z] -> [N,8h,8w,3] (autoencoder.py:240-257)."""
    h = conv2d(z_nhwc, params["conv_in"])
    h = resnet_block(h, params["mid"]["block_1"])
    h = attn_block(h, params["mid"]["attn_1"])
    h = resnet_block(h, params["mid"]["block_2"])
    for i_level in reversed(range(cfg.num_resolutions)):
        level = params["up"][i_level]
        for i_block in range(cfg.num_res_blocks + 1):
            h = resnet_block(h, level["block"][i_block])
        if i_level != 0:
            h = upsample(h, level["upsample"])
    h = group_norm(h, params["norm_out"]["scale"], params["norm_out"]["bias"], 32, 1e-6)
    h = swish(h)
    return conv2d(h, params["conv_out"])


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def encode_moments(params: Params, cfg: VAEConfig, images_nhwc: jax.Array):
    """Returns (mean, logvar), each [N, h, w, z]."""
    moments = encoder_forward(params["encoder"], cfg, images_nhwc)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, logvar


def encode(
    params: Params,
    cfg: VAEConfig,
    images_nhwc: jax.Array,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Sampled + scaled latent (autoencoder.py:300-303). Deterministic (mean)
    when rng is None."""
    mean, logvar = encode_moments(params, cfg, images_nhwc)
    if rng is not None:
        std = jnp.exp(0.5 * logvar.astype(jnp.float32)).astype(mean.dtype)
        noise = jax.random.normal(rng, mean.shape, dtype=jnp.float32).astype(mean.dtype)
        z = mean + std * noise
    else:
        z = mean
    return cfg.scale_factor * (z - cfg.shift_factor)


def decode(params: Params, cfg: VAEConfig, z_nhwc: jax.Array) -> jax.Array:
    """Scaled latent -> image in [-1, 1] (autoencoder.py:305-307)."""
    z = z_nhwc / cfg.scale_factor + cfg.shift_factor
    return decoder_forward(params["decoder"], cfg, z)


# ---------------------------------------------------------------------------
# initialisation (tests / training-from-scratch)
# ---------------------------------------------------------------------------

def _init_conv(key, kh, kw, cin, cout, dtype) -> Params:
    fan_in = kh * kw * cin
    k1, _ = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(k1, (kh, kw, cin, cout), dtype, -bound, bound),
        "bias": jnp.zeros((cout,), dtype),
    }


def _init_norm(c, dtype) -> Params:
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _init_resnet(key, cin, cout, dtype) -> Params:
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _init_norm(cin, dtype),
        "conv1": _init_conv(ks[0], 3, 3, cin, cout, dtype),
        "norm2": _init_norm(cout, dtype),
        "conv2": _init_conv(ks[1], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["nin_shortcut"] = _init_conv(ks[2], 1, 1, cin, cout, dtype)
    return p


def _init_attn(key, c, dtype) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "norm": _init_norm(c, dtype),
        "q": _init_conv(ks[0], 1, 1, c, c, dtype),
        "k": _init_conv(ks[1], 1, 1, c, c, dtype),
        "v": _init_conv(ks[2], 1, 1, c, c, dtype),
        "proj_out": _init_conv(ks[3], 1, 1, c, c, dtype),
    }


def init_params(key: jax.Array, cfg: VAEConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 256))

    # encoder
    enc: Params = {"conv_in": _init_conv(next(keys), 3, 3, cfg.in_channels, cfg.ch, dtype)}
    in_ch_mult = (1,) + tuple(cfg.ch_mult)
    down = []
    block_in = cfg.ch
    for i_level in range(cfg.num_resolutions):
        block_in = cfg.ch * in_ch_mult[i_level]
        block_out = cfg.ch * cfg.ch_mult[i_level]
        blocks = []
        for _ in range(cfg.num_res_blocks):
            blocks.append(_init_resnet(next(keys), block_in, block_out, dtype))
            block_in = block_out
        level: Params = {"block": blocks}
        if i_level != cfg.num_resolutions - 1:
            level["downsample"] = {"conv": _init_conv(next(keys), 3, 3, block_in, block_in, dtype)}
        down.append(level)
    enc["down"] = down
    enc["mid"] = {
        "block_1": _init_resnet(next(keys), block_in, block_in, dtype),
        "attn_1": _init_attn(next(keys), block_in, dtype),
        "block_2": _init_resnet(next(keys), block_in, block_in, dtype),
    }
    enc["norm_out"] = _init_norm(block_in, dtype)
    enc["conv_out"] = _init_conv(next(keys), 3, 3, block_in, 2 * cfg.z_channels, dtype)

    # decoder
    block_in = cfg.ch * cfg.ch_mult[cfg.num_resolutions - 1]
    dec: Params = {"conv_in": _init_conv(next(keys), 3, 3, cfg.z_channels, block_in, dtype)}
    dec["mid"] = {
        "block_1": _init_resnet(next(keys), block_in, block_in, dtype),
        "attn_1": _init_attn(next(keys), block_in, dtype),
        "block_2": _init_resnet(next(keys), block_in, block_in, dtype),
    }
    up = [None] * cfg.num_resolutions
    for i_level in reversed(range(cfg.num_resolutions)):
        block_out = cfg.ch * cfg.ch_mult[i_level]
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_init_resnet(next(keys), block_in, block_out, dtype))
            block_in = block_out
        level = {"block": blocks}
        if i_level != 0:
            level["upsample"] = {"conv": _init_conv(next(keys), 3, 3, block_in, block_in, dtype)}
        up[i_level] = level
    dec["up"] = up
    dec["norm_out"] = _init_norm(block_in, dtype)
    dec["conv_out"] = _init_conv(next(keys), 3, 3, block_in, cfg.out_ch, dtype)

    return {"encoder": enc, "decoder": dec}
