"""VAE weight conversion: FLUX ``ae.safetensors`` (torch OIHW state dict,
optionally with a ``module.`` DDP prefix — autoencoder.py:356) -> NHWC/HWIO
jax pytree matching unimedvl_tpu.models.vae.init_params structure.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from unimedvl_tpu.config import VAEConfig


def _np(x, dtype) -> np.ndarray:
    """Host-side dtype conversion (see bagel_loader._np: staging on host keeps
    big checkpoints off the device until sharded placement)."""
    return np.asarray(x).astype(np.dtype(dtype), copy=False)


def _conv(sd: Mapping[str, np.ndarray], prefix: str, dtype) -> Dict:
    w = np.asarray(sd[prefix + ".weight"])  # [O, I, kh, kw]
    b = np.asarray(sd[prefix + ".bias"])
    return {
        "kernel": _np(np.ascontiguousarray(w.transpose(2, 3, 1, 0)), dtype),  # HWIO
        "bias": _np(b, dtype),
    }


def _norm(sd: Mapping[str, np.ndarray], prefix: str, dtype) -> Dict:
    return {
        "scale": _np(sd[prefix + ".weight"], dtype),
        "bias": _np(sd[prefix + ".bias"], dtype),
    }


def _resnet(sd, prefix: str, dtype) -> Dict:
    p = {
        "norm1": _norm(sd, prefix + ".norm1", dtype),
        "conv1": _conv(sd, prefix + ".conv1", dtype),
        "norm2": _norm(sd, prefix + ".norm2", dtype),
        "conv2": _conv(sd, prefix + ".conv2", dtype),
    }
    if prefix + ".nin_shortcut.weight" in sd:
        p["nin_shortcut"] = _conv(sd, prefix + ".nin_shortcut", dtype)
    return p


def _attn(sd, prefix: str, dtype) -> Dict:
    return {
        "norm": _norm(sd, prefix + ".norm", dtype),
        "q": _conv(sd, prefix + ".q", dtype),
        "k": _conv(sd, prefix + ".k", dtype),
        "v": _conv(sd, prefix + ".v", dtype),
        "proj_out": _conv(sd, prefix + ".proj_out", dtype),
    }


def convert_vae_state_dict(
    state_dict: Mapping[str, np.ndarray],
    cfg: VAEConfig,
    dtype=jnp.bfloat16,
) -> Dict:
    """Torch state dict (numpy-convertible values) -> vae params pytree
    (host-staged numpy leaves; commit with bagel_loader.place_params)."""
    sd = {k.replace("module.", ""): v for k, v in state_dict.items()}

    enc: Dict = {"conv_in": _conv(sd, "encoder.conv_in", dtype)}
    down = []
    for i in range(cfg.num_resolutions):
        level: Dict = {
            "block": [
                _resnet(sd, f"encoder.down.{i}.block.{j}", dtype)
                for j in range(cfg.num_res_blocks)
            ]
        }
        if f"encoder.down.{i}.downsample.conv.weight" in sd:
            level["downsample"] = {"conv": _conv(sd, f"encoder.down.{i}.downsample.conv", dtype)}
        down.append(level)
    enc["down"] = down
    enc["mid"] = {
        "block_1": _resnet(sd, "encoder.mid.block_1", dtype),
        "attn_1": _attn(sd, "encoder.mid.attn_1", dtype),
        "block_2": _resnet(sd, "encoder.mid.block_2", dtype),
    }
    enc["norm_out"] = _norm(sd, "encoder.norm_out", dtype)
    enc["conv_out"] = _conv(sd, "encoder.conv_out", dtype)

    dec: Dict = {"conv_in": _conv(sd, "decoder.conv_in", dtype)}
    dec["mid"] = {
        "block_1": _resnet(sd, "decoder.mid.block_1", dtype),
        "attn_1": _attn(sd, "decoder.mid.attn_1", dtype),
        "block_2": _resnet(sd, "decoder.mid.block_2", dtype),
    }
    up = []
    for i in range(cfg.num_resolutions):
        level = {
            "block": [
                _resnet(sd, f"decoder.up.{i}.block.{j}", dtype)
                for j in range(cfg.num_res_blocks + 1)
            ]
        }
        if f"decoder.up.{i}.upsample.conv.weight" in sd:
            level["upsample"] = {"conv": _conv(sd, f"decoder.up.{i}.upsample.conv", dtype)}
        up.append(level)
    dec["up"] = up
    dec["norm_out"] = _norm(sd, "decoder.norm_out", dtype)
    dec["conv_out"] = _conv(sd, "decoder.conv_out", dtype)

    return {"encoder": enc, "decoder": dec}


def load_ae(path: str, cfg: VAEConfig | None = None, dtype=jnp.bfloat16):
    """Read ae.safetensors and return (params, cfg) — analogue of
    autoencoder.py:337-360."""
    from safetensors.numpy import load_file

    cfg = cfg or VAEConfig()
    sd = load_file(path)
    return convert_vae_state_dict(sd, cfg, dtype), cfg
