"""Checkpoint loader: released UniMedVL safetensors (torch state dict with
reference module names) -> unimedvl_tpu parameter pytrees.

Name map sources:
  * LLM: qwen2_navit.py (PackedAttentionMoT:389-407, Qwen2MoTDecoderLayer:
    713-731, Qwen2Model:1025-1043, Qwen2ForCausalLM:1179-1187) —
    ``language_model.model.layers.{i}.self_attn.q_proj.weight`` etc., with
    ``*_moe_gen`` twins.
  * ViT: siglip_navit.py — ``vit_model.vision_model...``; the conv patch
    embedding is converted to linear exactly as convert_conv2d_to_linear
    (siglip_navit.py:167-182); the trailing checkpoint ViT layer is dropped
    (interactive_vqa_inferencer.py:213).
  * Aux: bagel.py:114-143 — time_embedder.mlp.{0,2}, vae2llm, llm2vae,
    latent_pos_embed.pos_embed, connector.fc{1,2}, vit_pos_embed.pos_embed.

Checkpoint selection mirrors interactive_vqa_inferencer.py:127-161:
ema.safetensors preferred over model.safetensors; sharded index supported.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from unimedvl_tpu.config import BagelConfig, LLMConfig, ViTConfig

Get = Callable[[str], np.ndarray]


def _np(x, dtype) -> np.ndarray:
    """HOST-side dtype conversion (ml_dtypes handles bfloat16 in numpy).

    The converters deliberately never touch a jax device: a 14B bf16
    checkpoint (~28 GB) cannot be materialized on one 16 GB chip, so tensors
    are staged in host RAM and placed per-leaf by ``place_params`` — sharded
    directly from host memory when a mesh is given (the TPU analogue of the
    reference's accelerate ``load_checkpoint_and_dispatch``,
    interactive_vqa_inferencer.py:163-189).
    """
    return np.asarray(x).astype(np.dtype(dtype), copy=False)


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear [out, in] -> kernel [in, out]."""
    return np.ascontiguousarray(np.asarray(w).T)


def _linear(get: Get, prefix: str, dtype, bias: bool) -> Dict:
    p = {"kernel": _np(_t(get(prefix + ".weight")), dtype)}
    if bias:
        p["bias"] = _np(get(prefix + ".bias"), dtype)
    return p


def _stack(dicts):
    """List of identically-structured pytrees -> one pytree of host-stacked
    leaves (the [L, ...] stacked-layer layout)."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *dicts)


def convert_llm(get: Get, cfg: LLMConfig, dtype=jnp.bfloat16, prefix="language_model.") -> Dict:
    L = cfg.num_hidden_layers

    def layer(i: int) -> Dict:
        lp = f"{prefix}model.layers.{i}."
        attn = {
            "q": _linear(get, lp + "self_attn.q_proj", dtype, True),
            "k": _linear(get, lp + "self_attn.k_proj", dtype, True),
            "v": _linear(get, lp + "self_attn.v_proj", dtype, True),
            "o": _linear(get, lp + "self_attn.o_proj", dtype, False),
        }
        if cfg.qk_norm:
            attn["q_norm"] = {"scale": _np(get(lp + "self_attn.q_norm.weight"), dtype)}
            attn["k_norm"] = {"scale": _np(get(lp + "self_attn.k_norm.weight"), dtype)}
        if cfg.mot_attention:
            attn.update(
                q_gen=_linear(get, lp + "self_attn.q_proj_moe_gen", dtype, True),
                k_gen=_linear(get, lp + "self_attn.k_proj_moe_gen", dtype, True),
                v_gen=_linear(get, lp + "self_attn.v_proj_moe_gen", dtype, True),
                o_gen=_linear(get, lp + "self_attn.o_proj_moe_gen", dtype, False),
                q_norm_gen={"scale": _np(get(lp + "self_attn.q_norm_moe_gen.weight"), dtype)},
                k_norm_gen={"scale": _np(get(lp + "self_attn.k_norm_moe_gen.weight"), dtype)},
            )
        out = {
            "attn": attn,
            "input_layernorm": {"scale": _np(get(lp + "input_layernorm.weight"), dtype)},
            "post_attention_layernorm": {"scale": _np(get(lp + "post_attention_layernorm.weight"), dtype)},
            "mlp": {
                "gate": _linear(get, lp + "mlp.gate_proj", dtype, False),
                "up": _linear(get, lp + "mlp.up_proj", dtype, False),
                "down": _linear(get, lp + "mlp.down_proj", dtype, False),
            },
        }
        if cfg.mot_attention:
            out["input_layernorm_moe_gen"] = {
                "scale": _np(get(lp + "input_layernorm_moe_gen.weight"), dtype)
            }
            out["post_attention_layernorm_moe_gen"] = {
                "scale": _np(get(lp + "post_attention_layernorm_moe_gen.weight"), dtype)
            }
        if cfg.use_moe:
            out["mlp_moe_gen"] = {
                "gate": _linear(get, lp + "mlp_moe_gen.gate_proj", dtype, False),
                "up": _linear(get, lp + "mlp_moe_gen.up_proj", dtype, False),
                "down": _linear(get, lp + "mlp_moe_gen.down_proj", dtype, False),
            }
        return out

    params = {
        "embed_tokens": _np(get(prefix + "model.embed_tokens.weight"), dtype),
        "layers": _stack([layer(i) for i in range(L)]),
        "norm": {"scale": _np(get(prefix + "model.norm.weight"), dtype)},
        "lm_head": _np(_t(get(prefix + "lm_head.weight")), dtype),
    }
    if cfg.use_moe:
        params["norm_moe_gen"] = {"scale": _np(get(prefix + "model.norm_moe_gen.weight"), dtype)}
    return params


def convert_vit(get: Get, cfg: ViTConfig, dtype=jnp.bfloat16, prefix="vit_model.vision_model.") -> Dict:
    def ln(name):
        return {
            "scale": _np(get(name + ".weight"), dtype),
            "bias": _np(get(name + ".bias"), dtype),
        }

    # conv -> linear conversion (siglip_navit.py:176-179):
    # [D, 3, p, p] -> permute(0,2,3,1) -> [D, p, p, 3] -> reshape [D, p*p*3]
    w = get(prefix + "embeddings.patch_embedding.weight")
    if w.ndim == 4:
        D = w.shape[0]
        w = w.transpose(0, 2, 3, 1).reshape(D, -1)
    patch = {
        "kernel": _np(_t(w), dtype),
        "bias": _np(get(prefix + "embeddings.patch_embedding.bias"), dtype),
    }

    def layer(i: int) -> Dict:
        lp = f"{prefix}encoder.layers.{i}."
        return {
            "layer_norm1": ln(lp + "layer_norm1"),
            "attn": {
                "q": _linear(get, lp + "self_attn.q_proj", dtype, True),
                "k": _linear(get, lp + "self_attn.k_proj", dtype, True),
                "v": _linear(get, lp + "self_attn.v_proj", dtype, True),
                "out": _linear(get, lp + "self_attn.out_proj", dtype, True),
            },
            "layer_norm2": ln(lp + "layer_norm2"),
            "mlp": {
                "fc1": _linear(get, lp + "mlp.fc1", dtype, True),
                "fc2": _linear(get, lp + "mlp.fc2", dtype, True),
            },
        }

    params = {
        "patch_embedding": patch,
        # cfg.num_hidden_layers already excludes the dropped last layer.
        "layers": _stack([layer(i) for i in range(cfg.num_hidden_layers)]),
        "post_layernorm": ln(prefix + "post_layernorm"),
    }
    if not cfg.rope:
        params["position_embedding"] = _np(
            get(prefix + "embeddings.position_embedding.weight"), dtype
        )
    return params


def convert_bagel(get: Get, cfg: BagelConfig, dtype=jnp.bfloat16, has_key=None) -> Dict:
    """Full Bagel params (without the VAE, which ships as ae.safetensors —
    use weights.vae_loader.load_ae)."""
    params: Dict = {"llm": convert_llm(get, cfg.llm, dtype)}
    if cfg.visual_und and cfg.vit is not None:
        params["vit"] = convert_vit(get, cfg.vit, dtype)
        params["connector"] = {
            "fc1": _linear(get, "connector.fc1", dtype, True),
            "fc2": _linear(get, "connector.fc2", dtype, True),
        }
        params["vit_pos_embed"] = _np(get("vit_pos_embed.pos_embed"), dtype)
    if cfg.visual_gen:
        params["vae2llm"] = _linear(get, "vae2llm", dtype, True)
        params["llm2vae"] = _linear(get, "llm2vae", dtype, True)
        params["time_embedder"] = {
            "fc1": _linear(get, "time_embedder.mlp.0", dtype, True),
            "fc2": _linear(get, "time_embedder.mlp.2", dtype, True),
        }
        params["latent_pos_embed"] = _np(get("latent_pos_embed.pos_embed"), dtype)
    return params


# ---------------------------------------------------------------------------
# safetensors plumbing
# ---------------------------------------------------------------------------

class SafetensorsReader:
    """Lazy multi-file reader over a checkpoint dir, supporting single-file
    (ema.safetensors / model.safetensors) and sharded (*.index.json) layouts."""

    def __init__(self, ckpt_dir: str, prefer_ema: bool = True):
        from safetensors import safe_open

        self._safe_open = safe_open
        self._files: Dict[str, str] = {}  # key -> path
        candidates = (
            ["ema.safetensors", "model.safetensors"]
            if prefer_ema
            else ["model.safetensors", "ema.safetensors"]
        )
        index = None
        for name in ["model.safetensors.index.json", "ema.safetensors.index.json"]:
            p = os.path.join(ckpt_dir, name)
            if os.path.exists(p):
                index = p
                break
        if index is not None:
            with open(index) as f:
                idx = json.load(f)
            for key, fname in idx["weight_map"].items():
                self._files[key] = os.path.join(ckpt_dir, fname)
        else:
            for name in candidates:
                p = os.path.join(ckpt_dir, name)
                if os.path.exists(p):
                    with self._safe_open(p, framework="np") as f:
                        for key in f.keys():
                            self._files[key] = p
                    break
        if not self._files:
            raise FileNotFoundError(f"no safetensors found in {ckpt_dir}")
        self._handles: Dict[str, object] = {}

    def keys(self):
        return self._files.keys()

    def __contains__(self, key: str) -> bool:
        return key in self._files

    def __call__(self, key: str) -> np.ndarray:
        path = self._files[key]
        if path not in self._handles:
            self._handles[path] = self._safe_open(path, framework="np").__enter__()
        return self._handles[path].get_tensor(key)


class MergedReader:
    """Base checkpoint + finetune overrides (eval/vlm/utils.py:281-317 merge
    path): keys present in the finetune checkpoint win."""

    def __init__(self, base: "SafetensorsReader", finetune: "SafetensorsReader"):
        self.base = base
        self.finetune = finetune

    def keys(self):
        return set(self.base.keys()) | set(self.finetune.keys())

    def __contains__(self, key: str) -> bool:
        return key in self.finetune or key in self.base

    def __call__(self, key: str) -> np.ndarray:
        return self.finetune(key) if key in self.finetune else self.base(key)


def place_params(params: Dict, cfg: BagelConfig, mesh=None) -> Dict:
    """Commit a host-staged params pytree to devices, leaf by leaf.

    With ``mesh``: every leaf is ``device_put`` under its NamedSharding from
    ``parallel.mesh.bagel_param_specs`` — TP-sharded leaves land directly as
    shards, so no device ever holds the full tensor (the TPU replacement for
    accelerate's ``infer_auto_device_map`` + ``load_checkpoint_and_dispatch``,
    interactive_vqa_inferencer.py:163-189). Without a mesh: default placement
    on the single device.
    """
    import jax

    if mesh is None:
        return jax.tree.map(jnp.asarray, params)

    from jax.sharding import NamedSharding

    from unimedvl_tpu.parallel.mesh import bagel_param_specs

    specs = bagel_param_specs(cfg, params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def load_bagel_checkpoint(
    ckpt_dir: str,
    cfg: Optional[BagelConfig] = None,
    dtype=jnp.bfloat16,
    prefer_ema: bool = True,
    mesh=None,
    base_dir: Optional[str] = None,
    quantize_bits: Optional[int] = None,
    act_quant: bool = False,
    quantize_group: int = 0,
) -> Dict:
    """Read configs + weights from a released checkpoint dir. The VAE
    (ae.safetensors) is loaded separately and merged under params['vae'].

    Tensors are staged in host RAM during conversion and committed per-leaf
    at the end — pass ``mesh`` to shard the model across devices at load time
    (required for checkpoints larger than one device's memory, e.g. the 14B
    bf16 release on 16 GB v5e chips).

    ``quantize_bits``: 8 or 4 — quantize the LLM linears DURING host staging
    (``quant.quantize_llm_params(via_host=True)``), so the bf16 tree never
    touches the device: quantizing *after* a single-chip load needs the full
    28 GB bf16 tree resident first and OOMs a 16 GB v5e. This is the
    single-chip load path for full-size checkpoints (the multi-chip
    alternative is ``mesh``); ``act_quant`` marks the leaves for s8xs8
    MXU matmuls (serving config); ``quantize_group`` enables group-wise
    w4 scales (quantize_bits=4 only; 512 rides the Pallas kernel free).

    ``base_dir``: optional base checkpoint merged under the finetune in
    ``ckpt_dir`` — finetune keys win (reference eval/vlm/utils.py:281-317)."""
    if cfg is None:
        cfg = BagelConfig.from_checkpoint_dir(ckpt_dir)
    reader = SafetensorsReader(ckpt_dir, prefer_ema=prefer_ema)
    if base_dir is not None:
        reader = MergedReader(
            SafetensorsReader(base_dir, prefer_ema=prefer_ema), reader
        )
    params = convert_bagel(reader, cfg, dtype)
    if quantize_bits is not None:
        from unimedvl_tpu.quant import quantize_llm_params

        params["llm"] = quantize_llm_params(
            params["llm"], via_host=True, act_quant=act_quant,
            bits=quantize_bits, group_size=quantize_group,
        )
    ae_path = os.path.join(ckpt_dir, "ae.safetensors")
    if cfg.visual_gen and os.path.exists(ae_path):
        from unimedvl_tpu.weights.vae_loader import load_ae

        params["vae"], _ = load_ae(ae_path, cfg.vae, dtype)
    return place_params(params, cfg, mesh)
