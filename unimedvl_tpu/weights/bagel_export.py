"""Checkpoint exporter: unimedvl_tpu parameter pytrees -> released-format
UniMedVL safetensors (torch state-dict names).

The exact inverse of :mod:`weights.bagel_loader` / :mod:`weights.vae_loader`,
so a trained / finetuned model round-trips through the same tooling the
released checkpoints use (reference layout:
interactive_vqa_inferencer.py:127-213 — ``llm_config.json`` /
``vit_config.json``, ``ema.safetensors`` (optionally sharded with an
``*.index.json``), ``ae.safetensors`` for the FLUX VAE):

    params = load_bagel_checkpoint(src_dir, mesh=mesh)
    ... finetune (full, FSDP, or LoRA) ...
    export_bagel_checkpoint(dst_dir, params, cfg)      # merges LoRA itself
    reloaded = load_bagel_checkpoint(dst_dir)          # same tree

Name-map inversions (see bagel_loader for the forward direction + reference
line cites):
  * Linear ``kernel [in, out]`` -> ``.weight [out, in]`` (transpose).
  * RMSNorm/LayerNorm ``scale`` -> ``.weight`` (+ ``bias`` for LN).
  * Stacked-layer leaves ``[L, ...]`` -> per-layer ``layers.{i}.*`` keys.
  * ViT patch embedding linear ``[p*p*3, D]`` -> conv ``[D, 3, p, p]``
    (inverse of siglip_navit.py:167-182 convert_conv2d_to_linear).
  * The released ViT ships one layer more than is used
    (interactive_vqa_inferencer.py:213 does ``num_hidden_layers -= 1``);
    the exporter appends a zero layer and writes ``num_hidden_layers + 1``
    into ``vit_config.json`` so reload applies the same drop.
  * VAE convs ``HWIO`` -> torch ``OIHW``; written as ``ae.safetensors``
    in fp32 (the released VAE dtype, autoencoder.py:337-360).

The tokenizer is not model state: copy ``tokenizer.json`` /
``tokenizer_config.json`` from the source checkpoint (``tokenizer_src=``
does this for you).

Tensors are gathered to host one at a time (``jax.device_get`` pulls sharded
leaves off the mesh), so a 14B export needs shard-sized host RAM bursts, not
the whole 28 GB resident.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
from typing import Dict, Iterator, Optional, Tuple

import jax
import numpy as np

from unimedvl_tpu.config import BagelConfig, LLMConfig, ViTConfig

Entry = Tuple[str, np.ndarray]


def _host(x, dtype) -> np.ndarray:
    """Gather one leaf to host RAM and cast (ml_dtypes covers bfloat16)."""
    return np.asarray(jax.device_get(x)).astype(np.dtype(dtype), copy=False)


def _wT(kernel, dtype) -> np.ndarray:
    """kernel [in, out] -> torch Linear .weight [out, in]."""
    return np.ascontiguousarray(_host(kernel, dtype).T)


def _is_quantized(tree) -> bool:
    found = False

    def walk(t):
        nonlocal found
        if isinstance(t, dict):
            if any(k in t for k in
                   ("kernel_q", "kernel_qa", "kernel_p4", "kernel_p4a")):
                found = True
            for v in t.values():
                walk(v)
        elif isinstance(t, (list, tuple)):
            for v in t:
                walk(v)

    walk(tree)
    return found


def _layer_slice(stacked: Dict, i: int) -> Dict:
    """One layer's sub-tree out of the [L, ...] stacked-leaf layout."""
    return jax.tree.map(lambda x: x[i], stacked)


def iter_llm_state_dict(
    llm: Dict, cfg: LLMConfig, dtype, prefix: str = "language_model."
) -> Iterator[Entry]:
    """Inverse of bagel_loader.convert_llm (names: qwen2_navit.py:389-407,
    713-731, 1025-1043, 1179-1187)."""
    yield prefix + "model.embed_tokens.weight", _host(llm["embed_tokens"], dtype)
    for i in range(cfg.num_hidden_layers):
        lp = f"{prefix}model.layers.{i}."
        layer = _layer_slice(llm["layers"], i)
        attn = layer["attn"]

        def proj(sd_name: str, p: Dict, bias: bool):
            out = [(lp + sd_name + ".weight", _wT(p["kernel"], dtype))]
            if bias:
                out.append((lp + sd_name + ".bias", _host(p["bias"], dtype)))
            return out

        pairs = [("self_attn.q_proj", attn["q"], True),
                 ("self_attn.k_proj", attn["k"], True),
                 ("self_attn.v_proj", attn["v"], True),
                 ("self_attn.o_proj", attn["o"], False)]
        if cfg.mot_attention:
            pairs += [("self_attn.q_proj_moe_gen", attn["q_gen"], True),
                      ("self_attn.k_proj_moe_gen", attn["k_gen"], True),
                      ("self_attn.v_proj_moe_gen", attn["v_gen"], True),
                      ("self_attn.o_proj_moe_gen", attn["o_gen"], False)]
        for name, p, bias in pairs:
            yield from proj(name, p, bias)
        if cfg.qk_norm:
            yield lp + "self_attn.q_norm.weight", _host(attn["q_norm"]["scale"], dtype)
            yield lp + "self_attn.k_norm.weight", _host(attn["k_norm"]["scale"], dtype)
            if cfg.mot_attention:
                yield (lp + "self_attn.q_norm_moe_gen.weight",
                       _host(attn["q_norm_gen"]["scale"], dtype))
                yield (lp + "self_attn.k_norm_moe_gen.weight",
                       _host(attn["k_norm_gen"]["scale"], dtype))
        yield (lp + "input_layernorm.weight",
               _host(layer["input_layernorm"]["scale"], dtype))
        yield (lp + "post_attention_layernorm.weight",
               _host(layer["post_attention_layernorm"]["scale"], dtype))
        if cfg.mot_attention:
            yield (lp + "input_layernorm_moe_gen.weight",
                   _host(layer["input_layernorm_moe_gen"]["scale"], dtype))
            yield (lp + "post_attention_layernorm_moe_gen.weight",
                   _host(layer["post_attention_layernorm_moe_gen"]["scale"], dtype))
        for mlp_name, mlp in [("mlp", layer["mlp"])] + (
            [("mlp_moe_gen", layer["mlp_moe_gen"])] if cfg.use_moe else []
        ):
            for proj_name in ["gate", "up", "down"]:
                yield (f"{lp}{mlp_name}.{proj_name}_proj.weight",
                       _wT(mlp[proj_name]["kernel"], dtype))
    yield prefix + "model.norm.weight", _host(llm["norm"]["scale"], dtype)
    if cfg.use_moe:
        yield (prefix + "model.norm_moe_gen.weight",
               _host(llm["norm_moe_gen"]["scale"], dtype))
    yield prefix + "lm_head.weight", _wT(llm["lm_head"], dtype)


def iter_vit_state_dict(
    vit: Dict, cfg: ViTConfig, dtype, prefix: str = "vit_model.vision_model."
) -> Iterator[Entry]:
    """Inverse of bagel_loader.convert_vit. Appends one zero layer at index
    ``cfg.num_hidden_layers`` to match the released layout (the loader drops
    it again)."""
    # linear [p*p*3, D] -> conv [D, 3, p, p] (inverse of siglip_navit.py:176-179)
    w = _host(vit["patch_embedding"]["kernel"], dtype)  # [p*p*3, D]
    p, D = cfg.patch_size, w.shape[1]
    conv = np.ascontiguousarray(
        w.T.reshape(D, p, p, cfg.num_channels).transpose(0, 3, 1, 2)
    )
    yield prefix + "embeddings.patch_embedding.weight", conv
    yield (prefix + "embeddings.patch_embedding.bias",
           _host(vit["patch_embedding"]["bias"], dtype))
    if "position_embedding" in vit:
        yield (prefix + "embeddings.position_embedding.weight",
               _host(vit["position_embedding"], dtype))

    def layer_entries(i: int, layer: Dict) -> Iterator[Entry]:
        lp = f"{prefix}encoder.layers.{i}."
        for sd_name, ours in [("self_attn.q_proj", "q"), ("self_attn.k_proj", "k"),
                              ("self_attn.v_proj", "v"), ("self_attn.out_proj", "out")]:
            yield lp + sd_name + ".weight", _wT(layer["attn"][ours]["kernel"], dtype)
            yield lp + sd_name + ".bias", _host(layer["attn"][ours]["bias"], dtype)
        for ln in ["layer_norm1", "layer_norm2"]:
            yield lp + ln + ".weight", _host(layer[ln]["scale"], dtype)
            yield lp + ln + ".bias", _host(layer[ln]["bias"], dtype)
        for fc in ["fc1", "fc2"]:
            yield lp + "mlp." + fc + ".weight", _wT(layer["mlp"][fc]["kernel"], dtype)
            yield lp + "mlp." + fc + ".bias", _host(layer["mlp"][fc]["bias"], dtype)

    for i in range(cfg.num_hidden_layers):
        yield from layer_entries(i, _layer_slice(vit["layers"], i))
    # the unused trailing layer the released checkpoints ship
    zero_layer = jax.tree.map(np.zeros_like, _layer_slice(vit["layers"], 0))
    yield from layer_entries(cfg.num_hidden_layers, zero_layer)

    yield prefix + "post_layernorm.weight", _host(vit["post_layernorm"]["scale"], dtype)
    yield prefix + "post_layernorm.bias", _host(vit["post_layernorm"]["bias"], dtype)


def iter_bagel_state_dict(params: Dict, cfg: BagelConfig, dtype) -> Iterator[Entry]:
    """Every ema.safetensors entry (the VAE goes to ae.safetensors instead);
    inverse of bagel_loader.convert_bagel (aux names: bagel.py:114-143)."""
    yield from iter_llm_state_dict(params["llm"], cfg.llm, dtype)
    if cfg.visual_und and cfg.vit is not None and "vit" in params:
        yield from iter_vit_state_dict(params["vit"], cfg.vit, dtype)
        for fc in ["fc1", "fc2"]:
            yield "connector." + fc + ".weight", _wT(params["connector"][fc]["kernel"], dtype)
            yield "connector." + fc + ".bias", _host(params["connector"][fc]["bias"], dtype)
        yield "vit_pos_embed.pos_embed", _host(params["vit_pos_embed"], dtype)
    if cfg.visual_gen and "vae2llm" in params:
        for name in ["vae2llm", "llm2vae"]:
            yield name + ".weight", _wT(params[name]["kernel"], dtype)
            yield name + ".bias", _host(params[name]["bias"], dtype)
        for ours, theirs in [("fc1", "mlp.0"), ("fc2", "mlp.2")]:
            yield ("time_embedder." + theirs + ".weight",
                   _wT(params["time_embedder"][ours]["kernel"], dtype))
            yield ("time_embedder." + theirs + ".bias",
                   _host(params["time_embedder"][ours]["bias"], dtype))
        yield "latent_pos_embed.pos_embed", _host(params["latent_pos_embed"], dtype)


def vae_state_dict(vae: Dict, dtype=np.float32) -> Dict[str, np.ndarray]:
    """Inverse of vae_loader.convert_vae_state_dict: HWIO conv kernels ->
    torch OIHW, norm scale/bias -> weight/bias, list levels -> ``.{i}.``."""
    out: Dict[str, np.ndarray] = {}

    def walk(key: str, t):
        if isinstance(t, dict):
            if "kernel" in t:  # conv (VAE has no plain linears)
                out[key + ".weight"] = np.ascontiguousarray(
                    _host(t["kernel"], dtype).transpose(3, 2, 0, 1)
                )
                out[key + ".bias"] = _host(t["bias"], dtype)
            elif "scale" in t:  # GroupNorm
                out[key + ".weight"] = _host(t["scale"], dtype)
                out[key + ".bias"] = _host(t["bias"], dtype)
            else:
                for name, v in t.items():
                    walk(f"{key}.{name}" if key else name, v)
        elif isinstance(t, (list, tuple)):
            for i, v in enumerate(t):
                walk(f"{key}.{i}", v)

    walk("encoder", vae["encoder"])
    walk("decoder", vae["decoder"])
    return out


def _llm_config_json(cfg: LLMConfig) -> Dict:
    d = dataclasses.asdict(cfg)
    d.pop("head_dim_override", None)
    d.pop("remat", None)
    d.pop("freeze_und", None)
    return d


def _vit_config_json(cfg: ViTConfig) -> Dict:
    d = dataclasses.asdict(cfg)
    # from_json_file subtracts the dropped trailing layer back off.
    d["num_hidden_layers"] = cfg.num_hidden_layers + 1
    return d


def export_bagel_checkpoint(
    out_dir: str,
    params: Dict,
    cfg: BagelConfig,
    dtype=None,
    shard_gb: float = 4.0,
    name: str = "ema",
    tokenizer_src: Optional[str] = None,
) -> Dict[str, str]:
    """Write ``params`` as a released-format checkpoint dir.

    LoRA adapters are merged into the base weights first (training/lora.py);
    quantized (int8 ``kernel_q``) trees are rejected — export the bf16
    master you quantized from. Returns ``{written file name: kind}``.
    """
    import ml_dtypes
    from safetensors.numpy import save_file

    if dtype is None:
        dtype = ml_dtypes.bfloat16  # the released checkpoints' dtype

    from unimedvl_tpu.training.lora import has_lora, merge_lora

    if has_lora(params):
        params = merge_lora(params)
    if _is_quantized(params):
        raise ValueError(
            "params tree contains int8 'kernel_q' leaves; export the bf16 "
            "master tree (quantize again after reload)"
        )

    os.makedirs(out_dir, exist_ok=True)
    written: Dict[str, str] = {}

    with open(os.path.join(out_dir, "llm_config.json"), "w") as f:
        json.dump(_llm_config_json(cfg.llm), f, indent=1)
    written["llm_config.json"] = "config"
    if cfg.visual_und and cfg.vit is not None and "vit" in params:
        with open(os.path.join(out_dir, "vit_config.json"), "w") as f:
            json.dump(_vit_config_json(cfg.vit), f, indent=1)
        written["vit_config.json"] = "config"

    # --- sharded model/ema safetensors -------------------------------------
    limit = int(shard_gb * (1 << 30))
    shards: list = []
    shard: Dict[str, np.ndarray] = {}
    shard_bytes = 0
    for key, arr in iter_bagel_state_dict(params, cfg, dtype):
        if shard_bytes + arr.nbytes > limit and shard:
            shards.append(shard)
            shard, shard_bytes = {}, 0
        shard[key] = arr
        shard_bytes += arr.nbytes
    if shard:
        shards.append(shard)

    if len(shards) == 1:
        fname = f"{name}.safetensors"
        save_file(shards[0], os.path.join(out_dir, fname))
        written[fname] = "weights"
    else:
        weight_map: Dict[str, str] = {}
        for i, s in enumerate(shards):
            fname = f"{name}-{i:05d}-of-{len(shards):05d}.safetensors"
            save_file(s, os.path.join(out_dir, fname))
            written[fname] = "weights"
            for k in s:
                weight_map[k] = fname
        # the loader probes model./ema.safetensors.index.json by fixed name
        idx_name = "model.safetensors.index.json"
        with open(os.path.join(out_dir, idx_name), "w") as f:
            json.dump({"metadata": {}, "weight_map": weight_map}, f)
        written[idx_name] = "index"

    if cfg.visual_gen and "vae" in params:
        save_file(vae_state_dict(params["vae"], np.float32),
                  os.path.join(out_dir, "ae.safetensors"))
        written["ae.safetensors"] = "weights"

    if tokenizer_src is not None:
        for fname in ["tokenizer.json", "tokenizer_config.json", "vocab.json",
                      "merges.txt", "special_tokens_map.json"]:
            src = os.path.join(tokenizer_src, fname)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(out_dir, fname))
                written[fname] = "tokenizer"
    return written
