#!/usr/bin/env python
"""Write a synthetic RELEASED-FORMAT checkpoint at the full 14B geometry.

Purpose: rehearse the real-checkpoint path (`scripts/parity_gate.py`) at true
scale — sharded safetensors index, host-staged conversion, int8 quantization
via host, per-leaf device placement, memory budget — without the released
weights (none on disk). Values are cheap uniform noise: numerics are NOT
meaningful, only shapes/dtypes/keys/layout and the load/placement path.

Format mirrors the released UniMedVL checkpoints the loader supports
(reference load flow: interactive_vqa_inferencer.py:127-213 — llm_config.json
/ vit_config.json read, ema.safetensors state dict with the duplicated
`*_moe_gen` MoT expert weights, ae.safetensors FLUX VAE):
  OUT_DIR/llm_config.json           Qwen2.5-7B dims (vocab 152064, 3584h,
                                    18944i, 28L, 28H/4Hk)
  OUT_DIR/vit_config.json           SigLIP-SO400M/14@980 (27 layers shipped;
                                    the reader drops the last one)
  OUT_DIR/ema.safetensors.index.json + ema-000NN.safetensors shards (~4 GB)
  OUT_DIR/ae.safetensors            full FLUX VAE (from models/vae.py init)
  OUT_DIR/tokenizer.json            minimal byte-level BPE (AutoTokenizer-
                                    loadable; NOT the Qwen2 vocab)

Usage: python scripts/make_synthetic_ckpt.py OUT_DIR [--shard-gb 4] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# full released geometry (SURVEY.md §2.2)
LLM_JSON = {
    "vocab_size": 152064,
    "hidden_size": 3584,
    "intermediate_size": 18944,
    "num_hidden_layers": 28,
    "num_attention_heads": 28,
    "num_key_value_heads": 4,
    "rope_theta": 1000000.0,
    "rms_norm_eps": 1e-06,
    "tie_word_embeddings": False,
}
VIT_JSON = {
    "hidden_size": 1152,
    "intermediate_size": 4304,
    "num_hidden_layers": 27,  # reader drops the last layer -> 26 used
    "num_attention_heads": 16,
    "image_size": 980,
    "patch_size": 14,
    "layer_norm_eps": 1e-06,
}


def iter_llm_keys(j=LLM_JSON):
    C, I, V = j["hidden_size"], j["intermediate_size"], j["vocab_size"]
    H, Hk = j["num_attention_heads"], j["num_key_value_heads"]
    D = C // H
    yield "language_model.model.embed_tokens.weight", (V, C)
    for i in range(j["num_hidden_layers"]):
        p = f"language_model.model.layers.{i}."
        for suffix, wshape, bias in [
            ("self_attn.q_proj", (H * D, C), True),
            ("self_attn.k_proj", (Hk * D, C), True),
            ("self_attn.v_proj", (Hk * D, C), True),
            ("self_attn.o_proj", (C, H * D), False),
            ("self_attn.q_proj_moe_gen", (H * D, C), True),
            ("self_attn.k_proj_moe_gen", (Hk * D, C), True),
            ("self_attn.v_proj_moe_gen", (Hk * D, C), True),
            ("self_attn.o_proj_moe_gen", (C, H * D), False),
            ("mlp.gate_proj", (I, C), False),
            ("mlp.up_proj", (I, C), False),
            ("mlp.down_proj", (C, I), False),
            ("mlp_moe_gen.gate_proj", (I, C), False),
            ("mlp_moe_gen.up_proj", (I, C), False),
            ("mlp_moe_gen.down_proj", (C, I), False),
        ]:
            yield p + suffix + ".weight", wshape
            if bias:
                yield p + suffix + ".bias", (wshape[0],)
        for norm in ["self_attn.q_norm", "self_attn.k_norm",
                     "self_attn.q_norm_moe_gen", "self_attn.k_norm_moe_gen"]:
            yield p + norm + ".weight", (D,)
        for norm in ["input_layernorm", "input_layernorm_moe_gen",
                     "post_attention_layernorm",
                     "post_attention_layernorm_moe_gen"]:
            yield p + norm + ".weight", (C,)
    yield "language_model.model.norm.weight", (C,)
    yield "language_model.model.norm_moe_gen.weight", (C,)
    yield "language_model.lm_head.weight", (V, C)


def iter_vit_keys(j=VIT_JSON):
    vc, vi, p = j["hidden_size"], j["intermediate_size"], j["patch_size"]
    side = j["image_size"] // p
    yield "vit_model.vision_model.embeddings.patch_embedding.weight", (vc, 3, p, p)
    yield "vit_model.vision_model.embeddings.patch_embedding.bias", (vc,)
    yield "vit_model.vision_model.embeddings.position_embedding.weight", (side * side, vc)
    for i in range(j["num_hidden_layers"]):
        pre = f"vit_model.vision_model.encoder.layers.{i}."
        for s, shape in [
            ("self_attn.q_proj", (vc, vc)), ("self_attn.k_proj", (vc, vc)),
            ("self_attn.v_proj", (vc, vc)), ("self_attn.out_proj", (vc, vc)),
            ("mlp.fc1", (vi, vc)), ("mlp.fc2", (vc, vi)),
        ]:
            yield pre + s + ".weight", shape
            yield pre + s + ".bias", (shape[0],)
        for s in ["layer_norm1", "layer_norm2"]:
            yield pre + s + ".weight", (vc,)
            yield pre + s + ".bias", (vc,)
    yield "vit_model.vision_model.post_layernorm.weight", (vc,)
    yield "vit_model.vision_model.post_layernorm.bias", (vc,)


def iter_aux_keys(llm=LLM_JSON, vit=VIT_JSON,
                  vit_max_patch=70, max_latent=64, patch_latent_dim=64):
    C, vc = llm["hidden_size"], vit["hidden_size"]
    yield "connector.fc1.weight", (C, vc)
    yield "connector.fc1.bias", (C,)
    yield "connector.fc2.weight", (C, C)
    yield "connector.fc2.bias", (C,)
    yield "vit_pos_embed.pos_embed", (vit_max_patch ** 2, C)
    yield "vae2llm.weight", (C, patch_latent_dim)
    yield "vae2llm.bias", (C,)
    yield "llm2vae.weight", (patch_latent_dim, C)
    yield "llm2vae.bias", (patch_latent_dim,)
    yield "time_embedder.mlp.0.weight", (C, 256)
    yield "time_embedder.mlp.0.bias", (C,)
    yield "time_embedder.mlp.2.weight", (C, C)
    yield "time_embedder.mlp.2.bias", (C,)
    yield "latent_pos_embed.pos_embed", (max_latent ** 2, C)


def write_vae(out_dir: str):
    """Full FLUX VAE weights from the jax init, in torch-name layout."""
    import jax

    from unimedvl_tpu.config import VAEConfig
    from unimedvl_tpu.models import vae as jvae
    from safetensors.numpy import save_file

    params = jvae.init_params(jax.random.PRNGKey(5), VAEConfig())

    def to_sd(prefix, p, out):
        for name, leaf in p.items():
            key = f"{prefix}.{name}" if prefix else name
            if isinstance(leaf, dict):
                if "kernel" in leaf:
                    out[key + ".weight"] = np.asarray(
                        leaf["kernel"]).transpose(3, 2, 0, 1)
                    out[key + ".bias"] = np.asarray(leaf["bias"])
                elif "scale" in leaf:
                    out[key + ".weight"] = np.asarray(leaf["scale"])
                    out[key + ".bias"] = np.asarray(leaf["bias"])
                else:
                    to_sd(key, leaf, out)
            elif isinstance(leaf, list):
                for i, item in enumerate(leaf):
                    to_sd(f"{key}.{i}", item, out)
        return out

    sd = {}
    to_sd("encoder", params["encoder"], sd)
    to_sd("decoder", params["decoder"], sd)
    save_file({k: v.astype(np.float32) for k, v in sd.items()},
              os.path.join(out_dir, "ae.safetensors"))


def write_tokenizer(out_dir: str):
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders

    vocab = {chr(i + 33): i for i in range(80)}
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[], unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    tok.save(os.path.join(out_dir, "tokenizer.json"))
    with open(os.path.join(out_dir, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast"}, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--shard-gb", type=float, default=4.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    # VAE init runs through jax — stay OFF the TPU (the tunnel allows one
    # attached process; benchmark queues may own it while this writes).
    import jax

    jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "llm_config.json"), "w") as f:
        json.dump(LLM_JSON, f, indent=1)
    with open(os.path.join(args.out_dir, "vit_config.json"), "w") as f:
        json.dump(VIT_JSON, f, indent=1)
    write_vae(args.out_dir)
    write_tokenizer(args.out_dir)

    from safetensors.numpy import save_file

    rng = np.random.Generator(np.random.SFC64(args.seed))
    limit = int(args.shard_gb * (1 << 30))
    shard, shard_bytes, shard_idx = {}, 0, 0
    weight_map = {}
    files = []

    def flush():
        nonlocal shard, shard_bytes, shard_idx
        if not shard:
            return
        fname = f"ema-{shard_idx:05d}.safetensors"
        save_file(shard, os.path.join(args.out_dir, fname))
        files.append(fname)
        for k in shard:
            weight_map[k] = fname
        print(f"  {fname}: {len(shard)} tensors, "
              f"{shard_bytes / (1 << 30):.2f} GiB", flush=True)
        shard, shard_bytes, shard_idx = {}, 0, shard_idx + 1

    total = 0
    for it in (iter_llm_keys(), iter_vit_keys(), iter_aux_keys()):
        for key, shape in it:
            n = int(np.prod(shape))
            # cheap uniform noise; f16 on disk (framework="np" readable)
            arr = (rng.random(n, dtype=np.float32).reshape(shape) - 0.5)
            arr = (arr * 0.05).astype(np.float16)
            if "norm" in key and key.endswith(".weight") and len(shape) == 1:
                arr = np.ones(shape, np.float16)  # sane norm gains
            shard[key] = arr
            shard_bytes += arr.nbytes
            total += n
            if shard_bytes >= limit:
                flush()
    flush()

    with open(os.path.join(args.out_dir,
                           "ema.safetensors.index.json"), "w") as f:
        json.dump({"metadata": {"total_parameters": total},
                   "weight_map": weight_map}, f)
    print(f"wrote {total / 1e9:.2f}B params in {len(files)} shards "
          f"-> {args.out_dir}")


if __name__ == "__main__":
    main()
