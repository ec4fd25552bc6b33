#!/usr/bin/env python
"""FULL-DEPTH t2i measurement on one chip: 28-layer MoT denoise (int8 serving
mode — bf16 28L MoT weights are ~26 GB and exceed the 16 GB v5e HBM; int8
both-expert weights are ~13 GB) + bf16 FLUX VAE decode.

Replaces the 10-layer extrapolation for the per-chip component of the
multi-chip denoise time model (docs/MULTICHIP_DENOISE.md). Reference
workload: /root/reference/codes/modeling/unimedvl/bagel.py:989-1211 —
50-step dual-CFG rectified-flow denoise at 512px (1024 latent tokens),
cfg_interval (0.4, 1.0), then VAE decode.

Run on TPU via background bash:
    python benchmarks/denoise_full_bench.py [--layers 28] [--steps 50]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def host_int8_mot_llm_params(llm, rng: np.random.Generator, fused: bool = True,
                             act: bool = False):
    """Host-built int8 MoT (both experts) params in quant.quantize_llm_params
    layout — a full-depth bf16 intermediate would not fit the chip.
    ``act=True`` marks the leaves for full-int8 matmuls (kernel_qa)."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    C, I = llm.hidden_size, llm.intermediate_size
    H, Hk, D = llm.num_attention_heads, llm.num_key_value_heads, llm.head_dim
    L, V = llm.num_hidden_layers, llm.vocab_size
    wkey = "kernel_qa" if act else "kernel_q"

    def q(cin, cout):
        return {
            wkey: rng.integers(-127, 127, (L, cin, cout)).astype(np.int8),
            "scale": np.full((L, cout), 0.01, np.float32),
        }

    def bias(cout):
        return np.zeros((L, cout), ml_dtypes.bfloat16)

    def norm(d):
        return {"scale": np.ones((L, d), ml_dtypes.bfloat16)}

    def mlp():
        if fused:
            return {"gate_up": q(C, 2 * I), "down": q(I, C)}
        return {"gate": q(C, I), "up": q(C, I), "down": q(I, C)}

    if fused:
        # quant.fuse_serving_projections layout: one qkv matmul per expert
        attn = {
            "qkv": {**q(C, (H + 2 * Hk) * D), "bias": bias((H + 2 * Hk) * D)},
            "o": q(H * D, C),
            "q_norm": norm(D),
            "k_norm": norm(D),
            "qkv_gen": {**q(C, (H + 2 * Hk) * D), "bias": bias((H + 2 * Hk) * D)},
            "o_gen": q(H * D, C),
            "q_norm_gen": norm(D),
            "k_norm_gen": norm(D),
        }
    else:
        attn = {
            "q": {**q(C, H * D), "bias": bias(H * D)},
            "k": {**q(C, Hk * D), "bias": bias(Hk * D)},
            "v": {**q(C, Hk * D), "bias": bias(Hk * D)},
            "o": q(H * D, C),
            "q_norm": norm(D),
            "k_norm": norm(D),
            "q_gen": {**q(C, H * D), "bias": bias(H * D)},
            "k_gen": {**q(C, Hk * D), "bias": bias(Hk * D)},
            "v_gen": {**q(C, Hk * D), "bias": bias(Hk * D)},
            "o_gen": q(H * D, C),
            "q_norm_gen": norm(D),
            "k_norm_gen": norm(D),
        }
    layers = {
        "attn": attn,
        "input_layernorm": norm(C),
        "input_layernorm_moe_gen": norm(C),
        "post_attention_layernorm": norm(C),
        "post_attention_layernorm_moe_gen": norm(C),
        "mlp": mlp(),
        "mlp_moe_gen": mlp(),
    }
    params = {
        "embed_tokens": (rng.standard_normal((V, C)) * 0.02).astype(ml_dtypes.bfloat16),
        "layers": layers,
        "norm": {"scale": np.ones((C,), ml_dtypes.bfloat16)},
        "norm_moe_gen": {"scale": np.ones((C,), ml_dtypes.bfloat16)},
        "lm_head": {
            wkey: rng.integers(-127, 127, (C, V)).astype(np.int8),
            "scale": np.full((V,), 0.01, np.float32),
        },
    }
    return jax.tree.map(jnp.asarray, params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--latents", type=int, default=1024)  # 512px @ ld=16
    ap.add_argument("--skip-vae", action="store_true")
    ap.add_argument("--act-quant", action="store_true",
                    help="full-int8 matmuls (s8xs8 MXU, 2x bf16 peak) — the "
                         "MXU-bound denoise lever; weight-only int8 stays "
                         "the parity-default")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import unimedvl_tpu

    unimedvl_tpu.enable_compilation_cache()
    from unimedvl_tpu.config import BagelConfig, LLMConfig, VAEConfig
    from unimedvl_tpu.models import bagel, qwen2_mot as mot, vae as vae_mod
    from unimedvl_tpu.models.qwen2_mot import KVCache
    from unimedvl_tpu.ops.sincos import get_2d_sincos_pos_embed

    layers = args.layers
    llm = LLMConfig(
        vocab_size=1024,  # lm_head unused in denoise
        hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=layers, num_attention_heads=28, num_key_value_heads=4,
        layer_module="Qwen2MoTDecoderLayer", qk_norm=True,
    )
    cfg = BagelConfig(llm=llm, vit=None, vae=VAEConfig(), visual_und=False,
                      latent_patch_size=2, max_latent_size=64)
    rng = np.random.default_rng(0)
    C = llm.hidden_size

    def lin(cin, cout, dtype):
        import ml_dtypes

        return {
            "kernel": (rng.standard_normal((cin, cout)) * 0.02).astype(ml_dtypes.bfloat16),
            "bias": np.zeros((cout,), ml_dtypes.bfloat16),
        }

    params = {
        "llm": host_int8_mot_llm_params(llm, rng, act=args.act_quant),
        "vae2llm": jax.tree.map(jnp.asarray, lin(64, C, None)),
        "llm2vae": jax.tree.map(jnp.asarray, lin(C, 64, None)),
        "time_embedder": {
            "fc1": jax.tree.map(jnp.asarray, lin(256, C, None)),
            "fc2": jax.tree.map(jnp.asarray, lin(C, C, None)),
        },
        "latent_pos_embed": jnp.asarray(
            get_2d_sincos_pos_embed(C, cfg.max_latent_size), jnp.bfloat16
        ),
    }

    S, n = 3, args.latents
    caches = KVCache.create(layers, S, 128, 4, llm.head_dim, jnp.bfloat16)
    caches = KVCache(k=caches.k, v=caches.v,
                     lens=jnp.asarray([64, 30, 40], jnp.int32))
    positions = jnp.asarray([5, 3, 4], jnp.int32)
    pos_ids = jnp.asarray(np.arange(n) % 4096)
    noise = jax.random.normal(jax.random.PRNGKey(1), (n, 64), jnp.float32)
    se = jnp.asarray([7, 8], jnp.int32)

    def run(seed):
        return bagel.generate_latents(
            params, cfg, caches, positions, pos_ids, noise + seed * 0.001, se,
            num_timesteps=args.steps, timestep_shift=3.0,
            cfg_text_scale=4.0, cfg_img_scale=1.5, cfg_interval=(0.4, 1.0),
            cfg_renorm_type="global", use_text_cfg=True, use_img_cfg=True,
        )

    lat = run(0)
    np.asarray(lat)  # compile + fence
    ts = []
    for rep in range(2):
        t0 = time.perf_counter()
        np.asarray(run(rep + 1))
        ts.append(time.perf_counter() - t0)
    denoise_s = min(ts)

    mode = "full-int8" if args.act_quant else "int8"
    out = {
        "metric": f"t2i 512px {args.steps}-step denoise (FULL {layers}L {mode} MoT, 1 chip)",
        "value": round(denoise_s, 3),
        "unit": "s",
        "denoise_per_step_ms": round(denoise_s / args.steps * 1e3, 2),
        "fused_projections": True,
        # k island runs in XLA (in-kernel fusion measured slower,
        # KERNEL_THRESHOLD.json fused_k_sweep)
        "fused_k_island": False,
    }

    if not args.skip_vae:
        params_vae = {"vae": vae_mod.init_params(
            jax.random.PRNGKey(2), cfg.vae, jnp.bfloat16)}
        h = w = int(np.sqrt(n))

        def dec(z):
            return bagel.decode_latent_to_image(params_vae, cfg, z, h, w)

        np.asarray(dec(lat))
        t0 = time.perf_counter()
        np.asarray(dec(lat))
        vae_s = time.perf_counter() - t0
        out["vae_decode_512px_s"] = round(vae_s, 3)
        out["total_image_s"] = round(denoise_s + vae_s, 3)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "DENOISE_FULL_ACT.json" if args.act_quant else "DENOISE_FULL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print("->", path)


if __name__ == "__main__":
    main()
