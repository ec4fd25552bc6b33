#!/usr/bin/env python
"""Text-to-image denoise benchmark (BASELINE config 4): full 50-step default
t2i loop (dual CFG, interval (0.4, 1.0), 512px = 1024 latent tokens) on a
single chip at a v5e-feasible MoT depth, extrapolated to the full 28-layer
model on a v5e-8 TP slice.

Not the driver headline (see ../bench.py); run manually:
    python benchmarks/denoise_bench.py [--layers 10] [--steps 50]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=10)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--latents", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import unimedvl_tpu

    unimedvl_tpu.enable_compilation_cache()
    from unimedvl_tpu.config import BagelConfig, LLMConfig, VAEConfig
    from unimedvl_tpu.models import bagel
    from unimedvl_tpu.models.qwen2_mot import KVCache

    layers = args.layers
    llm = LLMConfig(
        vocab_size=152064, hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=layers, num_attention_heads=28, num_key_value_heads=4,
        layer_module="Qwen2MoTDecoderLayer",
    )
    cfg = BagelConfig(llm=llm, vit=None, vae=VAEConfig(), visual_und=False,
                      latent_patch_size=2, max_latent_size=64)
    params = bagel.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16,
                               llm2vae_zero=False)
    del params["vae"]

    S, n = 3, args.latents
    caches = KVCache.create(layers, S, 128, 4, llm.head_dim, jnp.bfloat16)
    caches = KVCache(k=caches.k, v=caches.v, lens=jnp.asarray([64, 30, 40], jnp.int32))
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

    np.asarray(run(0))
    ts = []
    for rep in range(2):
        t0 = time.perf_counter()
        np.asarray(run(rep + 1))
        ts.append(time.perf_counter() - t0)
    total = min(ts)
    print(json.dumps({
        "metric": f"t2i 512px {args.steps}-step denoise ({layers}L MoT slice, 1 chip)",
        "value": round(total, 3),
        "unit": "s",
        "extrapolated_28L_v5e8_s": round(total * (28 / layers) / 8, 3),
    }))


if __name__ == "__main__":
    main()
