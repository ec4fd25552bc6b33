#!/usr/bin/env python
"""UNIFIED serving benchmark: text report-generation requests and t2i
image-generation requests through ONE ContinuousBatcher on one chip, at the
full 28L 14B MoT geometry in full-int8 serving mode.

The t2i requests denoise in ``gen_chunk``-step segments between decode
chunks (pipeline.GenImageJob), so text throughput degrades gracefully
instead of stalling for a whole 50-step loop. The reference runs these
workloads as separate one-at-a-time scripts.

Run on TPU via background bash:  python benchmarks/unified_serving_bench.py
Writes benchmarks/UNIFIED_SERVING_BENCH.json.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np

from serving_bench import ByteTokenizer  # noqa: E402  (same dir)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--images", type=int, default=2)
    ap.add_argument("--size", type=int, default=256,
                    help="t2i side length (256 -> 256 latent tokens)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--gen-chunk", type=int, default=5)
    ap.add_argument("--requests", type=int, default=96)
    ap.add_argument("--dynamic-windows", action="store_true",
                    help="gen_window_dynamic pipeline: ONE compiled denoise "
                         "program per (geometry, G, window) instead of "
                         "ceil(steps/gen_chunk) — cold-start lever for the "
                         "tunnel's minutes-per-compile costs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import unimedvl_tpu

    if not args.cpu:
        unimedvl_tpu.enable_compilation_cache()
    from denoise_full_bench import host_int8_mot_llm_params  # noqa: E402
    from unimedvl_tpu.config import BagelConfig, LLMConfig, VAEConfig
    from unimedvl_tpu.data.tokenizer import add_special_tokens
    from unimedvl_tpu.inference import InterleaveInferencer
    from unimedvl_tpu.inference.serving import ContinuousBatcher, Request
    from unimedvl_tpu.models import vae as vae_mod
    from unimedvl_tpu.ops.sincos import get_2d_sincos_pos_embed

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        layers, hidden, inter, heads, kv = 28, 3584, 18944, 28, 4
        # 128 slots = the text-only SERVING_BENCH config, so the "text tax"
        # of in-flight images is measured against the same resident pool
        # (the round-4 record compared a 48-slot unified run against the
        # 128-slot text-only number — apples to oranges)
        num_slots = 128
        n_requests, n_images, size = args.requests, args.images, args.size
    else:  # CPU smoke
        layers, hidden, inter, heads, kv = 2, 256, 512, 8, 4
        num_slots, n_requests, n_images, size = 4, 6, 1, 32
        args.steps = 5

    llm = LLMConfig(
        vocab_size=152064 if on_tpu else 1024,
        hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv, layer_module="Qwen2MoTDecoderLayer",
        qk_norm=True,
    )
    # smoke VAE: channels must stay divisible by the GroupNorm's 32 groups
    vae_cfg = VAEConfig() if on_tpu else VAEConfig(
        ch=32, ch_mult=(1, 2), z_channels=16, downsample=2
    )
    cfg = BagelConfig(llm=llm, vit=None, vae=vae_cfg, visual_und=False,
                      latent_patch_size=2,
                      max_latent_size=64 if on_tpu else 16)
    rng = np.random.default_rng(0)
    C = hidden

    def lin(cin, cout):
        import ml_dtypes

        return {
            "kernel": jnp.asarray(
                (rng.standard_normal((cin, cout)) * 0.02).astype(ml_dtypes.bfloat16)
            ),
            "bias": jnp.zeros((cout,), jnp.bfloat16),
        }

    pld = cfg.patch_latent_dim
    params = {
        "llm": host_int8_mot_llm_params(llm, rng, act=True) if on_tpu else None,
        "vae": vae_mod.init_params(jax.random.PRNGKey(2), vae_cfg,
                                   dtype=jnp.bfloat16),
        "vae2llm": lin(pld, C),
        "llm2vae": lin(C, pld),
        "time_embedder": {"fc1": lin(256, C), "fc2": lin(C, C)},
        "latent_pos_embed": jnp.asarray(
            get_2d_sincos_pos_embed(C, cfg.max_latent_size), jnp.bfloat16
        ),
    }
    if not on_tpu:
        from unimedvl_tpu.models import qwen2_mot as mot

        params["llm"] = mot.init_params(jax.random.PRNGKey(0), llm)
    tok, new_ids, _ = add_special_tokens(ByteTokenizer())

    pipe = InterleaveInferencer(params, cfg, tok, new_ids, seed=0,
                                gen_window_dynamic=args.dynamic_windows)
    engine = ContinuousBatcher(
        params, cfg, tok, new_ids, num_slots=num_slots, capacity=256,
        chunk=16, kv_quantized=on_tpu, pipeline=pipe,
        gen_chunk=args.gen_chunk,
    )

    t_warm = time.perf_counter()
    # warm-up: both prompt buckets, decode chunk, one full tiny t2i job AND
    # a grouped (G=2) t2i pair — the grouped denoise programs
    # (bagel.generate_latents_group) are distinct from the single-job ones
    # and must not compile inside the timed window on the tunnel
    for p in ("w" * 10, "w" * 40):
        engine.submit(Request(prompt=p, max_new_tokens=4))
        engine.run()
    engine.submit(Request(prompt="warm", image_size=(size, size),
                          gen_params=dict(num_timesteps=args.steps)))
    engine.run()
    if args.images > 1:
        for g in range(2):
            engine.submit(Request(prompt=f"warm {g}", image_size=(size, size),
                                  gen_params=dict(num_timesteps=args.steps)))
        engine.run()

    warmup_s = time.perf_counter() - t_warm

    prompts, max_new = [], []
    for i in range(n_requests):
        plen = int(rng.integers(8, 24)) if i % 2 == 0 else int(rng.integers(36, 56))
        prompts.append("x" * plen)
        max_new.append(int(rng.integers(16, 96)))

    rids_text = []
    rids_img = []
    for j, (p, m) in enumerate(zip(prompts, max_new)):
        rids_text.append(engine.submit(Request(prompt=p, max_new_tokens=m)))
        # spread the image submissions through the text batch
        if j % max(1, n_requests // max(n_images, 1)) == 0 and len(rids_img) < n_images:
            rids_img.append(engine.submit(Request(
                prompt=f"a scan {j}", image_size=(size, size),
                gen_params=dict(num_timesteps=args.steps),
            )))
    t0 = time.perf_counter()
    results = engine.run()
    wall = time.perf_counter() - t0

    n_out_tokens = sum(len(tok.encode(results[r])) for r in rids_text)
    ok_images = sum(1 for r in rids_img if r in results)
    out = {
        "metric": (
            f"unified serving ({layers}L full-int8 MoT, {num_slots} slots, "
            f"{n_requests} text + {n_images}x{size}px t2i, "
            f"gen_chunk={args.gen_chunk}"
            f"{', dynamic-windows' if args.dynamic_windows else ''}, "
            f"{jax.default_backend()})"
        ),
        "warmup_s": round(warmup_s, 1),
        "wall_s": round(wall, 3),
        "text_requests": n_requests,
        "output_tokens": n_out_tokens,
        "output_tok_per_s": round(n_out_tokens / wall, 1),
        "images": ok_images,
        "images_per_s": round(ok_images / wall, 4),
        "errors": len(engine.errors),
        "phase_breakdown": {
            k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in engine.stats.items()
        },
    }
    print(json.dumps(out))
    if on_tpu:
        name = ("UNIFIED_SERVING_BENCH_DYNWIN.json" if args.dynamic_windows
                else "UNIFIED_SERVING_BENCH.json")
        dst = os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
        with open(dst, "w") as f:
            json.dump(out, f, indent=1)
        print("->", dst)


if __name__ == "__main__":
    main()
