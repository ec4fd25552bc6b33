#!/usr/bin/env python
"""Multi-chip denoise time model: measure per-chip COMPUTE shares on the real
single chip for TP degrees 1/2/4 (each chip of a TP group holds heads/TP and
ffn/TP of both MoT experts — running that narrowed model measures exactly the
per-chip matmul work, no ICI required), at 1 and 3 CFG streams.

Combined with an analytic ring-allreduce ICI cost (2 reductions per layer:
o_proj + down_proj outputs, [S, T, C] bf16), this yields projected v5e-8
per-step and per-image times for the candidate layouts in
docs/MULTICHIP_DENOISE.md. Run on TPU via background bash.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np

LAYERS = 10  # measurement slice (full 28L MoT bf16 exceeds one chip's HBM)


def measure(tp: int, streams: int, n_latent: int = 1024):
    import jax
    import jax.numpy as jnp

    from unimedvl_tpu.config import BagelConfig, LLMConfig
    from unimedvl_tpu.models import bagel, qwen2_mot as mot
    from unimedvl_tpu.models.qwen2_mot import ForwardSpec, KVCache

    llm = LLMConfig(
        vocab_size=1024,  # lm_head unused in denoise; keep tiny
        hidden_size=3584,
        intermediate_size=18944 // tp,
        num_hidden_layers=LAYERS,
        # 28 heads don't divide tp=8; a real TP8 layout places 4,4,4,4,3,3,3,3
        # heads — measure the MAX per-chip share (ceil), which bounds the step
        num_attention_heads=-(-28 // tp),
        num_key_value_heads=max(4 // tp, 1),
        # TP shards HEADS, not head_dim: each chip runs heads/TP at the full
        # model's 128 head_dim (q_proj [3584, 3584/tp] etc.). Without the
        # override head_dim would balloon to hidden//heads = 128*tp and the
        # attention projections would not be narrowed at all.
        head_dim_override=128,
        layer_module="Qwen2MoTDecoderLayer",
        qk_norm=True,
    )
    params = {"llm": mot.init_params(jax.random.PRNGKey(0), llm, jnp.bfloat16)}
    T = n_latent + 2
    cap = 512
    cache = KVCache.create(LAYERS, streams, cap, llm.num_key_value_heads,
                           llm.head_dim, jnp.bfloat16)
    cache = KVCache(k=cache.k, v=cache.v,
                    lens=jnp.full((streams,), 300, jnp.int32))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((streams, T, 3584)), jnp.bfloat16)
    positions = jnp.full((streams, T), 301, jnp.int32)

    spec = ForwardSpec("gen", False, False)

    # params passed as an argument — closing them over jit captures GBs of
    # constants into the lowered program (slow compile, doubled HBM)
    def step_fn(p, x):
        def body(xc, _):
            h, _ = mot.forward(p, llm, xc, positions, cache, spec)
            return (xc + h * jnp.asarray(1e-6, xc.dtype)), None

        out, _ = jax.lax.scan(body, x, None, length=5)
        return out

    f = jax.jit(step_fn)
    p = params["llm"]
    np.asarray(f(p, x)[..., :1, :1])  # compile + fence
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(p, x)[..., :1, :1])
        ts.append(time.perf_counter() - t0)
    per_step = float(np.median(ts)) / 5
    return per_step


def main():
    import jax

    import unimedvl_tpu

    unimedvl_tpu.enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    out = {"layers_measured": LAYERS, "n_latent": 1024, "cases": {}}
    cases = [(tp, s, 1024) for tp in (1, 2, 4, 8) for s in (1, 3)]
    # SP (sequence-parallel over the latent tokens) per-chip shares: full/TP
    # weights with 1024/SP query tokens — measures the candidate hybrid
    # layouts directly instead of assuming perfect /N scaling:
    #   SP8 (int8 weight copies fit per chip), TP2 x SP4, TP4 x SP2
    cases += [(1, 3, 128), (1, 1, 128),
              (2, 3, 256), (2, 1, 256),
              (4, 3, 512), (4, 1, 512)]
    for tp, streams, n in cases:
        ms = measure(tp, streams, n_latent=n) * 1e3
        key = f"tp{tp}_s{streams}" if n == 1024 else f"tp{tp}_s{streams}_n{n}"
        out["cases"][key] = round(ms, 2)
        print(json.dumps({key: out["cases"][key]}))

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "DENOISE_TP.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("->", path)


if __name__ == "__main__":
    main()
