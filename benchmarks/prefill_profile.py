#!/usr/bin/env python
"""Profile ONE large-batch prefill chunk (the TTFT unit of work): 28L
full-int8 geometry, a [chunk, 256]-token prefill_text into a fresh cache.

The bs256 warm TTFT is 8 serial chunks of [32, 256]; this traces one chunk
and breaks it into hlo categories so the gap vs the s8xs8 MXU floor
(2 * 8192 tok * 7.2e9 param / 394 TFLOP/s ~= 0.30 s per chunk) is named.

Run on TPU via background bash. Writes benchmarks/PREFILL_PROFILE.json.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import json
import time

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--prefill-len", type=int, default=256)
    ap.add_argument("--no-act", action="store_true")
    ap.add_argument("--out", default="PREFILL_PROFILE.json")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import unimedvl_tpu

    unimedvl_tpu.enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    import bench as bench_mod
    from trace_utils import hlo_category_breakdown, load_latest_trace
    from unimedvl_tpu.config import BagelConfig, LLMConfig
    from unimedvl_tpu.models import bagel
    from unimedvl_tpu.models.qwen2_mot import KVCache

    llm = LLMConfig(
        vocab_size=152064, hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=28, num_attention_heads=28, num_key_value_heads=4,
        layer_module="Qwen2DecoderLayer", qk_norm=True,
    )
    cfg = BagelConfig(llm=llm, vit=None, vae=None, visual_gen=False,
                      visual_und=False)
    rng = np.random.default_rng(0)
    params = {"llm": bench_mod._host_int8_llm_params(llm, rng, act=not a.no_act)}

    B, T = a.chunk, a.prefill_len
    capacity = ((T + 64 + 127) // 128) * 128
    ids = jnp.asarray(rng.integers(0, llm.vocab_size, (B, T)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    valid = jnp.ones((B, T), bool)

    def run():
        cache = KVCache.create(28, B, capacity, 4, llm.head_dim, jnp.bfloat16,
                               quantized=True)
        return bagel.prefill_text(params, cfg, cache, ids, pos, valid)

    np.asarray(run().lens)  # compile + fence
    t0 = time.perf_counter()
    np.asarray(run().lens)
    wall = time.perf_counter() - t0
    trace_dir = "/tmp/prefill_trace"
    with jax.profiler.trace(trace_dir):
        np.asarray(run().lens)

    trace = load_latest_trace(trace_dir)
    by_cat, top = hlo_category_breakdown(trace)
    tokens = B * T
    flops = 2 * tokens * 7.24e9
    out = {
        "chunk": B, "prefill_len": T, "act_quant": not a.no_act,
        "wall_s_per_chunk": round(wall, 4),
        "tokens_per_chunk": tokens,
        "int8_mxu_floor_s": round(flops / 394e12, 4),
        "bf16_mxu_floor_s": round(flops / 197e12, 4),
        "by_category_ms": {
            k: round(v / 1e3, 3)
            for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])
        },
        "top_ops": top,
        "trace_path": trace["_path"],
    }
    dst = os.path.join(os.path.dirname(os.path.abspath(__file__)), a.out)
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["by_category_ms"]))
    print("->", dst)


if __name__ == "__main__":
    main()
