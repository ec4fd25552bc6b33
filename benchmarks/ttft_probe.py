#!/usr/bin/env python
"""Warm-TTFT profile (BASELINE p50 TTFT metric): where does the bs48 256-token
prefill time go?

Hypothesis under test: prefill is MXU compute-bound, so (a) per-LAYER prefill
cost is identical for int8 and bf16 weights (the dequant widen rides the
weight stream; the r02 1.07 s "regression" vs r01's 0.76 s is depth 20->28,
not int8), and (b) the bf16 compute floor at bs48 x 256 tok x 28L is
~0.8 s on a 197 TFLOP/s chip — TTFT improvements must come from batch/length
policy, not kernels.

Measures prefill wall time for {bf16 20L, int8 20L, int8 28L} at bs48/256 and
a per-request slice (bs1..8) for the serving p50 view. Writes
benchmarks/TTFT_PROBE.json. Run on TPU via background bash.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def measure(layers: int, quant: bool, batch: int, prefill_len: int = 256):
    import jax
    import jax.numpy as jnp

    from unimedvl_tpu.config import BagelConfig, LLMConfig
    from unimedvl_tpu.models import bagel, qwen2_mot as mot
    from unimedvl_tpu.models.qwen2_mot import KVCache

    llm = LLMConfig(
        vocab_size=152064, hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=layers, num_attention_heads=28, num_key_value_heads=4,
        layer_module="Qwen2DecoderLayer", qk_norm=True,
    )
    cfg = BagelConfig(llm=llm, vit=None, vae=None, visual_gen=False,
                      visual_und=False)
    rng = np.random.default_rng(0)
    if quant:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import bench as bench_mod

        params = {"llm": bench_mod._host_int8_llm_params(llm, rng)}
    else:
        params = {"llm": mot.init_params(jax.random.PRNGKey(0), llm,
                                         dtype=jnp.bfloat16)}

    capacity = ((prefill_len + 127) // 128) * 128
    ids = jnp.asarray(rng.integers(0, llm.vocab_size, (batch, prefill_len)),
                      jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(prefill_len, dtype=jnp.int32),
                           (batch, prefill_len))
    valid = jnp.ones((batch, prefill_len), bool)

    def fresh():
        return KVCache.create(layers, batch, capacity, 4, llm.head_dim,
                              jnp.bfloat16)

    cache = bagel.prefill_text(params, cfg, fresh(), ids, pos, valid)
    np.asarray(cache.lens)  # compile + fence
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        cache = bagel.prefill_text(params, cfg, fresh(), ids, pos, valid)
        np.asarray(cache.lens)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax

    import unimedvl_tpu

    unimedvl_tpu.enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    out = {"batch48_prefill256": {}, "per_request_int8_28L": {}}
    for name, layers, quant in (
        ("bf16_20L", 20, False), ("int8_20L", 20, True), ("int8_28L", 28, True),
    ):
        s = measure(layers, quant, batch=48)
        out["batch48_prefill256"][name] = {
            "ttft_s": round(s, 4),
            "per_layer_ms": round(s / layers * 1e3, 2),
        }
        print(json.dumps({name: out["batch48_prefill256"][name]}))

    # serving p50 view: a single request's prefill admitted alone
    for bs in (1, 4, 8):
        s = measure(28, True, batch=bs)
        out["per_request_int8_28L"][f"bs{bs}"] = round(s, 4)
        print(json.dumps({f"bs{bs}": round(s, 4)}))

    # bf16 MXU compute floor at bs48 x 256 x 28L
    tokens = 48 * 256
    flops = tokens * 28 * 2 * (
        3584 * 3584 * 2 + 2 * 3584 * 512 + 3 * 3584 * 18944
    )
    out["bf16_compute_floor_s_bs48_28L"] = round(flops / 197e12, 3)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "TTFT_PROBE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("->", path)


if __name__ == "__main__":
    main()
