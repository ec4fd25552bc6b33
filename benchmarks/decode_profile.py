#!/usr/bin/env python
"""Profile the int8 28L bs48 decode step (bench.py headline) and break the
17.6 ms-vs-11.25 ms-roofline gap into named op classes.

jax.profiler works on axon; the trace lands as plugins/profile/*/  *.trace.json.gz.
Writes benchmarks/DECODE_PROFILE.json with the top op classes by self time.
Run on TPU via background bash.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import gzip
import json
import time
from collections import defaultdict

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import unimedvl_tpu

    unimedvl_tpu.enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    import bench as bench_mod
    from unimedvl_tpu.config import BagelConfig, LLMConfig
    from unimedvl_tpu.models import bagel
    from unimedvl_tpu.models.qwen2_mot import KVCache

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=48)
    ap.add_argument('--kv', action='store_true')
    ap.add_argument('--act', action='store_true',
                    help='full-int8 matmuls (bench headline config)')
    ap.add_argument('--out', default='DECODE_PROFILE.json')
    a = ap.parse_args()
    layers, batch, prefill_len, decode_steps = 28, a.batch, 256, 64
    llm = LLMConfig(
        vocab_size=152064, hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=layers, num_attention_heads=28, num_key_value_heads=4,
        layer_module="Qwen2DecoderLayer", qk_norm=True,
    )
    cfg = BagelConfig(llm=llm, vit=None, vae=None, visual_gen=False,
                      visual_und=False)
    rng = np.random.default_rng(0)
    params = {"llm": bench_mod._host_int8_llm_params(llm, rng, act=a.act)}

    capacity = ((prefill_len + decode_steps + 1 + 127) // 128) * 128
    ids = jnp.asarray(rng.integers(0, llm.vocab_size, (batch, prefill_len)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(prefill_len, dtype=jnp.int32), (batch, prefill_len))
    valid = jnp.ones((batch, prefill_len), bool)
    cache = KVCache.create(layers, batch, capacity, 4, llm.head_dim,
                           jnp.bfloat16, quantized=a.kv)
    # prefill in batch chunks of 64 (the full-batch activation peak OOMs
    # at bs>=128, see bench.py)
    chunk = min(64, batch)
    for lo in range(0, batch, chunk):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, lo, chunk, axis=1)
        sub = KVCache(
            k=sl(cache.k), v=sl(cache.v),
            lens=jax.lax.dynamic_slice_in_dim(cache.lens, lo, chunk, axis=0),
            k_scale=None if cache.k_scale is None else sl(cache.k_scale),
            v_scale=None if cache.v_scale is None else sl(cache.v_scale),
        )
        sub = bagel.prefill_text(
            params, cfg, sub,
            jax.lax.dynamic_slice_in_dim(ids, lo, chunk, 0),
            jax.lax.dynamic_slice_in_dim(pos, lo, chunk, 0),
            jax.lax.dynamic_slice_in_dim(valid, lo, chunk, 0),
        )
        up = lambda x, y: jax.lax.dynamic_update_slice_in_dim(x, y, lo, axis=1)
        cache = KVCache(
            k=up(cache.k, sub.k), v=up(cache.v, sub.v),
            lens=jax.lax.dynamic_update_slice_in_dim(cache.lens, sub.lens, lo, 0),
            k_scale=None if cache.k_scale is None else up(cache.k_scale, sub.k_scale),
            v_scale=None if cache.v_scale is None else up(cache.v_scale, sub.v_scale),
        )
    np.asarray(cache.lens)

    dec_pos = jnp.full((batch,), prefill_len, jnp.int32)
    eos = jnp.asarray(-1, jnp.int32)

    def run(seed):
        start = jnp.asarray(rng.integers(0, llm.vocab_size, (batch,)), jnp.int32)
        out, _ = bagel.generate_text(
            params, cfg, cache, start, dec_pos, decode_steps, eos,
            False, 1.0, jax.random.PRNGKey(seed),
        )
        return out

    np.asarray(run(0))  # compile
    trace_dir = "/tmp/decode_trace"
    with jax.profiler.trace(trace_dir):
        np.asarray(run(1))

    # parse the xplane-exported trace events
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace found under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    # keep only TensorFlow Op / XLA Op rows on the device — sum self durations
    # by a coarse class derived from the op name
    def classify(name: str) -> str:
        n = name.lower()
        if "fusion" in n and ("dot" in n or "convert" in n):
            return "fused_matmul"
        for key, cls in (
            ("dot", "matmul"), ("conv", "conv"),
            ("dynamic-update-slice", "cache_update"),
            ("dynamic_update_slice", "cache_update"),
            ("scatter", "cache_update"), ("gather", "gather"),
            ("all-reduce", "collective"), ("copy", "copy"),
            ("reduce", "reduce"), ("fusion", "fusion_elementwise"),
            ("convert", "convert"), ("custom-call", "custom_call"),
            ("transpose", "transpose"), ("broadcast", "broadcast"),
            ("iota", "iota"), ("select", "select"), ("while", "_skip"),
        ):
            if key in n:
                return cls
        return "other"

    # device pids only: host python rows ($array, np, ...) otherwise dominate
    # the sums with wall-clock that overlaps device execution
    device_pids = set()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pname = (ev.get("args") or {}).get("name", "")
            if "TPU" in pname or "/device" in pname.lower():
                device_pids.add(ev.get("pid"))

    by_class = defaultdict(float)
    by_name = defaultdict(float)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0)  # microseconds
        cls = classify(name)
        if cls == "_skip":
            continue
        by_class[cls] += dur
        by_name[name.split(".")[0]] += dur

    total_us = sum(by_class.values())
    top_names = sorted(by_name.items(), key=lambda kv: -kv[1])[:25]
    out = {
        "decode_steps": decode_steps, "batch": batch, "kv_quant": a.kv,
        "total_traced_us": round(total_us, 1),
        "per_step_traced_ms": round(total_us / decode_steps / 1e3, 3),
        "by_class_us_per_step": {
            k: round(v / decode_steps, 1)
            for k, v in sorted(by_class.items(), key=lambda kv: -kv[1])
        },
        "top_ops_us_per_step": {
            k: round(v / decode_steps, 1) for k, v in top_names
        },
        "trace_path": path,
    }
    dst = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       a.out)
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["by_class_us_per_step"]))
    print("->", dst)


if __name__ == "__main__":
    main()
