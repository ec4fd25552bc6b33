#!/usr/bin/env python
"""Profile the denoise forward at an SP-shard shape (10L, 3 streams, 130
tokens) and attribute the measured ~1.1 ms/layer fixed overhead class
(docs/MULTICHIP_DENOISE.md) to named op classes.

Writes benchmarks/DENOISE_PROFILE.json. Run on TPU via background bash.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import gzip
import json
from collections import defaultdict

import numpy as np

LAYERS = 10
N_LATENT = 128
STREAMS = 3


def classify(name: str) -> str:
    n = name.lower()
    for key, cls in (
        ("dot", "matmul"),
        ("dynamic-update-slice", "dyn_update"),
        ("scatter", "dyn_update"), ("gather", "gather"),
        ("copy", "copy"), ("custom-call", "pallas_kernel"),
        ("convert", "convert"), ("transpose", "transpose"),
        ("fusion", "fusion_elementwise"), ("reduce", "reduce"),
        ("broadcast", "broadcast"), ("iota", "iota"),
        ("select", "select"), ("while", "_skip"), ("concatenate", "concat"),
    ):
        if key in n:
            return cls
    return "other"


def main():
    import jax
    import jax.numpy as jnp

    import unimedvl_tpu

    unimedvl_tpu.enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    from unimedvl_tpu.config import LLMConfig
    from unimedvl_tpu.models import qwen2_mot as mot
    from unimedvl_tpu.models.qwen2_mot import ForwardSpec, KVCache

    llm = LLMConfig(
        vocab_size=1024, hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=LAYERS, num_attention_heads=28,
        num_key_value_heads=4, layer_module="Qwen2MoTDecoderLayer",
        qk_norm=True,
    )
    params = {"llm": mot.init_params(jax.random.PRNGKey(0), llm, jnp.bfloat16)}
    T = N_LATENT + 2
    cache = KVCache.create(LAYERS, STREAMS, 512, 4, llm.head_dim, jnp.bfloat16)
    cache = KVCache(k=cache.k, v=cache.v,
                    lens=jnp.full((STREAMS,), 300, jnp.int32))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((STREAMS, T, 3584)), jnp.bfloat16)
    positions = jnp.full((STREAMS, T), 301, jnp.int32)
    spec = ForwardSpec("gen", False, False)

    REPS = 10

    def step_fn(p, x):
        def body(xc, _):
            h, _ = mot.forward(p, llm, xc, positions, cache, spec)
            return (xc + h * jnp.asarray(1e-6, xc.dtype)), None

        out, _ = jax.lax.scan(body, x, None, length=REPS)
        return out

    f = jax.jit(step_fn)
    p = params["llm"]
    np.asarray(f(p, x)[..., :1, :1])  # compile + fence

    trace_dir = "/tmp/denoise_trace"
    with jax.profiler.trace(trace_dir):
        np.asarray(f(p, x)[..., :1, :1])

    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace found under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f2:
        trace = json.load(f2)

    by_class = defaultdict(float)
    by_name = defaultdict(float)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        cls = classify(name)
        if cls == "_skip":
            continue
        by_class[cls] += ev.get("dur", 0)
        by_name[name.split(".")[0]] += ev.get("dur", 0)

    denom = REPS * LAYERS  # per layer-step
    out = {
        "shape": dict(layers=LAYERS, streams=STREAMS, T=T),
        "per_layer_us_by_class": {
            k: round(v / denom, 1)
            for k, v in sorted(by_class.items(), key=lambda kv: -kv[1])
        },
        "top_ops_per_layer_us": {
            k: round(v / denom, 1)
            for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]
        },
        "trace_path": path,
    }
    dst = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "DENOISE_PROFILE.json")
    with open(dst, "w") as f2:
        json.dump(out, f2, indent=1)
    print(json.dumps(out["per_layer_us_by_class"]))
    print("->", dst)


if __name__ == "__main__":
    main()
