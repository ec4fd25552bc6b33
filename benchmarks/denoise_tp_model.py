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


def measure(tp: int, streams: int, n_latent: int = 1024,
            fused: bool = False, wq: str = "bf16", trace_dir: str = None):
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
    if wq == "bf16":
        llm_p = mot.init_params(jax.random.PRNGKey(0), llm, jnp.bfloat16)
        if fused:
            # the narrowed config IS the per-chip shard, so the plain (tp=1)
            # fused layout measures the sp_denoise fused path's local work
            from unimedvl_tpu.quant import fuse_serving_projections

            llm_p = fuse_serving_projections(llm_p)
    else:
        # int8 weights ("i8") / full-int8 s8xs8 matmuls ("i8a"), host-built
        # (a bf16 intermediate + on-device quantize would OOM at full depth)
        from denoise_full_bench import host_int8_mot_llm_params

        llm_p = host_int8_mot_llm_params(
            llm, np.random.default_rng(0), fused=fused, act=(wq == "i8a")
        )
        llm_p = jax.device_put(llm_p)
    params = {"llm": llm_p}
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
    if trace_dir is not None:
        with jax.profiler.trace(trace_dir):
            np.asarray(f(p, x)[..., :1, :1])
    return per_step


def case_key(tp, streams, n, fused=False, wq="bf16"):
    key = f"tp{tp}_s{streams}" if n == 1024 else f"tp{tp}_s{streams}_n{n}"
    if wq != "bf16":
        key += f"_{wq}"
    if fused:
        key += "_f"
    return key


def main():
    import argparse

    import jax

    import unimedvl_tpu

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated case-key substrings to (re)measure; "
                         "results MERGE into the existing DENOISE_TP.json")
    ap.add_argument("--profile", default=None,
                    help="trace ONE case (key like tp2_s3_n256_i8a_f) and "
                         "write its hlo_category breakdown to "
                         "DENOISE_SHARD_PROFILE.json — names the per-layer "
                         "fixed-overhead class that blocks <2 s at small "
                         "shards (docs/MULTICHIP_DENOISE.md)")
    args = ap.parse_args()

    unimedvl_tpu.enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    if args.profile is not None:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from trace_utils import hlo_category_breakdown, load_latest_trace

        want = args.profile
        all_cases = {
            "tp2_s3_n256_i8a_f": (2, 3, 256, True, "i8a"),
            "tp2_s3_n256_f": (2, 3, 256, True, "bf16"),
            "tp2_s3_n256": (2, 3, 256, False, "bf16"),
            "tp1_s3_i8a_f": (1, 3, 1024, True, "i8a"),
            "tp1_s3": (1, 3, 1024, False, "bf16"),
        }
        tp, streams, n, fused, wq = all_cases[want]
        trace_dir = "/tmp/denoise_shard_trace"
        per_step = measure(tp, streams, n_latent=n, fused=fused, wq=wq,
                           trace_dir=trace_dir)
        trace = load_latest_trace(trace_dir)
        by_cat, top = hlo_category_breakdown(trace)
        # the traced run is 5 scan steps of LAYERS layers
        denom = 5 * LAYERS * 1e3
        rep = {
            "case": want,
            "per_step_ms_10L": round(per_step * 1e3, 2),
            "per_layer_by_category_us": {
                k: round(v / (5 * LAYERS), 1)
                for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])
            },
            "top_ops_us_per_layer": {
                nm: {**d, "us": round(d["us"] / (5 * LAYERS), 1)}
                for nm, d in top.items()
            },
            "trace_path": trace["_path"],
        }
        dst = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "DENOISE_SHARD_PROFILE.json")
        with open(dst, "w") as f:
            json.dump(rep, f, indent=1)
        print(json.dumps(rep["per_layer_by_category_us"]))
        print("->", dst)
        return

    cases = [(tp, s, 1024, False, "bf16") for tp in (1, 2, 4, 8) for s in (1, 3)]
    # SP (sequence-parallel over the latent tokens) per-chip shares: full/TP
    # weights with 1024/SP query tokens — measures the candidate hybrid
    # layouts directly instead of assuming perfect /N scaling:
    #   SP8 (int8 weight copies fit per chip), TP2 x SP4, TP4 x SP2
    cases += [(1, 3, 128, False, "bf16"), (1, 1, 128, False, "bf16"),
              (2, 3, 256, False, "bf16"), (2, 1, 256, False, "bf16"),
              (4, 3, 512, False, "bf16"), (4, 1, 512, False, "bf16")]
    # fused qkv/gate_up (quant.fuse_serving_projections): attacks the
    # per-layer-call fixed-overhead class that dominates small shards
    cases += [(2, 3, 256, True, "bf16"), (1, 3, 128, True, "bf16"),
              (4, 3, 512, True, "bf16"), (2, 1, 256, True, "bf16"),
              (1, 3, 1024, True, "bf16")]
    # int8 weights / full-int8 s8xs8 matmuls at the headline hybrid shard
    cases += [(2, 3, 256, True, "i8"), (2, 3, 256, True, "i8a"),
              (2, 1, 256, True, "i8a"), (1, 3, 1024, True, "i8a")]

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "DENOISE_TP.json")
    out = {"layers_measured": LAYERS, "n_latent": 1024, "cases": {}}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        if prev.get("layers_measured") == LAYERS:
            out["cases"].update(prev.get("cases", {}))

    for tp, streams, n, fused, wq in cases:
        key = case_key(tp, streams, n, fused, wq)
        if args.only is not None:
            if not any(s in key for s in args.only.split(",")):
                continue
        elif key in out["cases"]:
            continue  # already measured; use --only to force a re-run
        ms = measure(tp, streams, n_latent=n, fused=fused, wq=wq) * 1e3
        out["cases"][key] = round(ms, 2)
        print(json.dumps({key: out["cases"][key]}))
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    print("->", path)


if __name__ == "__main__":
    main()
