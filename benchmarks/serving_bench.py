#!/usr/bin/env python
"""Serving-engine throughput benchmark (BASELINE config 3: batched VQA /
report generation) on ONE chip at the full 14B und-expert geometry, int8
serving mode with fused projections.

Drives the real ContinuousBatcher (slot pool + chunked decode + per-slot
prefill admission) with a synthetic text workload: mixed prompt lengths
(two prefill buckets to bound tunnel compiles) and mixed output lengths.
The reference has no serving engine at all — it decodes one request per
Python loop (bagel.py:1259-1314).

Run on TPU via background bash:  python benchmarks/serving_bench.py
Writes benchmarks/SERVING_BENCH.json.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


class ByteTokenizer:
    def __init__(self):
        self.specials = {}
        self.special_tokens_map = {}

    def add_tokens(self, toks):
        for t in toks:
            self.specials.setdefault(t, 256 + len(self.specials))
        return len(toks)

    def convert_tokens_to_ids(self, t):
        return self.specials[t]

    def encode(self, text):
        return [ord(c) % 256 for c in text]

    def decode(self, ids):
        inv = {v: k for k, v in self.specials.items()}
        return "".join(inv.get(i, chr(i)) for i in ids)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke test); must win the "
                         "init race against the preloaded-jax axon platform")
    ap.add_argument("--act-quant", action="store_true",
                    help="full-int8 matmuls (s8xs8 MXU)")
    ap.add_argument("--kv-quant", action="store_true", help="int8 KV caches")
    ap.add_argument("--kv4", action="store_true",
                    help="int4 KV caches (with --kv-quant)")
    ap.add_argument("--w4", action="store_true",
                    help="int4 layer weights (w4 / w4a8 with --act-quant)")
    ap.add_argument("--spec", action="store_true",
                    help="speculative continuous batching (prompt-lookup "
                         "drafts; random-weight runs measure the floor only)")
    ap.add_argument("--pool-ladder", action="store_true",
                    help="drain-tail pool rightsizing (power-of-two rungs "
                         "down to 32 slots); each rung is pre-warmed so the "
                         "tunnel compiles outside the timed window")
    ap.add_argument("--prefix", type=int, default=0, metavar="N",
                    help="shared N-token preamble served via the prefix "
                         "cache (register_prefix + Request(prefix_id=...))")
    ap.add_argument("--prefix-inline", type=int, default=0, metavar="N",
                    help="BASELINE for --prefix: the same N-token preamble "
                         "inlined into every prompt (no prefix cache)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import unimedvl_tpu

    if not args.cpu:
        unimedvl_tpu.enable_compilation_cache()
    import bench as bench_mod
    from unimedvl_tpu.config import BagelConfig, LLMConfig
    from unimedvl_tpu.data.tokenizer import add_special_tokens
    from unimedvl_tpu.inference.serving import ContinuousBatcher, Request

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        layers, hidden, inter, heads, kv = 28, 3584, 18944, 28, 4
        # 128 slots: decode cost/step is weights-bound (bs48 12.3 ms ->
        # bs128 ~17 ms) so a pool large enough to keep the 144-request mix
        # RESIDENT cuts the makespan to ~the longest request instead of
        # refill-staggered waves (48 slots measured 304 chunk-steps for 171
        # ideal). int8 cache at 128x256 is 0.94 GB.
        num_slots, n_requests = 128, 144
    else:  # CPU smoke
        layers, hidden, inter, heads, kv = 2, 256, 512, 8, 4
        num_slots, n_requests = 4, 8

    llm = LLMConfig(
        vocab_size=152064 if on_tpu else 1024,
        hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv, layer_module="Qwen2DecoderLayer", qk_norm=True,
    )
    cfg = BagelConfig(llm=llm, vit=None, vae=None, visual_gen=False,
                      visual_und=False)
    rng = np.random.default_rng(0)
    params = {"llm": bench_mod._host_int8_llm_params(
        llm, rng, fused=True, act=args.act_quant,
        bits=4 if args.w4 else 8)}
    tok, new_ids, _ = add_special_tokens(ByteTokenizer())

    # Two prompt-length buckets (T_pad 32 / 64) so the tunnel compiles at most
    # two prefill programs; output lengths mixed 16..96.
    preamble = "q" * (args.prefix or args.prefix_inline)
    prompts = []
    for i in range(n_requests):
        plen = int(rng.integers(8, 24)) if i % 2 == 0 else int(rng.integers(36, 56))
        prompts.append(("x" * plen) if args.prefix
                       else (preamble + "x" * plen))
    max_new = [int(rng.integers(16, 96)) for _ in range(n_requests)]

    # a preamble (cached or inlined) extends every request's extent; keep
    # headroom so nothing is rejected at admission
    n_pre = args.prefix or args.prefix_inline
    capacity = 256 if not n_pre else 256 + ((n_pre + 1 + 31) // 32) * 32
    engine = ContinuousBatcher(
        params, cfg, tok, new_ids, num_slots=num_slots,
        capacity=capacity, chunk=16, kv_quantized=args.kv_quant,
        kv_bits=4 if args.kv4 else 8,
        spec_decode=args.spec,
        pool_ladder=args.pool_ladder, min_pool=min(32, num_slots),
    )

    # warm-up: compile both prefill buckets + the decode chunk. One run()
    # PER bucket: a mixed round pads its text block to the group T_max, so
    # submitting both lengths together would only compile the [P, 64]
    # program and an all-short admission round mid-measurement would compile
    # [P, 32] on the tunnel (minutes) inside the timed window.
    # With the pool ladder, do this AT EVERY RUNG (descending): each rung is
    # its own chunk/prefill program, and mid-measurement tunnel compiles
    # would swamp the timing.
    rungs = sorted(getattr(engine, "_rungs", [num_slots]), reverse=True)
    for rung in rungs:
        for p in ("w" * 10, "w" * 40):
            if engine.pool != rung:  # drain shrinks after every run()
                engine._repack(rung)
            engine.submit(Request(prompt=p, max_new_tokens=4))
            engine.run()
    pid = None
    if args.prefix:
        pid = engine.register_prefix(preamble)
        # warm the prefixed admission programs (seed + [P, Tp+T_max] block)
        for p in ("w" * 10, "w" * 40):
            engine.submit(Request(prompt=p, max_new_tokens=4, prefix_id=pid))
            engine.run()
    if args.pool_ladder and engine.pool != num_slots:
        engine._repack(num_slots)  # start the timed window at full pool

    for p, m in zip(prompts, max_new):
        engine.submit(Request(prompt=p, max_new_tokens=m, prefix_id=pid))
    t0 = time.perf_counter()
    results = engine.run()
    wall = time.perf_counter() - t0

    n_out_tokens = sum(len(tok.encode(v)) for v in results.values())
    out = {
        "metric": (
            f"serving throughput (ContinuousBatcher, {layers}L "
            + ("w4a8" if args.w4 and args.act_quant else "w4" if args.w4
               else "full-int8" if args.act_quant else "int8")
            + " fused"
            + (f", int{4 if args.kv4 else 8} kv" if args.kv_quant else "")
            + f"{', spec' if args.spec else ''}, "
            f"{num_slots} slots, {jax.default_backend()})"
        ),
        "requests": n_requests,
        "wall_s": round(wall, 3),
        "requests_per_s": round(n_requests / wall, 2),
        "output_tokens": n_out_tokens,
        "output_tok_per_s": round(n_out_tokens / wall, 1),
        "errors": len(engine.errors),
        "chunk": 16,
        "capacity": capacity,
        "prefix_tokens": n_pre,
        "prefix_mode": ("cached" if args.prefix
                        else "inline" if args.prefix_inline else None),
        "phase_breakdown": {
            k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in engine.stats.items()
        },
    }
    st = engine.stats
    attributed = sum(st.get(k, 0.0) for k in
                     ("admit_s", "decode_s", "host_s", "gen_s", "repack_s"))
    out["phase_breakdown"]["unattributed_s"] = round(
        st.get("round_s", 0.0) - attributed, 3)
    out["phase_breakdown"]["outside_rounds_s"] = round(
        wall - st.get("round_s", 0.0), 3)
    print(json.dumps(out))
    if on_tpu:  # don't clobber the recorded TPU result with a CPU smoke
        name = "SERVING_BENCH_SPEC.json" if args.spec else "SERVING_BENCH.json"
        if n_pre:  # prefix experiments get their own record
            name = (f"SERVING_BENCH_PREFIX_"
                    f"{'CACHED' if args.prefix else 'INLINE'}.json")
        dst = os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
        with open(dst, "w") as f:
            json.dump(out, f, indent=1)
        print("->", dst)


if __name__ == "__main__":
    main()
