"""Benchmark: single-chip batched greedy-decode throughput (tokens/sec/chip)
on the largest v5e-feasible slice of the 14B VQA decode path.

What runs: the und-expert decode path (VQA decode touches ONLY the
understanding expert — SURVEY.md §3.1) at full 14B layer geometry (hidden
3584, GQA 28q/4kv, ffn 18944, vocab 152064) and the deepest layer count that
fits one 16 GB v5e chip (20 of 28 layers; the full model deploys TP-sharded
over a slice). Batched KV-cached decode, whole loop in one jitted
lax.while_loop. Batch 48 (measured 2437 tok/s); falls back to 32 on OOM.

Baseline: the reference (PyTorch, A100) decodes a SINGLE stream with a
per-token Python loop and a full KV-cache rebuild per layer per token
(qwen2_navit.py:585-600). Its hard ceiling is the A100 single-stream HBM
roofline for the same weight bytes: step >= bytes / (2.0 TB/s * 0.7).
vs_baseline = our per-chip throughput / (2 x that ceiling) — i.e. >1.0 means
beating twice what the reference could achieve even with zero overhead.

Prints exactly one JSON line.
"""

import json
import time

import numpy as np


def run_bench(batch: int):
    import jax
    import jax.numpy as jnp

    from unimedvl_tpu.config import BagelConfig, LLMConfig
    from unimedvl_tpu.models import bagel
    from unimedvl_tpu.models import qwen2_mot as mot
    from unimedvl_tpu.models.qwen2_mot import KVCache

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)

    if on_tpu:
        layers, prefill_len, decode_steps = 20, 256, 64
        hidden, inter, heads, kv_heads, vocab = 3584, 18944, 28, 4, 152064
    else:  # CPU smoke fallback
        layers, batch, prefill_len, decode_steps = 2, 2, 32, 8
        hidden, inter, heads, kv_heads, vocab = 256, 512, 8, 4, 1024

    llm = LLMConfig(
        vocab_size=vocab,
        hidden_size=hidden,
        intermediate_size=inter,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        layer_module="Qwen2DecoderLayer",  # und expert only: VQA decode path
        qk_norm=True,
    )
    cfg = BagelConfig(llm=llm, vit=None, vae=None, visual_gen=False, visual_und=False)
    params = {"llm": mot.init_params(jax.random.PRNGKey(0), llm, dtype=jnp.bfloat16)}

    capacity = ((prefill_len + decode_steps + 1 + 127) // 128) * 128
    rng = np.random.default_rng(0)
    ctx_ids = jnp.asarray(rng.integers(0, vocab, (batch, prefill_len)), jnp.int32)
    positions = jnp.broadcast_to(
        jnp.arange(prefill_len, dtype=jnp.int32), (batch, prefill_len)
    )
    valid = jnp.ones((batch, prefill_len), bool)

    def sync(x):
        # On the axon tunnel platform block_until_ready can return before the
        # computation finishes; a host readback is the only reliable fence.
        return np.asarray(x)

    def fresh_cache():
        return KVCache.create(layers, batch, capacity, kv_heads, llm.head_dim, jnp.bfloat16)

    # compile warm-up, then measure warm TTFT (prefill wall time)
    cache = bagel.prefill_text(params, cfg, fresh_cache(), ctx_ids, positions, valid)
    sync(cache.lens)
    t0 = time.perf_counter()
    cache = bagel.prefill_text(params, cfg, fresh_cache(), ctx_ids, positions, valid)
    sync(cache.lens)
    ttft = time.perf_counter() - t0

    dec_pos = jnp.full((batch,), prefill_len, jnp.int32)
    eos = jnp.asarray(-1, jnp.int32)  # never fires

    def run(seed):
        start = jnp.asarray(rng.integers(0, vocab, (batch,)), jnp.int32)
        out, _ = bagel.generate_text(
            params, cfg, cache, start, dec_pos, decode_steps, eos,
            False, 1.0, jax.random.PRNGKey(seed),
        )
        return out

    sync(run(0))  # compile warm-up
    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        sync(run(rep + 1))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    tokens = batch * decode_steps
    tok_s = tokens / dt

    # Reference ceiling: A100 single-stream roofline on the same weight bytes.
    layer_bytes = 2 * (
        hidden * heads * llm.head_dim * 2  # q + o
        + hidden * kv_heads * llm.head_dim * 2  # k + v
        + 3 * hidden * inter  # mlp
    )
    step_bytes = layers * layer_bytes + 2 * vocab * hidden * 2  # + embed/lm_head
    ref_ceiling_tok_s = 1.0 / (step_bytes / (2.0e12 * 0.7))
    target = 2.0 * ref_ceiling_tok_s

    return {
        "metric": f"decode tokens/sec/chip (und-path, {layers}L/{hidden}h/bs{batch}, {platform})",
        "value": round(tok_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tok_s / target, 4),
        "detail": {
            "ttft_warm_prefill_s": round(ttft, 4),
            "step_ms": round(1000 * dt / decode_steps, 3),
            "ref_a100_single_stream_ceiling_tok_s": round(ref_ceiling_tok_s, 2),
            "hbm_roofline_step_ms_v5e": round(
                1000
                * (step_bytes + batch * layers * capacity * kv_heads * llm.head_dim * 2 * 2)
                / 819e9,
                2,
            ),
        },
    }


def main():
    import unimedvl_tpu

    unimedvl_tpu.enable_compilation_cache()

    try:
        result = run_bench(batch=48)
    except Exception as e:  # HBM OOM safety net: retry at a smaller batch
        result = run_bench(batch=32)
        result["detail"]["fallback_from_bs48"] = type(e).__name__

    print(json.dumps(result))


if __name__ == "__main__":
    main()
