#!/usr/bin/env python
"""Prompt-lookup speculative decode microbenchmark (full 28L int8 VQA
geometry, interactive batch sizes).

Random weights cannot measure real-text acceptance (greedy continuations of
a random model don't repeat prompt n-grams), so this measures the two
quantities that BOUND the real-text speedup, both exactly:

  * floor — junk drafts (acceptance 0): every iteration still emits 1 token
    but pays the [S, k+1] verify forward. ratio_floor = t_plain/t_floor < 1
    is the worst case.
  * ceiling — the true continuation planted in the lookup history
    (acceptance 1): tokens/step = k+1. ratio_ceiling = t_plain/t_ceiling.

Real templated-report acceptance sits between; prompt-lookup papers report
2-4x on summarization-style output. The decode is weight-streaming-bound at
interactive batch, so the verify forward (T=k+1) costs barely more than T=1
— measured here as the floor ratio.

Run on TPU via background bash. Writes benchmarks/SPEC_DECODE.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PROMPT_LEN = 256
GEN_LEN = 224
K = 7
NGRAM = 3


def run(batch: int):
    import jax
    import jax.numpy as jnp

    from bench import _host_int8_llm_params
    from unimedvl_tpu.config import BagelConfig, LLMConfig
    from unimedvl_tpu.models import bagel
    from unimedvl_tpu.models.qwen2_mot import KVCache

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    if on_tpu:
        layers, hidden, inter, heads, kv_heads, vocab = (
            28, 3584, 18944, 28, 4, 152064)
        prompt_len, gen_len = PROMPT_LEN, GEN_LEN
    else:  # CPU smoke
        layers, hidden, inter, heads, kv_heads, vocab = 2, 256, 512, 8, 4, 1024
        prompt_len, gen_len = 32, 16

    llm = LLMConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        layer_module="Qwen2DecoderLayer", qk_norm=True,
    )
    cfg = BagelConfig(llm=llm, vit=None, vae=None, visual_gen=False,
                      visual_und=False)
    rng = np.random.default_rng(0)
    # unfused: generate_text_spec's verify block reuses the same forward as
    # prefill; fused layout works too but parity tests cover unfused + fused
    params = {"llm": _host_int8_llm_params(llm, rng, fused=True)}

    capacity = ((prompt_len + gen_len + K + 2 + 127) // 128) * 128
    cache0 = KVCache.create(layers, batch, capacity, kv_heads, llm.head_dim,
                            jnp.bfloat16)
    ids = rng.integers(5, vocab, (batch, prompt_len)).astype(np.int32)
    positions = np.broadcast_to(np.arange(prompt_len, dtype=np.int32),
                                (batch, prompt_len))
    cache = bagel.prefill_text(
        params, cfg, cache0, jnp.asarray(ids), jnp.asarray(positions),
        jnp.ones((batch, prompt_len), bool),
    )
    # the decode forwards the start token itself (last prompt id); its kv
    # row duplicating the prefilled one is irrelevant for a speed measurement
    start = jnp.asarray(ids[:, -1])
    dpos = jnp.full((batch,), prompt_len, jnp.int32)
    eos = jnp.asarray(2**30, jnp.int32)  # never emitted -> full-length run

    def sync(x):
        return np.asarray(x)

    # plain contiguous decode
    t_plain = []
    for _ in range(3):
        t0 = time.perf_counter()
        out, lengths, _ = bagel.generate_text_ctx(
            params, cfg, cache, start, dpos, gen_len, eos)
        sync(lengths)
        t_plain.append(time.perf_counter() - t0)
    t_plain = min(t_plain[1:])  # first call compiles
    emitted = np.asarray(out)  # [S, gen_len], starts with start token

    HL = ((prompt_len + gen_len + K + 255) // 256) * 256

    def spec_time(hist, hlen):
        ts = []
        n_fwd = None
        for _ in range(3):
            t0 = time.perf_counter()
            o, l, _, it = bagel.generate_text_spec(
                params, cfg, cache, start, dpos, gen_len, eos,
                hist, hlen, k_draft=K, ngram=NGRAM)
            sync(l)
            ts.append(time.perf_counter() - t0)
            n_fwd = int(it)
            np.testing.assert_array_equal(np.asarray(o), emitted)
        return min(ts[1:]), n_fwd

    # floor: junk drafts (random prompt has no repeated n-grams to exploit)
    hist_f = np.zeros((batch, HL), np.int32)
    hist_f[:, :prompt_len] = ids
    t_floor, fwd_floor = spec_time(
        jnp.asarray(hist_f), jnp.full((batch,), prompt_len, jnp.int32))

    # ceiling: plant [trailing ngram + true continuation] before the prompt
    hist_c = np.zeros((batch, HL), np.int32)
    for s in range(batch):
        cont = emitted[s][emitted[s] >= 0][1:]
        planted = np.concatenate([ids[s, -NGRAM:], cont])
        seq = np.concatenate([planted, ids[s]])
        hist_c[s, : len(seq)] = seq
        hlen_c = len(seq)
    t_ceil, fwd_ceil = spec_time(
        jnp.asarray(hist_c), jnp.full((batch,), hlen_c, jnp.int32))

    n_tok = int(np.sum(emitted[0] >= 0))
    return {
        "batch": batch,
        "tokens": n_tok,
        "plain_s": round(t_plain, 4),
        "plain_tok_s": round(batch * n_tok / t_plain, 1),
        "spec_floor_s": round(t_floor, 4),
        "spec_floor_ratio": round(t_plain / t_floor, 3),
        "spec_floor_fwd": fwd_floor,
        "spec_ceiling_s": round(t_ceil, 4),
        "spec_ceiling_ratio": round(t_plain / t_ceil, 3),
        "spec_ceiling_fwd": fwd_ceil,
        "spec_ceiling_tok_s": round(batch * n_tok / t_ceil, 1),
    }


def main():
    import jax

    import unimedvl_tpu

    unimedvl_tpu.enable_compilation_cache()
    out = {"k_draft": K, "ngram": NGRAM, "prompt_len": PROMPT_LEN,
           "gen_len": GEN_LEN, "cases": []}
    for batch in (1, 4):
        r = run(batch)
        out["cases"].append(r)
        print(json.dumps(r))

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "SPEC_DECODE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("->", path)


if __name__ == "__main__":
    main()
