#!/usr/bin/env python
"""Pick the two-phase vs concat+single-loop flash kernel threshold from data.

qwen2_mot.attention's no-update path (CFG denoise) chooses between
  (a) concat(cache, block) + flash_block_attention  — pays a cache copy
  (b) flash_cache_block_attention (two-phase)       — no copy, extra loop
per layer based on the cache capacity M0. This sweeps realistic denoise
context sizes (text-only ~32-128, i2i ~1-4k cache) at the production query
shape (3 CFG streams x 1026 tokens) and times both variants END-TO-END
(the concat copy INSIDE the jitted candidate, as attention() pays it).

Also times the fused q-preproc (N7) vs the unfused outside island at the
denoise shape. Writes benchmarks/KERNEL_THRESHOLD.json.

Run on TPU via background bash: python benchmarks/kernel_threshold_sweep.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np

REPS = 20


def main():
    import jax
    import jax.numpy as jnp

    import unimedvl_tpu

    unimedvl_tpu.enable_compilation_cache()
    from unimedvl_tpu.ops.flash_attention import (
        flash_block_attention,
        flash_cache_block_attention,
    )
    from unimedvl_tpu.ops.norms import rms_norm
    from unimedvl_tpu.ops.rope import apply_rope_one, rope_cos_sin

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)

    S, T, H, Hk, D = 3, 1026, 28, 4, 128
    q = jnp.asarray(rng.standard_normal((S, T, H, D)), jnp.bfloat16)
    kb = jnp.asarray(rng.standard_normal((S, T, Hk, D)), jnp.bfloat16)
    vb = jnp.asarray(rng.standard_normal((S, T, Hk, D)), jnp.bfloat16)

    def scan_timer(fn):
        def repeated(q, *rest):
            def body(qc, _):
                o = fn(qc, *rest)
                return qc + o.astype(qc.dtype) * jnp.asarray(1e-6, qc.dtype), None

            qf, _ = jax.lax.scan(body, q, None, length=REPS)
            return qf

        return jax.jit(repeated)

    def timeit(fn, *args):
        out = fn(*args)
        np.asarray(out[..., :1, :1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(out[..., :1, :1])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / REPS * 1e3  # ms

    results = {"query": dict(S=S, T=T, H=H, Hk=Hk, D=D), "cache_sweep": []}

    for M0 in (32, 128, 256, 512, 1024, 2048, 4096):
        kc = jnp.asarray(rng.standard_normal((S, M0, Hk, D)), jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((S, M0, Hk, D)), jnp.bfloat16)
        lens = jnp.full((S,), min(M0, max(M0 - 12, 1)), jnp.int32)

        def concat_variant(q, kc, vc, kb, vb, lens):
            k_all = jnp.concatenate([kc, kb], axis=1)
            v_all = jnp.concatenate([vc, vb], axis=1)
            bstart = jnp.full_like(lens, M0)
            return flash_block_attention(
                q, k_all, v_all, lens, bstart, False,
                block_q=256, block_k=256, interpret=False,
            )

        def two_phase(q, kc, vc, kb, vb, lens):
            return flash_cache_block_attention(
                q, kc, vc, kb, vb, lens, False,
                block_q=256, block_k=256, interpret=False,
            )

        t_concat = timeit(scan_timer(concat_variant), q, kc, vc, kb, vb, lens)
        t_two = timeit(scan_timer(two_phase), q, kc, vc, kb, vb, lens)
        row = {
            "M0": M0,
            "concat_single_loop_ms": round(t_concat, 3),
            "two_phase_ms": round(t_two, 3),
            "winner": "two_phase" if t_two < t_concat else "concat",
        }
        results["cache_sweep"].append(row)
        print(json.dumps(row))

    # fused q-preproc (N7) vs unfused outside island, denoise shape, M0=512
    M0 = 512
    kc = jnp.asarray(rng.standard_normal((S, M0, Hk, D)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((S, M0, Hk, D)), jnp.bfloat16)
    lens = jnp.full((S,), 300, jnp.int32)
    w_und = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.bfloat16)
    w_gen = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.bfloat16)
    # production gen blocks share ONE rope position (rope_const) -> compact
    # [S, 1, D] tables (the kernel keeps one row in VMEM instead of
    # streaming a [T_pad, D] fp32 table per grid step)
    pos = jnp.asarray(rng.integers(0, 500, (S, 1)), jnp.int32)
    cos, sin = rope_cos_sin(pos, D, 1e6)

    def unfused(q, kc, vc, kb, vb, lens):
        q32 = q.astype(jnp.float32)
        y = rms_norm(q32, w_gen.astype(jnp.float32))
        y = y.at[:, :1].set(rms_norm(q32[:, :1], w_und.astype(jnp.float32)))
        y = y.at[:, -1:].set(rms_norm(q32[:, -1:], w_und.astype(jnp.float32)))
        y = apply_rope_one(y, cos, sin).astype(q.dtype)
        k_all = jnp.concatenate([kc, kb], axis=1)
        v_all = jnp.concatenate([vc, vb], axis=1)
        bstart = jnp.full_like(lens, M0)
        return flash_block_attention(
            y, k_all, v_all, lens, bstart, False,
            block_q=256, block_k=256, interpret=False,
        )

    def fused(q, kc, vc, kb, vb, lens):
        k_all = jnp.concatenate([kc, kb], axis=1)
        v_all = jnp.concatenate([vc, vb], axis=1)
        bstart = jnp.full_like(lens, M0)
        return flash_block_attention(
            q, k_all, v_all, lens, bstart, False,
            block_q=256, block_k=256, interpret=False,
            q_preproc=dict(w_und=w_und, w_gen=w_gen, cos=cos, sin=sin,
                           end_row=None, eps=1e-6),
        )

    got_u = np.asarray(jax.jit(unfused)(q, kc, vc, kb, vb, lens), np.float32)
    got_f = np.asarray(jax.jit(fused)(q, kc, vc, kb, vb, lens), np.float32)
    err = float(np.abs(got_f - got_u).max())
    results["fused_q_preproc"] = {
        "max_abs_err_vs_unfused": err,
        "pass": err < 0.02,
        "unfused_ms": round(timeit(scan_timer(unfused), q, kc, vc, kb, vb, lens), 3),
        "fused_ms": round(timeit(scan_timer(fused), q, kc, vc, kb, vb, lens), 3),
    }
    print(json.dumps(results["fused_q_preproc"]))

    # N7 k-side: fused-k two-phase vs concat + XLA k island — validates the
    # fuse_k -> always-two-phase branch in qwen2_mot._attention_block on the
    # real chip. The concat variant pays the XLA fp32 k norm+rope pass the
    # fused kernel absorbs; both get the fused q.
    wk_und = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.bfloat16)
    wk_gen = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.bfloat16)
    qp = dict(w_und=w_und, w_gen=w_gen, cos=cos, sin=sin, end_row=None,
              eps=1e-6)
    results["fused_k_sweep"] = []
    for M0 in (32, 128, 256, 512, 1024, 2048):
        kc = jnp.asarray(rng.standard_normal((S, M0, Hk, D)), jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((S, M0, Hk, D)), jnp.bfloat16)
        lens = jnp.full((S,), min(M0, max(M0 - 12, 1)), jnp.int32)

        def concat_xla_k(q, kc, vc, kb, vb, lens):
            k32 = kb.astype(jnp.float32)
            y = rms_norm(k32, wk_gen.astype(jnp.float32))
            y = y.at[:, :1].set(rms_norm(k32[:, :1], wk_und.astype(jnp.float32)))
            y = y.at[:, -1:].set(rms_norm(k32[:, -1:], wk_und.astype(jnp.float32)))
            y = apply_rope_one(y, cos, sin).astype(kb.dtype)
            k_all = jnp.concatenate([kc, y], axis=1)
            v_all = jnp.concatenate([vc, vb], axis=1)
            bstart = jnp.full_like(lens, M0)
            return flash_block_attention(
                q, k_all, v_all, lens, bstart, False,
                block_q=256, block_k=256, interpret=False, q_preproc=qp,
            )

        def two_phase_fused_k(q, kc, vc, kb, vb, lens):
            return flash_cache_block_attention(
                q, kc, vc, kb, vb, lens, False,
                block_q=256, block_k=256, interpret=False,
                q_preproc=qp,
                kv_preproc=dict(w_und=wk_und, w_gen=wk_gen),
            )

        got_c = np.asarray(
            jax.jit(concat_xla_k)(q, kc, vc, kb, vb, lens), np.float32
        )
        got_t = np.asarray(
            jax.jit(two_phase_fused_k)(q, kc, vc, kb, vb, lens), np.float32
        )
        err = float(np.abs(got_c - got_t).max())
        t_c = timeit(scan_timer(concat_xla_k), q, kc, vc, kb, vb, lens)
        t_t = timeit(scan_timer(two_phase_fused_k), q, kc, vc, kb, vb, lens)
        row = {
            "M0": M0,
            "concat_xla_k_ms": round(t_c, 3),
            "two_phase_fused_k_ms": round(t_t, 3),
            "max_abs_err": err,
            "winner": "two_phase_fused_k" if t_t < t_c else "concat_xla_k",
        }
        results["fused_k_sweep"].append(row)
        print(json.dumps(row))

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "KERNEL_THRESHOLD.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print("->", path)


if __name__ == "__main__":
    main()
