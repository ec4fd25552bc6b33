#!/usr/bin/env python
"""TPU-compiled (non-interpret) Pallas kernel tier: runs the inference flash
kernels on the REAL chip across the production shape matrix, checks parity
against the jnp masked-softmax reference, and records pass/fail + timings.

CI exercises these kernels only in interpret mode (tests/conftest.py forces
CPU); this script is the Mosaic-compiled evidence. Results are written to
benchmarks/TPU_KERNELS.json (committed to the repo).

Run manually on TPU:  python benchmarks/tpu_kernel_check.py
(compiles go through the tunnel — run via background bash, minutes per shape)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


REPS = 20


def _scan_timer(attn_fn):
    """Amortize the ~25 ms tunnel dispatch overhead: REPS dependent calls
    inside ONE jit via lax.scan (q [S,T,H,D] and o have matching shapes, so
    the output feeds the next iteration's query and cannot be elided)."""
    import jax.numpy as jnp

    def repeated(q, *rest):
        def body(qc, _):
            o = attn_fn(qc, *rest)
            return qc + o.astype(qc.dtype) * jnp.asarray(1e-6, qc.dtype), None

        qf, _ = jax.lax.scan(body, q, None, length=REPS)
        return qf

    return jax.jit(repeated)


def _time(fn, *args):
    """Median of 3, fenced with host readback (axon block_until_ready lies).
    fn must be a _scan_timer-wrapped callable; returns seconds per inner call."""
    out = fn(*args)
    np.asarray(out[..., :1, :1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[..., :1, :1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / REPS


def main():
    global jax
    import jax
    import jax.numpy as jnp

    import unimedvl_tpu

    unimedvl_tpu.enable_compilation_cache()
    from unimedvl_tpu.ops.attention import causal_suffix_mask, gqa_attention
    from unimedvl_tpu.ops.flash_attention import (
        flash_block_attention,
        flash_cache_block_attention,
    )

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    results = {"backend": "tpu", "device": str(jax.devices()[0]), "cases": []}

    # (name, S, T, H, Hk, D, M_cache, lens, causal, block_k, block_q)
    CASES = [
        # ViT 980px encode block: 4900 tokens, no cache, 16 heads, D=72
        ("vit_4900", 1, 4900, 16, 16, 72, 0, 0, False, 512, 512),
        # denoise gen block: 1026 tokens x 3 CFG streams, GQA G=7, cache 512
        ("denoise_1026_g7", 3, 1026, 28, 4, 128, 512, 300, False, 256, 256),
        # und prefill: 512-token text block against a 2048 cache, causal
        ("prefill_512_c2048", 4, 512, 28, 4, 128, 2048, 300, True, 256, 256),
        # lens-bound win case: capacity 4096, tiny 300-token context
        ("short_ctx_cap4096", 4, 128, 28, 4, 128, 4096, 300, False, 256, 128),
    ]

    for name, S, T, H, Hk, D, M, ln, causal, bk, bq in CASES:
        q = jnp.asarray(rng.standard_normal((S, T, H, D)), jnp.bfloat16)
        kb = jnp.asarray(rng.standard_normal((S, T, Hk, D)), jnp.bfloat16)
        vb = jnp.asarray(rng.standard_normal((S, T, Hk, D)), jnp.bfloat16)
        Mtot = M + T
        k = jnp.zeros((S, Mtot, Hk, D), jnp.bfloat16)
        v = jnp.zeros((S, Mtot, Hk, D), jnp.bfloat16)
        if M:
            kc = jnp.asarray(rng.standard_normal((S, M, Hk, D)), jnp.bfloat16)
            vc = jnp.asarray(rng.standard_normal((S, M, Hk, D)), jnp.bfloat16)
            k = k.at[:, :M].set(kc)
            v = v.at[:, :M].set(vc)
        lens = jnp.full((S,), ln, jnp.int32)
        # appended block lives at the contiguous tail of the valid context
        bstart = lens
        for s in range(S):
            k = k.at[s, ln : ln + T].set(kb[s])
            v = v.at[s, ln : ln + T].set(vb[s])

        # jnp reference
        mask = causal_suffix_mask(Mtot, T, lens, causal)
        ref_attn = lambda q, k, v, mask: gqa_attention(q, k, v, mask)
        flash_attn = lambda q, k, v, lens, bstart: flash_block_attention(
            q, k, v, lens, bstart, causal=causal,
            block_q=bq, block_k=bk, interpret=False,
        )
        want = np.asarray(jax.jit(ref_attn)(q, k, v, mask), np.float32)
        got = np.asarray(jax.jit(flash_attn)(q, k, v, lens, bstart), np.float32)
        err = float(np.abs(got - want).max())
        t_flash = _time(_scan_timer(flash_attn), q, k, v, lens, bstart)
        t_ref = _time(_scan_timer(ref_attn), q, k, v, mask)
        case = {
            "case": name,
            "shape": dict(S=S, T=T, H=H, Hk=Hk, D=D, cache=M, lens=ln, causal=causal),
            "kernel": "flash_block_attention",
            "max_abs_err": err,
            "pass": err < 0.02,
            "flash_ms": round(t_flash * 1e3, 3),
            "jnp_ms": round(t_ref * 1e3, 3),
        }
        results["cases"].append(case)
        print(json.dumps(case))

        if M > 512:
            two_attn = lambda q, kc, vc, kb, vb, lens: flash_cache_block_attention(
                q, k_cache=kc, v_cache=vc, k_block=kb, v_block=vb,
                lens=lens, causal=causal, block_q=bq, block_k=bk,
                interpret=False,
            )
            got2 = np.asarray(
                jax.jit(two_attn)(q, k[:, :M], v[:, :M], kb, vb, lens),
                np.float32,
            )
            err2 = float(np.abs(got2 - want).max())
            t2 = _time(_scan_timer(two_attn), q, k[:, :M], v[:, :M], kb, vb, lens)
            case2 = {
                "case": name,
                "kernel": "flash_cache_block_attention",
                "max_abs_err": err2,
                "pass": err2 < 0.02,
                "flash_ms": round(t2 * 1e3, 3),
            }
            results["cases"].append(case2)
            print(json.dumps(case2))

    results["all_pass"] = all(c["pass"] for c in results["cases"])
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "TPU_KERNELS.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("ALL PASS" if results["all_pass"] else "FAILURES", "->", out_path)


if __name__ == "__main__":
    main()
