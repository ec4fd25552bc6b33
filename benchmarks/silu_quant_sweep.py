#!/usr/bin/env python
"""Measure the fused Pallas silu·mul·quant kernel (ops/act_quant.py) vs the
XLA two-pass act-quant at the framework's hot row counts (I=18944, the
Qwen2-7B intermediate width):

  8192  rows = bs256 warm-TTFT prefill chunk ([32, 256] tokens) — the shape
               where XLA's double silu recompute costs 54 ms/chunk
               (benchmarks/PREFILL_PROFILE.json)
  3078  rows = one full-token 512px denoise step per expert (3 CFG streams
               x 1026 tokens)
  2048  rows = serving admission block / bucketed image prefill
   256  rows = bs256 decode step (act-quant absmax profiled at 0.59 ms)
    48  rows = bs48 decode step

Each case times REPS dependent iterations inside ONE jit (lax.scan; the
quantized output feeds back into the next iteration's input so nothing can
be elided), fenced with a host readback — the CLAUDE.md axon timing rules.
Also records the q/scale agreement between the two paths on real hardware
(Mosaic vs XLA transcendentals can differ in the last bf16 ulp; interpret
mode is bit-exact, tests/test_act_quant.py).

Writes a ``silu_quant_sweep`` entry + the winning ``silu_quant_min_rows``
gate into benchmarks/KERNEL_THRESHOLD.json (consumed by
ops.act_quant.use_silu_quant_kernel).
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

REPS = 20
I_WIDTH = 18944
ROW_CASES = (48, 256, 2048, 3078, 8192)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import unimedvl_tpu

    unimedvl_tpu.enable_compilation_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()

    from unimedvl_tpu.ops.act_quant import silu_mul_quant
    from unimedvl_tpu.quant import quantize_activations

    def jnp_path(g, u):
        return quantize_activations(jax.nn.silu(g) * u)

    def kernel_path(g, u):
        return silu_mul_quant(g, u)

    def scan_timer(fn):
        # feed the (tiny) dequantized output back into g so iterations are
        # dependent; q*s reconstructs ~the product, scaled down to keep
        # values in range
        def repeated(g, u):
            def body(gc, _):
                q, s = fn(gc, u)
                back = (q.astype(jnp.float32) * s * 1e-3).astype(gc.dtype)
                return gc + back, None

            gf, _ = jax.lax.scan(body, g, None, length=REPS)
            return gf

        return jax.jit(repeated)

    def timeit(fn, g, u):
        t = scan_timer(fn)
        out = t(g, u)
        np.asarray(out[:1, :1])  # fence (axon: block_until_ready lies)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = t(g, u)
            np.asarray(out[:1, :1])
            ts.append(time.perf_counter() - t0)
        return min(ts) / REPS

    rng = np.random.default_rng(0)
    rows_out = []
    for rows in ROW_CASES:
        g = jnp.asarray(rng.standard_normal((rows, I_WIDTH)) * 2,
                        jnp.bfloat16)
        u = jnp.asarray(rng.standard_normal((rows, I_WIDTH)) * 2,
                        jnp.bfloat16)
        t_jnp = timeit(jnp_path, g, u)
        t_ker = timeit(kernel_path, g, u)
        # agreement on hardware (both jitted once, same inputs)
        qj, sj = jax.jit(jnp_path)(g, u)
        qk, sk = jax.jit(kernel_path)(g, u)
        dq = np.abs(np.asarray(qk, np.int32) - np.asarray(qj, np.int32))
        rel_s = np.abs(np.asarray(sk) - np.asarray(sj)) / np.abs(
            np.asarray(sj))
        row = {
            "rows": rows, "jnp_ms": round(t_jnp * 1e3, 4),
            "kernel_ms": round(t_ker * 1e3, 4),
            "speedup": round(t_jnp / t_ker, 3),
            "q_max_lsb_diff": int(dq.max()),
            "q_frac_diff": round(float((dq != 0).mean()), 6),
            "scale_max_rel_diff": float(rel_s.max()),
        }
        rows_out.append(row)
        print(json.dumps(row), flush=True)

    # gate: smallest row case from which the kernel wins consistently
    # (monotone suffix of wins)
    min_rows = None
    for row in reversed(rows_out):
        if row["kernel_ms"] < row["jnp_ms"]:
            min_rows = row["rows"]
        else:
            break

    path = os.path.join(HERE, "KERNEL_THRESHOLD.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data["silu_quant_sweep"] = {"i_width": I_WIDTH, "reps": REPS,
                                "rows": rows_out}
    data["silu_quant_min_rows"] = min_rows
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote silu_quant_min_rows={min_rows} to {path}")


if __name__ == "__main__":
    main()
