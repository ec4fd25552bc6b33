#!/usr/bin/env python
"""Measure the packed-int4 Pallas matmul (ops/w4_matmul.py) against the int8
MXU path and the w4 XLA fallback at the framework's serving projection
shapes (Qwen2-7B geometry):

  (K, N) = (3584, 4608)   fused qkv
           (3584, 3584)   o proj
           (3584, 37888)  fused gate_up
           (18944, 3584)  down proj

  M = 48 / 256 / 2048 token rows (bs48 decode, bs256 decode / headline,
  prefill-chunk class).

Theory (CLAUDE.md perf notes): decode below ~bs256 is weight-streaming-bound
— the int8 path's time per matmul is ~max(weight_bytes/819 GB/s, int8 MXU
time). Packing halves weight bytes, so the kernel should approach the MXU
floor at small M and tie at large M. The XLA fallback materialises the
nibble planes (2.5x packed traffic) and should lose everywhere; it exists
for correctness only.

Timing: REPS dependent iterations inside one jit (scan, dependency threaded
through the activation SCALE so per-iteration extra traffic is [M,1]),
fenced with a host readback (axon rules). Also asserts kernel == fallback
bit-exactly on hardware (pure integer dots + one f32 scale).

Writes ``w4_matmul_sweep`` + the ``w4_kernel_on`` gate into
benchmarks/KERNEL_THRESHOLD.json (consumed by ops.w4_matmul.use_w4_kernel).
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

# REPS must amortize the ~25 ms axon dispatch overhead per timed call:
# at REPS=20 every measurement bottoms out at ~1.3 ms/rep of pure dispatch
# (measured round 5) and real per-matmul differences drown. 200 reps puts
# the dispatch floor at 0.125 ms/rep, well under the big-shape stream times.
REPS = int(os.environ.get("W4_SWEEP_REPS", 200))
SHAPES = ((3584, 4608), (3584, 3584), (3584, 37888), (18944, 3584))
M_CASES = (48, 256, 2048)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import unimedvl_tpu

    unimedvl_tpu.enable_compilation_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()

    from unimedvl_tpu.ops.w4_matmul import pack_int4, w4_matmul
    from unimedvl_tpu.quant import quantized_linear_preq

    def timeit(step, args):
        def repeated(xq, xs, *rest):
            def body(x, _):
                y = step(x, xs, *rest)
                # fold a runtime-dependent ~0 back into the ACTIVATIONS (not
                # the scale): with the dependency on the scale only, the
                # loop-invariant integer dot is hoistable out of the scan for
                # the XLA paths but never for the pallas_call — an unfair
                # comparison. The int8 cast of y[0,0]*1e-30 is 0 at runtime,
                # so iterations compute identical numbers but stay serial.
                d = (y[0, 0] * 1e-30).astype(x.dtype)
                return x + d, None

            xf, _ = jax.lax.scan(body, xq, None, length=REPS)
            return xf

        fn = jax.jit(repeated)
        out = fn(*args)
        np.asarray(out[:1, :1])  # fence
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(out[:1, :1])
            ts.append(time.perf_counter() - t0)
        return min(ts) / REPS

    rng = np.random.default_rng(0)
    rows_out = []
    for k, n in SHAPES:
        q8 = rng.integers(-127, 128, (k, n)).astype(np.int8)
        q4 = rng.integers(-8, 8, (k, n)).astype(np.int8)
        wp = jnp.asarray(pack_int4(q4))
        w8 = jnp.asarray(q8)
        ws = jnp.asarray(rng.uniform(0.005, 0.02, (n,)).astype(np.float32))
        p8 = {"kernel_qa": w8, "scale": ws}
        weight_mb = k * n / 1e6
        for m in M_CASES:
            xq = jnp.asarray(rng.integers(-127, 128, (m, k)).astype(np.int8))
            xs = jnp.asarray(
                rng.uniform(0.01, 0.1, (m, 1)).astype(np.float32))

            t_int8 = timeit(
                lambda a, s: quantized_linear_preq(a, s, p8, jnp.bfloat16),
                (xq, xs))
            t_ker = timeit(
                lambda a, s: w4_matmul(a, s, wp, ws, force_kernel=True,
                                       widen_bits=32),
                (xq, xs))
            # i16-widened unpack variant: the unpack is the kernel's
            # bottleneck (VPU-bound); i16 halves the widened traffic IF
            # Mosaic legalizes i16 shifts — measured, not assumed
            try:
                t_ker16 = timeit(
                    lambda a, s: w4_matmul(a, s, wp, ws, force_kernel=True,
                                           widen_bits=16),
                    (xq, xs))
            except Exception as e:
                t_ker16 = None
                print(f"# i16 widen failed at ({k},{n},m{m}): "
                      f"{str(e).splitlines()[-1][:120]}", flush=True)
            t_xla = timeit(
                lambda a, s: w4_matmul(a, s, wp, ws, force_fallback=True),
                (xq, xs))

            yk = np.asarray(jax.jit(
                lambda a, s: w4_matmul(a, s, wp, ws, force_kernel=True,
                                       out_dtype=jnp.float32))(xq, xs))
            yx = np.asarray(jax.jit(
                lambda a, s: w4_matmul(a, s, wp, ws, force_fallback=True,
                                       out_dtype=jnp.float32))(xq, xs))
            exact = bool((yk == yx).all())

            t_best = t_ker if t_ker16 is None else min(t_ker, t_ker16)
            row = {
                "k": k, "n": n, "m": m,
                "int8_ms": round(t_int8 * 1e3, 4),
                "w4_kernel_ms": round(t_best * 1e3, 4),
                "w4_kernel_i32_ms": round(t_ker * 1e3, 4),
                "w4_kernel_i16_ms": (None if t_ker16 is None
                                     else round(t_ker16 * 1e3, 4)),
                "w4_xla_ms": round(t_xla * 1e3, 4),
                "speedup_vs_int8": round(t_int8 / t_best, 3),
                "w8_stream_floor_ms": round(weight_mb / 819.0, 4),
                "w4_stream_floor_ms": round(weight_mb / 2 / 819.0, 4),
                "kernel_exact_vs_xla": exact,
            }
            rows_out.append(row)
            print(json.dumps(row), flush=True)

    # grouped-scale overhead probe: one extra VPU multiply per k-step —
    # confirm it's in the noise at the weight-bound serving shape
    k, n, m, g = 18944, 3584, 256, 512
    q4 = rng.integers(-8, 8, (k, n)).astype(np.int8)
    wp = jnp.asarray(pack_int4(q4))
    ws_pc = jnp.asarray(rng.uniform(0.005, 0.02, (n,)).astype(np.float32))
    ws_g = jnp.asarray(
        rng.uniform(0.005, 0.02, (k // g, n)).astype(np.float32))
    xq = jnp.asarray(rng.integers(-127, 128, (m, k)).astype(np.int8))
    xs = jnp.asarray(rng.uniform(0.01, 0.1, (m, 1)).astype(np.float32))
    t_pc = timeit(lambda a, s: w4_matmul(a, s, wp, ws_pc, force_kernel=True),
                  (xq, xs))
    t_g = timeit(lambda a, s: w4_matmul(a, s, wp, ws_g, force_kernel=True),
                 (xq, xs))
    grouped_row = {"k": k, "n": n, "m": m, "group": g,
                   "per_channel_ms": round(t_pc * 1e3, 4),
                   "grouped_ms": round(t_g * 1e3, 4)}
    print(json.dumps(grouped_row), flush=True)

    # gate: the kernel's only in-mode competitor is the XLA fallback (vs int8
    # the user chose w4 for the bytes). ON iff it beats the fallback and the
    # integer math agreed on hardware — wholesale if that holds at every m,
    # else bounded to the largest m where it holds at every shape
    # (w4_kernel_max_rows; large-M prefill shapes are compute-bound and the
    # fallback's extra traffic stops mattering).
    def wins(r):
        return r["w4_kernel_ms"] <= r["w4_xla_ms"] and r["kernel_exact_vs_xla"]

    exact_ok = all(r["kernel_exact_vs_xla"] for r in rows_out)
    win_ms = [m for m in M_CASES
              if all(wins(r) for r in rows_out if r["m"] == m)]
    kernel_on = exact_ok and bool(win_ms)
    max_rows = (None if set(win_ms) == set(M_CASES)
                else (max(win_ms) if win_ms else 0))

    path = os.path.join(HERE, "KERNEL_THRESHOLD.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data["w4_matmul_sweep"] = {"reps": REPS, "rows": rows_out,
                               "grouped_probe": grouped_row}
    data["w4_kernel_on"] = kernel_on
    data["w4_kernel_max_rows"] = max_rows
    # unpack-widen choice: i16 only if it compiled everywhere and won overall
    i16_ok = all(r["w4_kernel_i16_ms"] is not None for r in rows_out)
    data["w4_widen_bits"] = (
        16 if i16_ok and sum(r["w4_kernel_i16_ms"] for r in rows_out)
        < sum(r["w4_kernel_i32_ms"] for r in rows_out) else 32)
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote w4_kernel_on={kernel_on} max_rows={max_rows} to {path}")


if __name__ == "__main__":
    main()
