"""Measure the decode-attention path crossover on the real chip: head-major
jnp einsum vs the Pallas decode kernel (ops/decode_attention.py), at the
bench ladder's serving shapes (full 28L int8 geometry).

Each rung runs in a clean subprocess (same OOM-poisoning rationale as
bench.py). Results append a ``decode_sweep`` entry to
benchmarks/KERNEL_THRESHOLD.json; the winner sets
qwen2_mot._DECODE_KERNEL_MIN_SM.

Usage:  python benchmarks/decode_kernel_sweep.py
        python benchmarks/decode_kernel_sweep.py --single <batch> [--kv] [--kernel]
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def _single(batch: int, kv: bool, kernel: bool):
    import unimedvl_tpu

    unimedvl_tpu.enable_compilation_cache()
    from unimedvl_tpu.models import qwen2_mot as mot

    if kernel:
        mot._DECODE_KERNEL_MIN_SM = 0  # force the Pallas decode kernel
    else:
        mot._DECODE_KERNEL_MIN_SM = None  # force the jnp path
    import bench

    out = bench.run_bench(batch=batch, quant=True, kv_quant=kv)
    out["decode_kernel"] = kernel
    print(json.dumps(out))


def _rung(batch: int, kv: bool, kernel: bool):
    cmd = [sys.executable, os.path.abspath(__file__), "--single", str(batch)]
    if kv:
        cmd.append("--kv")
    if kernel:
        cmd.append("--kernel")
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=7200)
    except subprocess.TimeoutExpired:
        return None, "Timeout"
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()
        return None, (tail[-1][:300] if tail else f"rc={proc.returncode}")
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line), None
        except Exception:
            continue
    return None, "no JSON line"


def main():
    rows = []
    for batch, kv in ((256, True), (96, False), (48, False)):
        for kernel in (False, True):
            res, err = _rung(batch, kv, kernel)
            row = {
                "batch": batch, "kv_quant": kv, "decode_kernel": kernel,
                "step_ms": None if res is None else res["detail"]["step_ms"],
                "tok_s": None if res is None else res["value"],
                "error": err,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    path = os.path.join(HERE, "KERNEL_THRESHOLD.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data["decode_sweep"] = rows

    # production gate: the smallest measured S*M where the kernel beat the
    # jnp path (bench capacity 384 at every rung); None = kernel never won.
    # qwen2_mot.use_decode_kernel lazily loads this value, so the sweep's
    # verdict takes effect for every later run without a code change.
    CAPACITY = 384
    wins = []
    by_key = {}
    for r in rows:
        if r["step_ms"] is not None:
            by_key[(r["batch"], r["kv_quant"], r["decode_kernel"])] = r["step_ms"]
    for (batch, kv, kern), ms in by_key.items():
        if kern and by_key.get((batch, kv, False)) is not None:
            if ms < by_key[(batch, kv, False)]:
                wins.append(batch * CAPACITY)
    data["decode_kernel_min_sm"] = min(wins) if wins else None
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote decode_sweep (min_sm={data['decode_kernel_min_sm']}) to {path}")


if __name__ == "__main__":
    if "--single" in sys.argv:
        i = sys.argv.index("--single")
        _single(
            batch=int(sys.argv[i + 1]),
            kv="--kv" in sys.argv,
            kernel="--kernel" in sys.argv,
        )
    else:
        main()
