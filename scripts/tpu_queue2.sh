#!/bin/bash
# Phase-2 TPU queue: run AFTER scripts/tpu_queue.sh drains.
# - parity-gate rehearsal on the full-geometry synthetic checkpoint
#   (VERDICT item 4 done-criterion: gate end-to-end on the real chip,
#   memory budget documented). No --ref: torch CPU at 14B is infeasible
#   here; the gate records the skip reason.
# - full-depth denoise with full-int8 (act quant) matmuls.
# - fresh decode profile on the head-major cache layout.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_queue
mkdir -p "$LOG"

run() {
  name="$1"; shift
  echo "=== $name: start $(date -u +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
  timeout 14400 "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name: rc=$? $(date -u +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
}

run parity_gate python scripts/parity_gate.py /tmp/ckpt_synth --int8 \
    --max-tokens 8 --out benchmarks/PARITY_GATE_TPU.json
run denoise_i8a python benchmarks/denoise_full_bench.py --act-quant
run decode_profile python benchmarks/decode_profile.py
echo "QUEUE2 DONE $(date -u +%H:%M:%S)" | tee -a "$LOG/queue.log"
