#!/bin/bash
# Serial TPU measurement queue (ONE process owns the chip at a time).
# Reconstructs the round-3 queue that was lost when the tunnel went down:
# decode-kernel sweep on the head-major layout, headline bench ladder
# (incl. full-int8 act-quant rungs), serving bench with batched admission,
# TTFT probe, spec-decode floor/ceiling, and the fused/int8 denoise-TP cases.
# Run via background bash:  bash scripts/tpu_queue.sh
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

run decode_sweep python benchmarks/decode_kernel_sweep.py
run bench python bench.py
run serving python benchmarks/serving_bench.py --kv-quant
run ttft python benchmarks/ttft_probe.py
run spec python benchmarks/spec_decode_bench.py
run denoise_tp python benchmarks/denoise_tp_model.py
echo "QUEUE DONE $(date -u +%H:%M:%S)" | tee -a "$LOG/queue.log"
