#!/bin/bash
# Round-2 measurement sweep (run on the TPU when the tunnel is up).
# Logs to tools/sweep_r02.log; each step is independently resumable.
set -u
cd "$(dirname "$0")/.."
LOG=tools/sweep_r02.log
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 1800 "$@" 2>&1 | tee -a "$LOG"
}

# 1. step-time A/B: engine gadget (default) vs round-1 (3,2) parameter gadget
BENCH_BATCH=1536 run python bench_step.py 128bit 2
BENCH_BATCH=1536 BENCH_LEVELS=3-2 run python bench_step.py 128bit 2

# 2. batch sweep at the engine gadget
BENCH_BATCH=1024 run python bench_step.py 128bit 2
BENCH_BATCH=2048 run python bench_step.py 128bit 2
BENCH_BATCH=3072 run python bench_step.py 128bit 2

# 3. full-gate official bench (accuracy gate) + latency
BENCH_BATCH=1536 run python bench.py
BENCH_BATCH=4096 BENCH_LATENCY=0 run python bench.py

# 4. trace for the new per-stage breakdown
BENCH_BATCH=1536 run python tools/trace_step.py 128bit 2

# 5. integer bench (multi-value bootstrapping speedup vs r1's 30 mults/s)
run python bench_integer.py
ZTFHE_NO_MULTIVALUE=1 run python bench_integer.py
