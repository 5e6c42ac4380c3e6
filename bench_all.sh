#!/bin/sh
# Run every benchmark harness; each prints one JSON line.
set -e
cd "$(dirname "$0")"
echo "== gates (128-bit) ==";      python bench.py
echo "== PBS (uint4) ==";          python bench_lut.py
echo "== proxy re-encryption =="; python bench_pre.py
echo "== radix PBS (uint8) ==";    python bench_radix.py
echo "== encrypted integer mul ==";  python bench_integer.py
echo "== circuit (Bristol 64x64) =="; python bench_circuit.py
echo "== 64-bit split-ring gates ==";  python tools/bench_split64.py
echo "== 64-bit LUT envelope ==";    BENCH_PARAMS=128bit_t64 BENCH_MS=4,8,16,32,64 BENCH_BATCH=512 python tools/lut_envelope_probe.py
echo "== SECURE integer mul (128bit_t64) ==";  BENCH_PARAMS=128bit_t64 BENCH_BATCH=64 python bench_integer.py
echo "== SECURE integer add (128bit_t64) ==";  BENCH_PARAMS=128bit_t64 BENCH_BATCH=64 BENCH_OP=add python bench_integer.py
echo "== SECURE radix LUT m=64/256 (128bit_t64) ==";  BENCH_PARAMS=128bit_t64 BENCH_BATCH=64 python bench_radix.py
echo "== SECURE circuit (Bristol 64x64, 128bit_t64) ==";  BENCH_PARAMS=128bit_t64 python bench_circuit.py
echo "== gates (128bit_v2, estimator-clean) ==";  BENCH_PARAMS=128bit_v2 python bench.py
echo "== multichip (8-dev virtual CPU mesh) ==";  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu BENCH_PARAMS=tiny python bench_multichip.py
