#!/bin/sh
# Run every benchmark harness; each prints one JSON line.
set -e
cd "$(dirname "$0")"
echo "== gates (128-bit) ==";      python bench.py
echo "== PBS (uint4) ==";          python bench_lut.py
echo "== proxy re-encryption =="; python bench_pre.py
echo "== radix PBS (uint8) ==";    python bench_radix.py
echo "== encrypted integer mul ==";  python bench_integer.py
echo "== multichip ==";            python bench_multichip.py
