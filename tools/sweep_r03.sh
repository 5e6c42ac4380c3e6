#!/bin/bash
# Round-3 measurement campaign (results: tools/sweep_r03.log, summarized
# in docs/ROADMAP.md "Round-3 status").  Sequence, with rationale:
#
# 1. Land the group-3 engine gadget (the config round 2 left queued):
#    bench.py BENCH_GROUP=3 at B=1536 and B=4096 (accuracy 1.0 both),
#    tools/noise_probe.py ",,3" at B=4096 (sigma 2^25.77, margin 6.59 —
#    better than the shipped group-2's 6.22) -> default flipped
#    (ops/ntt.py:default_group).
# 2. Barrett fold (pointwise reduce_output=False + wide combiners):
#    bench_step.py 128bit {2,3} -> g2 0.776->0.766, g3 1.118->1.101
#    ms/step, bit-exact vs oracles.
# 3. Batch knee re-sweep at group 3: B in {1536, 1792, 2048, 3072} ->
#    5961 / 3967(!) / 6008 / 4850 BR/s; full gate at B=2048: 5,970/s.
# 4. Refuted levers (each measured, see ROADMAP negative results):
#    ZTFHE_UNROLL=2, ZTFHE_ROT=half, ZTFHE_INV=split4, group-4 as a
#    latency config (bench.py BENCH_GROUP=4 BENCH_BATCH=16 + noise
#    probe ",,4"), lb=1 at bg8 (paper-refuted).
# 5. Device trace at the default (tools/trace_step.py 128bit 3,
#    BENCH_BATCH=2048): matmuls ~45%, s32->s8 relayouts ~28%,
#    combine ~11%, barretts ~9%.
# 6. Radix tree-PBS: bench_radix.py at B in {32, 256, 512, 1024} ->
#    57 (pre-multi-value) / 643 / 663 / 603 uint8 evals/s, accuracy 1.0.
# 7. PRE re-measured with a correct fence + one-dispatch keygens
#    (bench_pre.py): 130,683 reenc/s, asym keygen 29.9 ms.
# 8. Integer multiply (bench_integer.py BENCH_OP=mul): classic 68.2,
#    BENCH_PACKING=1 tree-PBS digit mul 119.5 mults/s, accuracy 1.0.
set -u
cd "$(dirname "$0")/.."
LOG=tools/sweep_r03.log
run() { echo "=== $* ===" | tee -a "$LOG"; timeout 2400 "$@" 2>&1 | tee -a "$LOG"; }

BENCH_GROUP=3 BENCH_BATCH=1536 run python bench.py
BENCH_GROUP=3 BENCH_BATCH=4096 BENCH_LATENCY=0 run python bench.py
PROBE_BATCH=4096 run python tools/noise_probe.py ",,3"
for B in 1536 1792 2048 3072; do BENCH_BATCH=$B run python bench_step.py 128bit 3; done
BENCH_BATCH=2048 ZTFHE_UNROLL=2 run python bench_step.py 128bit 3
BENCH_BATCH=2048 ZTFHE_ROT=half run python bench_step.py 128bit 3
BENCH_BATCH=2048 ZTFHE_INV=split4 run python bench_step.py 128bit 3
BENCH_BATCH=2048 run python bench.py
BENCH_GROUP=4 BENCH_BATCH=16 BENCH_TRIPWIRE=0 run python bench.py
PROBE_BATCH=4096 run python tools/noise_probe.py ",,4"
for B in 256 512 1024; do BENCH_BATCH=$B run python bench_radix.py; done
run python bench_pre.py
BENCH_PACKING=0 run python bench_integer.py
BENCH_PACKING=1 run python bench_integer.py
