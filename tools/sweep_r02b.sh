#!/bin/bash
# Round-2 follow-up sweep: multi-bit groups at ENGINE gadget bases that
# keep the 3-prime plan (run after sweep_r02.sh).
#
# Analysis (Hoeffding plan bound, docs/NOISE.md 2b):
#   group=3 @ engine bg6/(3,2), default drop 5:
#     tau = sqrt(2 ln2 * 129 * 26 * 5 * 1024) * 2^5 * 2^26 = 2^43.25
#     -> bound_bits 44 -> 3-prime plan (P = 2^47.09).  234 steps vs 350.
#     BSK-drop noise amplitude 2^5*2^4 = 2^9 vs group-2-default 2^11:
#     (26*234)/(8*350) = 2.17x terms, 16x smaller per-term variance ->
#     ~7x SAFER than the shipped group-2 budget.
#   group=4 @ bg6/(3,2): also 3-prime, but r1 measured the 15-subset
#     rotate-combine blowup dwarfing the step saving; measure anyway.
# Round 1 refuted group-3 only under 4-prime parameter-gadget plans.
set -u
cd "$(dirname "$0")/.."
LOG=tools/sweep_r02b.log
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 1800 "$@" 2>&1 | tee -a "$LOG"
}

BENCH_BATCH=1536 BENCH_BGBIT=6 BENCH_LEVELS=3-2 run python bench_step.py 128bit 3
BENCH_BATCH=1536 BENCH_BGBIT=6 BENCH_LEVELS=3-2 run python bench_step.py 128bit 4
# group=3 at a 4-ROW engine gadget (bg7/(2,2), drop 5): Hoeffding
#   tau = sqrt(2 ln2*129 * 26*4*1024) * 2^6 * 2^26 = 2^44.09 -> bits 45
#   -> 3-prime plan (P = 2^47.09).  Drop noise: amplitude 2^6*2^5 = 2^11
#   (half the shipped group-2 2^12), terms x2.17 -> 0.54x shipped drop
#   variance.  Truncation rho +-2^17 both components; a-side 22x
#   amplified -> ~2^21.5 amplitude, negligible vs sigma 2^25.85
#   (docs/NOISE.md §6).  234 steps at 4 forward rows.
BENCH_BATCH=1536 BENCH_BGBIT=7 BENCH_LEVELS=2-2 BENCH_DROP=5 run python bench_step.py 128bit 3
# same idea at bg8/(2,2) needs drop 6 (amplitude 2^13, 8.7x shipped drop
# variance — past the measured cliff; step-time datum only)
BENCH_BATCH=1536 BENCH_BGBIT=8 BENCH_LEVELS=2-2 BENCH_DROP=6 run python bench_step.py 128bit 3
# reference point: shipped default (engine bg8/(2,2), group 2)
BENCH_BATCH=1536 run python bench_step.py 128bit 2

# new integer ops on-chip (throughput + accuracy at uint4 real noise)
for op in div lt eq; do
  BENCH_OP=$op run python bench_integer.py
done
