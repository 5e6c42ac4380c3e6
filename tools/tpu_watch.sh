#!/bin/bash
# Wait for the axon TPU tunnel to come back, then run the round-2 sweeps.
# Probe must be a subprocess (a hung backend can block forever).
set -u
cd "$(dirname "$0")/.."
while true; do
  # a CPU fallback backend must NOT count as "TPU up"
  if timeout 180 python -c "import jax; d = jax.devices(); assert d and d[0].platform.lower() != 'cpu', d" 2>/dev/null; then
    echo "TPU up at $(date)" | tee -a tools/sweep_r02.log
    break
  fi
  echo "TPU still down at $(date)" >&2
  sleep 60
done
bash tools/sweep_r02.sh
bash tools/sweep_r02b.sh
echo "SWEEPS DONE at $(date)"
