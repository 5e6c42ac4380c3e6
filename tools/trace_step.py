#!/usr/bin/env python
"""Capture a device trace of the blind-rotate scan and print per-fusion
self-times (the only trustworthy attribution on this platform —
docs/ROADMAP.md methodology).

Usage:
  ZTFHE_INV=pack32 python tools/trace_step.py [params] [group]
Env: BENCH_BATCH (default 1536), BENCH_LEVELS, TRACE_DIR.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                 ".jax_cache"))

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def main():
    pname = sys.argv[1] if len(sys.argv) > 1 else "128bit"
    group = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    B = int(os.environ.get("BENCH_BATCH", "1536"))
    levels = os.environ.get("BENCH_LEVELS")
    if levels and "-" in levels:
        levels = tuple(int(x) for x in levels.split("-"))
    else:
        levels = int(levels) if levels else None
    trace_dir = os.environ.get("TRACE_DIR", "/tmp/ztfhe_trace")

    import dataclasses
    from zig_tfhe_tpu import key as K
    from zig_tfhe_tpu import params as P
    from zig_tfhe_tpu.ops.blind_rotate import blind_rotate

    params = P.PARAMS_BY_NAME[pname]
    if params.torus_bits == 64:
        jax.config.update("jax_enable_x64", True)   # int64 carriers
    bgbit = os.environ.get("BENCH_BGBIT")   # engine-gadget base override
    ck = K.CloudKey.generate_no_ksk(params, group=group, decomp_levels=levels,
                                    engine_bgbit=int(bgbit) if bgbit else None)
    rng = np.random.default_rng(0)
    ck = dataclasses.replace(
        ck, bsk_ntt=jnp.asarray(
            rng.integers(-30000, 30000, ck.bsk_ntt.shape).astype(np.int16)))
    w = params.torus_bits
    tl = jnp.asarray(rng.integers(-2 ** (w - 1), 2 ** (w - 1),
                                  (B, params.n0 + 1), dtype=np.int64)
                     .astype(np.int32 if w == 32 else np.int64))

    @jax.jit
    def run(tl, ck):
        out = blind_rotate(tl, ck.testvec, ck, params)
        return out.ravel()[0] + out.ravel()[-1]

    np.asarray(run(tl, ck))  # compile + warm
    jax.profiler.start_trace(trace_dir)
    np.asarray(run(tl, ck))
    jax.profiler.stop_trace()

    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        print("no trace file found under", trace_dir)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)

    # device-lane complete events only; aggregate by op name
    by_name = defaultdict(float)
    count = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        cat = ev.get("args", {}) or {}
        name = ev.get("name", "")
        # heuristically keep XLA op events (they carry run_id/program metadata)
        if not name or name.startswith("$"):
            continue
        if "pid" not in ev:
            continue
        dur = float(ev.get("dur", 0.0))
        if dur <= 0:
            continue
        src = cat.get("source", "")
        key = f"{name}  [{src}]" if src else name
        by_name[key] += dur
        count[key] += 1

    total = sum(by_name.values())
    steps = (params.n0 + group - 1) // group
    print(f"# trace: {files[-1]}")
    print(f"# total device-event time {total/1e3:.1f} ms "
          f"(incl. host lanes; read top fusions relatively)")
    print(f"{'us/step':>9}  {'count':>6}  name")
    for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v/steps:9.1f}  {count[k]:6d}  {k[:140]}")


if __name__ == "__main__":
    main()
