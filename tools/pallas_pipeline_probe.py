#!/usr/bin/env python
"""Measure the MXU/VPU-interleaved pipelined fused step kernel (VERDICT r3 #2).

Times the group-2 blind rotation at a bg6/(3,2) key (the fused kernel's
admissible config) in four modes on the same inputs:

    xla      — the shipped unfused XLA step
    pallas   — ZTFHE_PALLAS=1 (fused kernel, sequential phases)
    sub2     — ZTFHE_PALLAS=1 + ZTFHE_PALLAS_SUB=2 (pipelined, 2 sub-tiles)
    sub4     — ZTFHE_PALLAS_SUB=4

Prints one JSON line with per-mode ms/batch and the ratios vs xla.
Env: BENCH_BATCH (256), BENCH_PARAMS (128bit), BENCH_ITERS (3).

ZTFHE_PALLAS/_SUB are TRACE-TIME env knobs: each mode jits its own
closure after setting them (same pattern as bench.py's Mosaic tripwire).
"""

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zig_tfhe_tpu import key as K
from zig_tfhe_tpu import params as P
from zig_tfhe_tpu.ops.blind_rotate import blind_rotate


def main():
    params = P.PARAMS_BY_NAME[os.environ.get("BENCH_PARAMS", "128bit")]
    B = int(os.environ.get("BENCH_BATCH", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    ck = K.CloudKey.generate_no_ksk(params, group=2, decomp_levels=(3, 2),
                                    engine_bgbit=params.bgbit)
    rng = np.random.default_rng(0)
    ck = dataclasses.replace(ck, bsk_ntt=jnp.asarray(rng.integers(
        -30000, 30000, ck.bsk_ntt.shape).astype(np.int16)))
    tlw = jnp.asarray(rng.integers(
        -2**31, 2**31, (B, params.n0 + 1)).astype(np.int32))

    def timed(flag, sub):
        os.environ["ZTFHE_PALLAS"] = flag
        if sub:
            os.environ["ZTFHE_PALLAS_SUB"] = str(sub)
        else:
            os.environ.pop("ZTFHE_PALLAS_SUB", None)
        f = jax.jit(lambda t, c: blind_rotate(t, c.testvec, c,
                                              params).ravel()[0])
        np.asarray(f(tlw, ck))
        ts = []
        for _ in range(iters):
            t0 = time.time()
            np.asarray(f(tlw, ck))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    prev = os.environ.get("ZTFHE_PALLAS")
    prev_sub = os.environ.get("ZTFHE_PALLAS_SUB")
    try:
        res = {}
        for name, flag, sub in [("xla", "0", 0), ("pallas", "1", 0),
                                ("sub2", "1", 2), ("sub4", "1", 4)]:
            res[name] = timed(flag, sub)
            print(f"# {name}: {res[name] * 1e3:.1f} ms/batch (B={B})",
                  file=sys.stderr)
    finally:
        for k, v in (("ZTFHE_PALLAS", prev), ("ZTFHE_PALLAS_SUB", prev_sub)):
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    steps = (params.n0 + 1) // 2
    print(json.dumps({
        "metric": "pallas_pipeline_probe",
        "batch": B,
        "ms_per_step_xla": round(res["xla"] / steps * 1e3, 4),
        "ms_per_step_sub2": round(res["sub2"] / steps * 1e3, 4),
        "ratio_pallas": round(res["pallas"] / res["xla"], 3),
        "ratio_sub2": round(res["sub2"] / res["xla"], 3),
        "ratio_sub4": round(res["sub4"] / res["xla"], 3),
    }))


if __name__ == "__main__":
    main()
