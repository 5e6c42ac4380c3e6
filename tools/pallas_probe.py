#!/usr/bin/env python
"""Measure the fused Pallas step kernel variants against the XLA step.

VERDICT r3 #2: attempt the manually MXU/VPU-interleaved fused step
(ops/pallas/ntt_step.py:_k_fused_pipelined) and ship a measured ms/step
row either way.  Probes the bg6/(3,2) group-2 config the kernel supports
(the fused path needs Bg/2 <= 32; same config as bench.py's Mosaic
tripwire) at several batch sizes and sub-tile depths.

Usage (TPU): python tools/pallas_probe.py [B ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                 ".jax_cache"))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from zig_tfhe_tpu import key as K
from zig_tfhe_tpu import params as P
from zig_tfhe_tpu.ops.blind_rotate import blind_rotate


def timed(fn, tlw, ckp, iters=3):
    f = jax.jit(lambda t, c: blind_rotate(t, c.testvec, c, P.SECURITY_128_BIT)
                .ravel()[0])
    np.asarray(f(tlw, ckp))                   # compile + fence
    ts = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(f(tlw, ckp))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    params = P.SECURITY_128_BIT
    bs = [int(a) for a in sys.argv[1:]] or [256, 1024]
    ckp = K.CloudKey.generate_no_ksk(params, group=2, decomp_levels=(3, 2),
                                     engine_bgbit=params.bgbit)
    rng = np.random.default_rng(0)
    ckp = dataclasses.replace(ckp, bsk_ntt=jnp.asarray(rng.integers(
        -30000, 30000, ckp.bsk_ntt.shape).astype(np.int16)))
    steps = -(-params.n0 // 2)
    for B in bs:
        tlw = jnp.asarray(rng.integers(-2**31, 2**31,
                                       (B, params.n0 + 1)).astype(np.int32))
        rows = []
        for label, env in (("xla", {"ZTFHE_PALLAS": "0"}),
                           ("fused", {"ZTFHE_PALLAS": "1",
                                      "ZTFHE_PALLAS_SUB": "0"}),
                           ("pipe2", {"ZTFHE_PALLAS": "1",
                                      "ZTFHE_PALLAS_SUB": "2"}),
                           ("pipe4", {"ZTFHE_PALLAS": "1",
                                      "ZTFHE_PALLAS_SUB": "4"})):
            os.environ.update(env)
            try:
                dt = timed(blind_rotate, tlw, ckp)
                rows.append((label, dt))
                print(f"B={B} {label:6s}: {dt*1e3:8.1f} ms total, "
                      f"{dt/steps*1e3:6.3f} ms/step", flush=True)
            except Exception as e:           # noqa: BLE001 - probe tool
                print(f"B={B} {label:6s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
        os.environ["ZTFHE_PALLAS"] = "0"
        os.environ.pop("ZTFHE_PALLAS_SUB", None)


if __name__ == "__main__":
    main()
