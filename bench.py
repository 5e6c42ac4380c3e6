#!/usr/bin/env python
"""Benchmark: bootstrapped-gate throughput at 128-bit security on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "gates/s", "vs_baseline": N}

Baseline: the reference evaluates one bootstrapped gate in 37.31 ms on an
M-series core (CHANGELOG.md:86) => ~26.8 gates/s.  vs_baseline is our
batched gates/s divided by that.

Env knobs:
  BENCH_BATCH   gate batch per step (default 1024)
  BENCH_ITERS   timed iterations (default 4)
  BENCH_PARAMS  parameter set name (default 128bit)
"""

import json
import os
import sys
import time

# persistent compilation cache: repeat runs skip the (remote, slow) compiles
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import jax

# honor an explicit CPU request (sitecustomize force-registers the axon
# TPU platform; config update after import is the reliable pin)
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from zig_tfhe_tpu import key as K
from zig_tfhe_tpu import params as P
from zig_tfhe_tpu import tlwe
from zig_tfhe_tpu.models import gates as G

REFERENCE_GATES_PER_S = 1000.0 / 37.31  # CHANGELOG.md:86


def main():
    B = int(os.environ.get("BENCH_BATCH", "1536"))  # measured sweet spot
    iters = int(os.environ.get("BENCH_ITERS", "4"))
    pname = os.environ.get("BENCH_PARAMS", "128bit")
    params = P.PARAMS_BY_NAME[pname]

    drop = os.environ.get("BENCH_DROP")
    group = int(os.environ.get("BENCH_GROUP", "2"))  # 4 favors B=1 latency
    t0 = time.time()
    sk = K.SecretKey.generate(jax.random.key(0), params)
    ck = K.CloudKey.generate(jax.random.key(1), sk, params, group=group,
                             ntt_drop=int(drop) if drop else None)
    # force completion (block_until_ready does not block on axon)
    np.asarray(jax.tree_util.tree_leaves(ck)[1].ravel()[:1])
    print(f"# keygen (cold, incl jit compile): {time.time()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    ck_w = K.CloudKey.generate(jax.random.key(4), sk, params, group=group,
                               ntt_drop=int(drop) if drop else None)
    np.asarray(jax.tree_util.tree_leaves(ck_w)[1].ravel()[:1])
    print(f"# keygen (warm): {(time.time()-t0)*1e3:.0f} ms "
          f"(reference: ~30 s observed, key.zig:240-241)", file=sys.stderr)
    del ck_w

    bits_a = jnp.asarray(np.random.default_rng(0).integers(0, 2, B).astype(bool))
    bits_b = jnp.asarray(np.random.default_rng(1).integers(0, 2, B).astype(bool))
    cta = tlwe.encrypt_bool(jax.random.key(2), bits_a, params.tlwe_lv0.alpha, sk.key_lv0)
    ctb = tlwe.encrypt_bool(jax.random.key(3), bits_b, params.tlwe_lv0.alpha, sk.key_lv0)

    nand_jit = jax.jit(lambda a, b, k: G.gate("nand", a, b, k))
    nand_fn = lambda a, b: nand_jit(a, b, ck)

    def _sync(x):
        # NOTE: on the axon TPU platform block_until_ready does not actually
        # block; a host readback is the only reliable fence.
        np.asarray(x[..., 0])
        return x

    t0 = time.time()
    out = _sync(nand_fn(cta, ctb))
    print(f"# compile+first run: {time.time()-t0:.1f}s", file=sys.stderr)

    # correctness gate: decrypts must match the NAND truth table
    dec = np.asarray(tlwe.decrypt_bool(out, sk.key_lv0))
    expected = ~(np.asarray(bits_a) & np.asarray(bits_b))
    acc = float((dec == expected).mean())
    print(f"# accuracy: {acc:.4f}", file=sys.stderr)

    times = []
    for _ in range(iters):
        t0 = time.time()
        out = _sync(nand_fn(cta, ctb))
        times.append(time.time() - t0)
    dt = float(np.median(times))
    gates_per_s = B / dt
    print(f"# median step: {dt*1e3:.1f} ms for {B} gates "
          f"({dt/B*1e3:.3f} ms/gate)", file=sys.stderr)

    result = {
        "metric": f"bootstrapped_gates_per_s_{pname}_batch{B}",
        "value": round(gates_per_s, 2),
        "unit": "gates/s",
        "vs_baseline": round(gates_per_s / REFERENCE_GATES_PER_S, 2),
        "accuracy": acc,
    }

    # single-gate / small-batch p50 latency (BASELINE.json names this
    # metric; reference single gate = 37.31 ms, CHANGELOG.md:86).  The
    # axon tunnel adds a ~25 ms dispatch+readback floor to EVERY call;
    # report it alongside so on-device latency is reconstructable.
    # BENCH_LATENCY=0 skips (two extra jit shapes => two tunnel compiles).
    if os.environ.get("BENCH_LATENCY", "1") not in ("0", "false"):
        floor_jit = jax.jit(lambda x: x.ravel()[0] + 1)
        _sync2 = lambda x: np.asarray(x)
        _sync2(floor_jit(cta))
        fts = []
        for _ in range(10):
            t0 = time.time()
            _sync2(floor_jit(cta))
            fts.append(time.time() - t0)
        floor_ms = float(np.median(fts)) * 1e3
        for bl in (1, 16):
            ca, cb = cta[:bl], ctb[:bl]
            _sync(nand_fn(ca, cb))         # compile
            lts = []
            for _ in range(10):
                t0 = time.time()
                _sync(nand_fn(ca, cb))
                lts.append(time.time() - t0)
            p50 = float(np.median(lts)) * 1e3
            result[f"latency_ms_p50_b{bl}"] = round(p50, 2)
            print(f"# latency p50 B={bl}: {p50:.1f} ms "
                  f"(incl. ~{floor_ms:.1f} ms tunnel floor; reference "
                  f"single gate 37.31 ms)", file=sys.stderr)
        result["dispatch_floor_ms"] = round(floor_ms, 2)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
