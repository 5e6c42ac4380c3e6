#!/usr/bin/env python
"""Pod-slice gate-throughput bench: the one-command runner for when
multi-chip hardware arrives (VERDICT r3 #8; this box has one chip, so
the script's acceptance gate is the 8-device CPU-mesh dry run below).

Per host (all hosts run the same command):

  ZTFHE_COORD=host0:8476 ZTFHE_NPROC=4 ZTFHE_PROC_ID=<i> \
      python tools/pod_bench.py

Single-host multi-device (a v5e-8 board, or the CPU dry run) needs no
env at all:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      BENCH_PARAMS=tiny python tools/pod_bench.py

What it does: initialize jax.distributed when ZTFHE_COORD is set,
broadcast the cloud key from process 0 (utils/serialization over a
shared path or per-host keygen from the same PRNG key — deterministic
keygen makes both bit-identical), build the global data mesh, shard the
gate batch over it, and report gates/s + scaling efficiency vs the
single-device baseline.  Keys are replicated (the only cross-chip
traffic); the batch axis rides ICI.  Prints ONE JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                 ".jax_cache"))

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from zig_tfhe_tpu import key as K  # noqa: E402
from zig_tfhe_tpu import params as P  # noqa: E402
from zig_tfhe_tpu import tlwe  # noqa: E402
from zig_tfhe_tpu.models import gates as G  # noqa: E402
from zig_tfhe_tpu.parallel import distributed as D  # noqa: E402
from zig_tfhe_tpu.parallel import mesh as M  # noqa: E402


def main():
    coord = os.environ.get("ZTFHE_COORD")
    multi_process = coord is not None
    if multi_process:
        D.initialize(coord, int(os.environ["ZTFHE_NPROC"]),
                     int(os.environ["ZTFHE_PROC_ID"]))
    pname = os.environ.get("BENCH_PARAMS", "128bit")
    params = P.PARAMS_BY_NAME[pname]
    n_dev = len(jax.devices())
    B_per_dev = int(os.environ.get("BENCH_BATCH_PER_DEV",
                                   "64" if params.N < 1024 else "2048"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    lead = not multi_process or jax.process_index() == 0

    # deterministic keygen: every process derives the SAME keys from the
    # same PRNG key (utils/rng is fully keyed), so no key wire transfer
    # is needed — each host materializes its replica locally and the
    # mesh replication is a no-op placement.
    sk = K.SecretKey.generate(jax.random.key(0), params)
    ck = K.CloudKey.generate(jax.random.key(1), sk, params)
    jax.block_until_ready(jax.tree_util.tree_leaves(ck))

    mesh = M.make_mesh()                   # all global devices, data axis
    rng = np.random.default_rng(0)
    B = B_per_dev * n_dev
    bits_a = jnp.asarray(rng.integers(0, 2, B).astype(bool))
    bits_b = jnp.asarray(rng.integers(0, 2, B).astype(bool))
    cta = tlwe.encrypt_bool(jax.random.key(2), bits_a,
                            params.tlwe_lv0.alpha, sk.key_lv0)
    ctb = tlwe.encrypt_bool(jax.random.key(3), bits_b,
                            params.tlwe_lv0.alpha, sk.key_lv0)
    if multi_process:
        ck_r = D.replicate_global(mesh, ck)
        cta = D.global_batch(mesh, D.local_shards(cta))
        ctb = D.global_batch(mesh, D.local_shards(ctb))
    else:
        ck_r = M.replicate(mesh, ck)
        cta, ctb = M.shard_batch(mesh, cta), M.shard_batch(mesh, ctb)

    fn = jax.jit(lambda a, b, k: G.gate("nand", a, b, k))

    def sync(x):
        jax.block_until_ready(x)
        np.asarray(jax.device_get(x[..., :1])) if not multi_process else None
        return x

    with mesh:
        out = sync(fn(cta, ctb, ck_r))
        if not multi_process:
            dec = np.asarray(tlwe.decrypt_bool(out, sk.key_lv0))
            acc = float((dec == ~(np.asarray(bits_a)
                                  & np.asarray(bits_b))).mean())
        else:
            acc = None                      # decrypt needs a gather; skip
        times = []
        for _ in range(iters):
            t0 = time.time()
            sync(fn(cta, ctb, ck_r))
            times.append(time.time() - t0)
    g = B / float(np.median(times))

    # single-device baseline for the efficiency figure (lead process)
    eff = None
    if n_dev > 1 and not multi_process:
        mesh1 = M.make_mesh(devices=jax.devices()[:1])
        ck1 = M.replicate(mesh1, ck)
        a1, b1 = (M.shard_batch(mesh1, cta[:B_per_dev]),
                  M.shard_batch(mesh1, ctb[:B_per_dev]))
        with mesh1:
            sync(fn(a1, b1, ck1))
            t0 = time.time()
            sync(fn(a1, b1, ck1))
            g1 = B_per_dev / (time.time() - t0)
        eff = g / (g1 * n_dev)

    if lead:
        print(json.dumps({
            "metric": f"pod_gates_per_s_{pname}_{n_dev}dev",
            "value": round(g, 2),
            "unit": "gates/s",
            "n_devices": n_dev,
            "n_processes": jax.process_count() if multi_process else 1,
            "efficiency": round(eff, 4) if eff is not None else None,
            "accuracy": acc,
        }))


if __name__ == "__main__":
    main()
