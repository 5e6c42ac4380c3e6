#!/usr/bin/env python
"""Benchmark: bootstrapped-gate throughput at 128-bit security on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "gates/s", "vs_baseline": N}

Baseline: the reference evaluates one bootstrapped gate in 37.31 ms on an
M-series core (CHANGELOG.md:86) => ~26.8 gates/s.  vs_baseline is our
batched gates/s divided by that.

Env knobs:
  BENCH_BATCH   gate batch per step (default 2048, the measured knee)
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


def _device_events_from_trace(trace_dir):
    """Parse the newest trace under trace_dir -> list of (start_us, dur_us)
    XLA-op events on device lanes.

    Lane selection: prefer tids whose thread_name matches 'XLA Ops' (the
    per-op device lane in TPU traces; module/step lanes overlap ops and
    would double-count), else fall back to every positive-duration X event
    that looks like an XLA op (trace_step.py heuristic)."""
    import glob
    import gzip

    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        return []
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    op_lanes = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tname = (ev.get("args", {}) or {}).get("name", "")
            if "XLA Ops" in tname:
                op_lanes.add((ev.get("pid"), ev.get("tid")))
    out = []
    for ev in events:
        if ev.get("ph") != "X" or float(ev.get("dur", 0)) <= 0:
            continue
        name = ev.get("name", "")
        if not name or name.startswith("$"):
            continue
        if op_lanes and (ev.get("pid"), ev.get("tid")) not in op_lanes:
            continue
        out.append((float(ev.get("ts", 0.0)), float(ev["dur"])))
    return out


def _traced_device_ms(fn, sync, *args):
    """Device-side duration of one call of fn: the SPAN (last end - first
    start) of its XLA-op events — the direct measurement of on-device
    latency, independent of the ~25 ms host tunnel floor (VERDICT r2 asked
    for this in place of the floor-subtraction estimate)."""
    import tempfile

    d = tempfile.mkdtemp(prefix="ztfhe_bench_trace_")
    jax.profiler.start_trace(d)
    sync(fn(*args))
    jax.profiler.stop_trace()
    evs = _device_events_from_trace(d)
    if not evs:
        return None
    t0 = min(ts for ts, _ in evs)
    t1 = max(ts + dur for ts, dur in evs)
    return (t1 - t0) / 1e3


def _gate_int8_macs(params, group, levels, n_primes=3):
    """Analytic int8 MAC count of one bootstrapped gate through the NTT
    engine (forward limb matmuls + concatenated-contraction inverse),
    for the MXU-utilization estimate.  Per step: forward R rows x 2 limb
    matrices x P primes x N^2 MACs; inverse 2 components x 2 limb
    matrices x P x (2N * N).  The initial testvec rotation adds one
    4-limb forward + inverse (~2 steps' worth); key switching's int8
    matmul adds N1*t*(n0+1) * 2 per gate (small)."""
    la, lb = levels
    R = la + lb
    N = params.N
    steps = -(-params.n0 // group)
    fwd = R * 2 * n_primes * N * N
    inv = 2 * 2 * n_primes * 2 * N * N
    rot0 = (4 + 2 * 2) * 2 * n_primes * N * N
    ks = params.n1 * params.iks_t * (params.n0 + 1) * 2
    return steps * (fwd + inv) + rot0 + ks


def main():
    B = int(os.environ.get("BENCH_BATCH", "2048"))  # measured sweet spot (r3)
    iters = int(os.environ.get("BENCH_ITERS", "4"))
    pname = os.environ.get("BENCH_PARAMS", "128bit")
    params = P.PARAMS_BY_NAME[pname]

    drop = os.environ.get("BENCH_DROP")
    # default: the per-set measured-fastest group (ops/ntt.py:default_group)
    group = os.environ.get("BENCH_GROUP")
    group = int(group) if group else None
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

    # analytic MXU utilization: int8 MACs/gate (algorithm-derived, see
    # _gate_int8_macs) x measured gates/s vs the chip's int8 peak — makes
    # the chip-transfer claim auditable (v5p ~2.3x peak => same-util
    # projection).  Peak override: BENCH_PEAK_INT8_TOPS for non-v5e.
    try:
        n_pr = ck.bsk_ntt.shape[2] if ck.bsk_group > 1 else ck.bsk_ntt.shape[1]
        macs = _gate_int8_macs(params, ck.bsk_group, ck.bsk_levels, n_pr)
        peak = float(os.environ.get("BENCH_PEAK_INT8_TOPS", "394")) * 1e12
        util = gates_per_s * macs * 2.0 / peak
        result["int8_util_pct"] = round(100 * util, 1)
        print(f"# int8 MXU utilization (analytic MACs x measured rate): "
              f"{100*util:.1f}% of {peak/1e12:.0f} Tops", file=sys.stderr)
    except Exception as e:  # never fail the bench for the diagnostic
        print(f"# int8_util unavailable: {e}", file=sys.stderr)

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
            # profiler-measured on-device duration (span of the call's
            # XLA-op events): the direct latency number, no tunnel-floor
            # subtraction involved
            try:
                dev = _traced_device_ms(nand_fn, _sync, ca, cb)
                if dev is not None:
                    result[f"latency_ms_device_b{bl}"] = round(dev, 2)
                    print(f"# latency DEVICE B={bl}: {dev:.2f} ms "
                          f"(trace-measured)", file=sys.stderr)
            except Exception as e:
                print(f"# device-trace latency unavailable: {e}",
                      file=sys.stderr)
        result["dispatch_floor_ms"] = round(floor_ms, 2)

    # Mosaic toolchain tripwire (VERDICT r2 #8): the in-tree fused Pallas
    # step kernel is a measured loser on today's Mosaic VPU codegen
    # (docs/ROADMAP.md phase ablation); time it against the XLA step each
    # bench run so a toolchain jump is NOTICED, not assumed away.  The
    # fused kernel needs a bgbit<=6 single-limb config, so this probes a
    # small bg6/(3,2) group-2 key at B=256.  BENCH_TRIPWIRE=0 skips.
    if os.environ.get("BENCH_TRIPWIRE", "1") not in ("0", "false"):
        try:
            import dataclasses as _dc

            from zig_tfhe_tpu.ops.blind_rotate import blind_rotate as _br

            ckp = K.CloudKey.generate_no_ksk(params, group=2,
                                             decomp_levels=(3, 2),
                                             engine_bgbit=params.bgbit)
            rng = np.random.default_rng(0)
            ckp = _dc.replace(ckp, bsk_ntt=jnp.asarray(rng.integers(
                -30000, 30000, ckp.bsk_ntt.shape).astype(np.int16)))
            tlw = jnp.asarray(rng.integers(
                -2**31, 2**31, (256, params.n0 + 1)).astype(np.int32))

            def timed_mode(flag):
                os.environ["ZTFHE_PALLAS"] = flag
                f = jax.jit(lambda t, c: _br(t, c.testvec, c, params).ravel()[0])
                np.asarray(f(tlw, ckp))          # compile + fence
                ts = []
                for _ in range(3):
                    t0 = time.time()
                    np.asarray(f(tlw, ckp))
                    ts.append(time.time() - t0)
                return float(np.median(ts))

            prev = os.environ.get("ZTFHE_PALLAS")
            try:
                t_xla = timed_mode("0")
                t_pal = timed_mode("1")
            finally:
                # restore on ALL paths: a raise mid-probe must not leave
                # the rest of the process pinned to a mode (ADVICE r3 #5)
                if prev is None:
                    os.environ.pop("ZTFHE_PALLAS", None)
                else:
                    os.environ["ZTFHE_PALLAS"] = prev
            ratio = t_pal / t_xla
            result["pallas_vs_xla_step_ratio"] = round(ratio, 2)
            print(f"# mosaic tripwire: fused Pallas step = {ratio:.2f}x the "
                  f"XLA step ({t_pal*1e3:.0f} vs {t_xla*1e3:.0f} ms at B=256, "
                  f"bg6 group-2); < 1.0 would mean the toolchain improved — "
                  f"re-evaluate ops/pallas (ROADMAP watch item)",
                  file=sys.stderr)
        except Exception as e:
            print(f"# mosaic tripwire unavailable: {e}", file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
