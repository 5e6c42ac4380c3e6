#!/usr/bin/env python
"""Microbenchmark of blind-rotation step components on the current device.

Times, per scan step at the given batch size:
  - toeplitz build (doubling rolls) of one BSK entry
  - negacyclic rotate of the accumulator (take_along_axis gather)
  - gadget decomposition
  - the int8 limb matmuls
  - one fused full step, and the full 700-step scan

Usage: BENCH_BATCH=1024 python bench_components.py [params]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from zig_tfhe_tpu import params as P
from zig_tfhe_tpu.ops import blind_rotate as BR
from zig_tfhe_tpu.ops import poly
from zig_tfhe_tpu.utils.profiling import time_op
from zig_tfhe_tpu.utils.torus import i32_to_i8_limbs

pname = sys.argv[1] if len(sys.argv) > 1 else "128bit"
params = P.PARAMS_BY_NAME[pname]
B = int(os.environ.get("BENCH_BATCH", "1024"))
N, L = params.N, params.L
rng = np.random.default_rng(0)

bsk_i = jnp.asarray(rng.integers(-128, 128, (4, 2 * L, 2, 2 * N)).astype(np.int8))
acc = jnp.asarray(rng.integers(-2**31, 2**31, (B, 2, N)).astype(np.int32))
a_col = jnp.asarray(rng.integers(-2**31, 2**31, B).astype(np.int32))
digits = jnp.asarray(rng.integers(-32, 32, (B, 2 * L * N)).astype(np.int8))
mats = jnp.asarray(rng.integers(-128, 128, (4, 2 * L * N, 2 * N)).astype(np.int8))


def report(name, fn, *args, flops=None):
    fj = jax.jit(fn)
    dt = time_op(fj, *args)
    extra = f"  ({flops/dt/1e12:.1f} TOPS)" if flops else ""
    print(f"{name:28s} {dt*1e3:8.3f} ms{extra}")
    return dt


print(f"device={jax.devices()[0]}, params={pname}, B={B}")
report("toeplitz build (1 step)", lambda b: BR._trgsw_matrices(b, params), bsk_i)
report("rotate acc", lambda a, k: poly.negacyclic_rotate(a, BR.modswitch(k, params)),
       acc, a_col)
report("decompose", lambda a: BR._decompose_to_rows(a, params), acc)
report("limb recode", lambda d: i32_to_i8_limbs(d, 1), acc)
mm_flops = 4 * 2 * B * (2 * L * N) * (2 * N)
report("4x limb matmul", lambda d, m: sum(
    jax.lax.dot_general(d, m[i], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    for i in range(4)), digits, mats, flops=mm_flops)


def one_step(acc, bsk_i, a_col):
    a_tilda = BR.modswitch(a_col, params)
    rotated = poly.negacyclic_rotate(acc, a_tilda)
    m = BR._trgsw_matrices(bsk_i, params)
    return acc + BR._external_product_from_mats(m, rotated - acc, params)


dt_step = report("one full step", one_step, acc, bsk_i, a_col)
print(f"=> projected scan ({params.n0} steps): {dt_step*params.n0*1e3:.0f} ms "
      f"-> {B/(dt_step*params.n0):.0f} gates/s")
