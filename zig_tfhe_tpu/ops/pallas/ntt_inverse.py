"""Fused Pallas kernel: inverse NTT + CRT lift + accumulator add.

The XLA formulation materializes, per prime, the int32 residues, their two
int8 limb planes (a relayout-heavy split measured at ~120 us/step), four
matmul outputs, and the CRT partials — all through HBM.  This kernel keeps
one batch tile resident in VMEM across the whole chain:

    grid (B_tiles, P)  [P fastest]:
      v_p tile int32 -> limb split (VMEM) -> 4 int8 matmuls (MXU)
      -> barrett recombine -> x_p -> CRT accumulate (int32 wrap + f32 frac)
      on the last prime: delta = (sum - round(frac) * P_mod) << drop;
      out = acc + delta

Exactness matches ops/ntt.py:ntt_inverse_to_crt bit-for-bit (same barrett,
same CRT m-correction; the f32 error analysis in ops/ntt.py applies).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zig_tfhe_tpu.ops.ntt import NTTPlan


def _kernel(scal_ref, fscal_ref, v_ref, ilo_ref, ihi_ref, acc_ref, out_ref,
            sum_ref, frac_ref, *, n_primes: int, drop: int, tile_b: int,
            N: int):
    p_idx = pl.program_id(1)
    p = scal_ref[0, p_idx]               # prime
    c16r = scal_ref[1, p_idx]            # 2^16 mod p
    e_p = scal_ref[2, p_idx]             # CRT idempotent mod 2^32
    p_mod = scal_ref[3, 0]               # prod(primes) mod 2^32
    inv_p = fscal_ref[0, p_idx]
    theta = fscal_ref[1, p_idx]

    def barrett(x):
        q = jnp.round(x.astype(jnp.float32) * inv_p).astype(jnp.int32)
        return x - q * p

    v = v_ref[0].reshape(2 * tile_b, N)  # int32, |v| <= 0.55p
    # same split as the XLA path (exactness-critical; keep in sync)
    from zig_tfhe_tpu.ops.ntt import residue_limbs
    lo8, hi8 = residue_limbs(v)

    def dot8(a, m):
        return jax.lax.dot_general(
            a, m, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    ilo = ilo_ref[0]
    ihi = ihi_ref[0]
    p00 = dot8(lo8, ilo)
    p01 = dot8(lo8, ihi)
    p10 = dot8(hi8, ilo)
    p11 = dot8(hi8, ihi)
    r1 = barrett(p01 + p10)
    r2 = barrett(p11)
    y = p00 + r1 * 256 + barrett(r2 * c16r)
    x_p = barrett(y).reshape(tile_b, 2, N)

    @pl.when(p_idx == 0)
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        frac_ref[:] = jnp.zeros_like(frac_ref)

    sum_ref[:] += x_p * e_p              # wrapping int32 — exact mod 2^32
    frac_ref[:] += x_p.astype(jnp.float32) * theta

    @pl.when(p_idx == n_primes - 1)
    def _():
        m = jnp.round(frac_ref[:]).astype(jnp.int32)
        delta = sum_ref[:] - m * p_mod
        if drop:
            delta = jax.lax.shift_left(delta, jnp.int32(drop))
        out_ref[:] = acc_ref[:] + delta


def _scalar_tables(plan: NTTPlan):
    """int32 [4, P] (p, 2^16 mod p, e_p, P_mod) and f32 [2, P] (1/p, theta)."""
    P = plan.n_primes
    t = np.zeros((4, P), np.int32)
    f = np.zeros((2, P), np.float32)
    for i, p in enumerate(plan.primes):
        t[0, i] = p
        t[1, i] = (1 << 16) % p
        t[2, i] = plan.crt_e[i]
        f[0, i] = np.float32(1.0 / p)
        f[1, i] = np.float32(plan.crt_theta[i])
    t[3, 0] = plan.p_mod
    return t, f


@functools.partial(jax.jit, static_argnames=("plan", "drop", "tile_b"))
def ntt_inverse_to_crt_pallas(v_stack, acc, plan: NTTPlan, drop: int,
                              tile_b: int = 128):
    """v_stack int32 [P, B, 2, N] (per-prime residues, |.| <= 0.55p);
    acc int32 [B, 2, N].  Returns acc + (CRT(invNTT(v)) << drop)."""
    Pn = plan.n_primes
    B = acc.shape[0]
    N = plan.N
    tile_b = min(tile_b, B)
    assert B % tile_b == 0, (B, tile_b)
    inv_lo = jnp.asarray(np.stack(plan.inv_lo))   # [P, N, N] int8
    inv_hi = jnp.asarray(np.stack(plan.inv_hi))
    scal, fscal = _scalar_tables(plan)
    scal, fscal = jnp.asarray(scal), jnp.asarray(fscal)

    grid = (B // tile_b, Pn)
    return pl.pallas_call(
        functools.partial(_kernel, n_primes=Pn, drop=drop, tile_b=tile_b,
                          N=N),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_b, 2, N), lambda bt, p: (p, bt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda bt, p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda bt, p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 2, N), lambda bt, p: (bt, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, 2, N), lambda bt, p: (bt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, N), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_b, 2, N), jnp.int32),
            pltpu.VMEM((tile_b, 2, N), jnp.float32),
        ],
    )(scal, fscal, v_stack, inv_lo, inv_hi, acc)
