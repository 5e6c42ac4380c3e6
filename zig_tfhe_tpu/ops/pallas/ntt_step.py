"""Fused Pallas kernels for the NTT blind-rotate step (group=2).

Two kernels, both on a (prime, batch-tile) grid — prime OUTER so the
[N, N]-scale transform matrices are fetched once per prime instead of once
per batch tile (the failure mode of the first fused-kernel attempt):

  K1 fwd+pointwise+rotate: digits tile -> forward NTT (2 int8 matmuls)
     -> barrett -> 3 pointwise external products vs the step's BSK
     residues -> (psi^t1-1)/(psi^t2-1) multi-bit rotation combine
     -> v residues.   Keeps d_hat/u/v in VMEM (the XLA path materializes
     ~75 MB of them per step).
  K2 inverse: v -> int8 limb split (in VMEM — the single hottest XLA
     fusion at ~120 us/step) -> concatenated-contraction matmuls
     -> barrett -> x_p residues.

CRT combine + accumulator add stay in XLA (tiny elementwise).
Everything is bit-exact vs ops/ntt.py (same barrett/bounds; tested).

STATUS: bit-exact but slower end-to-end than the XLA formulation.
Three designs were measured (all ZTFHE_PALLAS=1 gated):
  - two-kernel split (ntt_step_pallas): 2939 vs 4335 gates/s — v handoff
    + 2 launches/step;
  - single fused kernel (ntt_step_fused_pallas) with the VMEM limit
    raised to 100 MB, full per-prime matrix residency, tile 256:
    2642 vs 4504 gates/s at B=1536.
Root cause: XLA fuses every barrett/recombine epilogue INTO the matmul
loop nest, so its VPU work runs concurrently with the MXU *within* each
convolution fusion (the conv fusions measure 86-96% of int8 peak with
epilogues included); a hand-written kernel executes its matmul and
elementwise phases sequentially, and Mosaic does not software-pipeline
compute across grid steps (only DMA).  Beating XLA here would need
manually interleaved MXU/VPU phases over split tiles inside one grid
step — future work; the XLA path remains the default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zig_tfhe_tpu.ops.ntt import NTTPlan


def _scalar_tables(plan: NTTPlan):
    t = np.zeros((1, plan.n_primes), np.int32)
    f = np.zeros((1, plan.n_primes), np.float32)
    for i, p in enumerate(plan.primes):
        t[0, i] = p
        f[0, i] = np.float32(1.0 / p)
    return jnp.asarray(t), jnp.asarray(f)


def _k1(scal_ref, fscal_ref, dig_ref, flo_ref, fhi_ref, bsk_ref, r1_ref,
        r2_ref, v_ref, *, tile_b: int, N: int, R: int, row_group: int):
    p_idx = pl.program_id(0)
    p = scal_ref[0, p_idx]
    inv_p = fscal_ref[0, p_idx]

    def barrett(x):
        q = jnp.round(x.astype(jnp.float32) * inv_p).astype(jnp.int32)
        return x - q * p

    d8 = dig_ref[0].reshape(tile_b * R, N)              # int8
    lo = jax.lax.dot_general(d8, flo_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    hi = jax.lax.dot_general(d8, fhi_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    # digits <= Bg/2 <= 128 and fwd_hi <= p/512+1 -> lo + (hi<<8) < 2^31
    d_hat = barrett(lo + jax.lax.shift_left(hi, jnp.int32(8)))
    d_hat = d_hat.reshape(tile_b, R, N)                 # <= 0.52p

    kh = bsk_ref[0].astype(jnp.int32)                   # [3, R, 2, N]
    us = []
    for j in range(3):
        cs = []
        for c in range(2):
            acc = None
            for r0 in range(0, R, row_group):
                part = sum(d_hat[:, r] * kh[j, r, c]
                           for r in range(r0, min(r0 + row_group, R)))
                part = barrett(part)
                acc = part if acc is None else acc + part
            cs.append(barrett(acc))
        us.append(cs)

    d1 = r1_ref[0].astype(jnp.int32) - 1                # [tile_b, N]
    d2 = r2_ref[0].astype(jnp.int32) - 1
    d12 = barrett(d1 * d2)
    for c in range(2):
        r1c = barrett(d1 * us[0][c] + d2 * us[1][c])
        r2c = barrett(d12 * us[2][c])
        v_ref[0, :, c, :] = barrett(r1c + r2c)


def _k2(scal_ref, fscal_ref, v_ref, clo_ref, chi_ref, x_ref, *,
        tile_b: int, N: int):
    p_idx = pl.program_id(0)
    p = scal_ref[0, p_idx]
    inv_p = fscal_ref[0, p_idx]

    def barrett(x):
        q = jnp.round(x.astype(jnp.float32) * inv_p).astype(jnp.int32)
        return x - q * p

    v = v_ref[0].reshape(tile_b * 2, N)
    lo = ((v + 128) & 255) - 128
    hi = jax.lax.shift_right_arithmetic(v - lo, jnp.int32(8))
    limbs = jnp.concatenate([lo.astype(jnp.int8), hi.astype(jnp.int8)],
                            axis=-1)                    # [2*tile_b, 2N]
    z_lo = jax.lax.dot_general(limbs, clo_ref[0], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    z_hi = jax.lax.dot_general(limbs, chi_ref[0], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    y = z_lo + barrett(z_hi) * 256
    x_ref[0] = barrett(y).reshape(tile_b, 2, N)


def _k_fused(scal_ref, fscal_ref, dig_ref, flo_ref, fhi_ref, bsk_ref,
             r1_ref, r2_ref, clo_ref, chi_ref, x_ref, *,
             tile_b: int, N: int, R: int, row_group: int):
    """Whole step core for one (prime, batch-tile): forward NTT ->
    pointwise x3 -> rotation combine -> limb split -> inverse matmuls.
    Everything between the HBM reads (digits, bsk, rows, matrices) and the
    single HBM write (x_p) stays in VMEM."""
    p_idx = pl.program_id(0)
    p = scal_ref[0, p_idx]
    inv_p = fscal_ref[0, p_idx]

    def barrett(x):
        q = jnp.round(x.astype(jnp.float32) * inv_p).astype(jnp.int32)
        return x - q * p

    d8 = dig_ref[0].reshape(tile_b * R, N)
    lo = jax.lax.dot_general(d8, flo_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    hi = jax.lax.dot_general(d8, fhi_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    d_hat = barrett(lo + jax.lax.shift_left(hi, jnp.int32(8)))
    d_hat = d_hat.reshape(tile_b, R, N)

    kh = bsk_ref[0].astype(jnp.int32)                   # [3, R, 2, N]
    us = []
    for j in range(3):
        cs = []
        for c in range(2):
            acc = None
            for r0 in range(0, R, row_group):
                part = sum(d_hat[:, r] * kh[j, r, c]
                           for r in range(r0, min(r0 + row_group, R)))
                part = barrett(part)
                acc = part if acc is None else acc + part
            cs.append(barrett(acc))
        us.append(cs)

    d1 = r1_ref[0].astype(jnp.int32) - 1                # [tile_b, N]
    d2 = r2_ref[0].astype(jnp.int32) - 1
    d12 = barrett(d1 * d2)
    vs = []
    for c in range(2):
        r1c = barrett(d1 * us[0][c] + d2 * us[1][c])
        r2c = barrett(d12 * us[2][c])
        vs.append(barrett(r1c + r2c))
    v = jnp.stack(vs, axis=1).reshape(tile_b * 2, N)    # [2*tile_b, N]

    vlo = ((v + 128) & 255) - 128
    vhi = jax.lax.shift_right_arithmetic(v - vlo, jnp.int32(8))
    limbs = jnp.concatenate([vlo.astype(jnp.int8), vhi.astype(jnp.int8)],
                            axis=-1)                    # [2*tile_b, 2N]
    z_lo = jax.lax.dot_general(limbs, clo_ref[0], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    z_hi = jax.lax.dot_general(limbs, chi_ref[0], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    y = z_lo + barrett(z_hi) * 256
    x_ref[0] = barrett(y).reshape(tile_b, 2, N)


@functools.partial(jax.jit, static_argnames=("plan", "tile_b"))
def ntt_step_fused_pallas(digits_i8, bsk_g, rows1, rows2, plan: NTTPlan,
                          tile_b: int = 256):
    """Single-kernel group-2 step core: digits -> per-prime x residues.

    Same contract as ntt_step_pallas but one kernel per step (no v
    handoff) with the VMEM limit raised to use the chip's real capacity;
    the (prime, batch-tile) grid fetches each transform matrix once per
    prime."""
    B, R, N = digits_i8.shape
    Pn = plan.n_primes
    tile_b = min(tile_b, B)
    assert B % tile_b == 0, (B, tile_b)
    scal, fscal = _scalar_tables(plan)
    flo = jnp.asarray(np.stack(plan.fwd_lo))
    fhi = jnp.asarray(np.stack(plan.fwd_hi))
    clo = jnp.asarray(np.stack(plan.inv_cat_lo))
    chi = jnp.asarray(np.stack(plan.inv_cat_hi))
    bsk_t = jnp.swapaxes(bsk_g, 0, 1)                   # [P, 3, R, 2, N]
    group = min(plan.row_group(p) for p in plan.primes)

    return pl.pallas_call(
        functools.partial(_k_fused, tile_b=tile_b, N=N, R=R,
                          row_group=group),
        grid=(Pn, B // tile_b),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_b, R, N), lambda p, bt: (0, bt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda p, bt: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda p, bt: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, R, 2, N), lambda p, bt: (p, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, N), lambda p, bt: (p, bt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, N), lambda p, bt: (p, bt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * N, N), lambda p, bt: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * N, N), lambda p, bt: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_b, 2, N), lambda p, bt: (p, bt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pn, B, 2, N), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(scal, fscal, digits_i8[None], flo, fhi, bsk_t, rows1, rows2, clo, chi)


@functools.partial(jax.jit, static_argnames=("plan", "tile_b1", "tile_b2"))
def ntt_step_pallas(digits_i8, bsk_g, rows1, rows2, plan: NTTPlan,
                    tile_b1: int = 64, tile_b2: int = 128):
    """Fused group-2 step core: digits -> per-prime x residues.

    digits_i8: int8 [B, R, N] gadget digits of acc (R = 2L)
    bsk_g:     int16 [3, P, R, 2, N] (s1, s2, s1*s2 BSK residues)
    rows1/2:   int16 [P, B, N] gathered psi rows for t1 / t2
    Returns int32 [P, B, 2, N] residues (feed crt_combine).
    """
    B, R, N = digits_i8.shape
    Pn = plan.n_primes
    tile_b1 = min(tile_b1, B)
    tile_b2 = min(tile_b2, B)
    assert B % tile_b1 == 0 and B % tile_b2 == 0
    scal, fscal = _scalar_tables(plan)
    flo = jnp.asarray(np.stack(plan.fwd_lo))
    fhi = jnp.asarray(np.stack(plan.fwd_hi))
    clo = jnp.asarray(np.stack(plan.inv_cat_lo))
    chi = jnp.asarray(np.stack(plan.inv_cat_hi))
    bsk_t = jnp.swapaxes(bsk_g, 0, 1)                   # [P, 3, R, 2, N]
    group = min(plan.row_group(p) for p in plan.primes)

    v = pl.pallas_call(
        functools.partial(_k1, tile_b=tile_b1, N=N, R=R, row_group=group),
        grid=(Pn, B // tile_b1),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_b1, R, N), lambda p, bt: (0, bt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda p, bt: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda p, bt: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, R, 2, N), lambda p, bt: (p, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b1, N), lambda p, bt: (p, bt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b1, N), lambda p, bt: (p, bt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_b1, 2, N), lambda p, bt: (p, bt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pn, B, 2, N), jnp.int32),
    )(scal, fscal, digits_i8[None], flo, fhi, bsk_t, rows1, rows2)

    x = pl.pallas_call(
        functools.partial(_k2, tile_b=tile_b2, N=N),
        grid=(Pn, B // tile_b2),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_b2, 2, N), lambda p, bt: (p, bt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * N, N), lambda p, bt: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * N, N), lambda p, bt: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_b2, 2, N), lambda p, bt: (p, bt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pn, B, 2, N), jnp.int32),
    )(scal, fscal, v, clo, chi)
    return x
