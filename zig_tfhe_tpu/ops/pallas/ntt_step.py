"""Fused Pallas kernel for the NTT blind-rotate step (group=2).

One kernel per scan step on a (prime, batch-tile) grid — prime OUTER so
the [N, N]-scale transform matrices are fetched once per prime.  Per grid
step the whole chain runs in VMEM: forward NTT (2 int8 matmuls) ->
barrett -> 3 pointwise external products vs the step's BSK residues ->
(psi^t1-1)/(psi^t2-1) multi-bit rotation combine -> residue limb split ->
concatenated-contraction inverse matmuls -> per-prime x residues.  The
CRT combine + accumulator add stay in XLA (tiny elementwise).

Bit-exact vs the ops/ntt.py XLA path (same barrett and bounds; see
tests/test_ntt.py::test_fused_step_kernel_matches_xla, which runs the
kernel in interpreter mode).

STATUS: flag-gated experiment (ZTFHE_PALLAS=1), SLOWER end-to-end than
the XLA formulation.  Two designs were measured on a v5e:
  - an earlier two-kernel split (since removed): 2939 vs 4335 gates/s —
    intermediate handoff through HBM + 2 launches/step;
  - this single fused kernel with the VMEM limit raised to 100 MB (the
    chip's real capacity; the 16 MB scoped default was the first
    attempt's constraint), full per-prime matrix residency, tile 256:
    2642 vs 4504 gates/s at B=1536.
Root cause: XLA fuses every barrett/recombine epilogue INTO the matmul
loop nests, so its VPU work runs concurrently with the MXU *within* each
convolution fusion (the conv fusions measure 86-96% of int8 peak with
epilogues included); a handwritten kernel executes its matmul and
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


def _make_barrett(p, inv_p):
    def barrett(x):
        q = jnp.round(x.astype(jnp.float32) * inv_p).astype(jnp.int32)
        return x - q * p
    return barrett


def _fwd_pointwise_rotate(barrett, d8, flo, fhi, kh, r1, r2, *,
                          tile_b, N, R, row_group):
    """digits tile -> v residues for one prime (all in VMEM).

    d8 int8 [tile_b*R, N]; flo/fhi int8 [N, N]; kh int32 [3, R, 2, N];
    r1/r2 int32 [tile_b, N] (raw psi rows).  Returns int32 [2*tile_b, N].
    """
    lo = jax.lax.dot_general(d8, flo, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    hi = jax.lax.dot_general(d8, fhi, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    # digits <= Bg/2 <= 32 and fwd_hi <= p/512+1 -> lo + (hi<<8) < 2^31
    d_hat = barrett(lo + jax.lax.shift_left(hi, jnp.int32(8)))
    d_hat = d_hat.reshape(tile_b, R, N)

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

    d1 = r1 - 1
    d2 = r2 - 1
    d12 = barrett(d1 * d2)
    vs = []
    for c in range(2):
        r1c = barrett(d1 * us[0][c] + d2 * us[1][c])
        r2c = barrett(d12 * us[2][c])
        vs.append(barrett(r1c + r2c))
    return jnp.stack(vs, axis=1).reshape(tile_b * 2, N)


def _inverse_residues(barrett, v, clo, chi, *, tile_b, N):
    """v residues -> x_p for one prime via the concatenated contraction.

    v int32 [2*tile_b, N] (|v| <= 0.55p); clo/chi int8 [2N, N].
    Returns int32 [tile_b, 2, N].
    """
    # same split as the XLA path (exactness-critical; keep in sync)
    from zig_tfhe_tpu.ops.ntt import residue_limbs
    lo8, hi8 = residue_limbs(v)
    limbs = jnp.concatenate([lo8, hi8], axis=-1)        # [2*tile_b, 2N]
    z_lo = jax.lax.dot_general(limbs, clo, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    z_hi = jax.lax.dot_general(limbs, chi, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    y = z_lo + barrett(z_hi) * 256
    return barrett(y).reshape(tile_b, 2, N)


def _k_fused(scal_ref, fscal_ref, dig_ref, flo_ref, fhi_ref, bsk_ref,
             r1_ref, r2_ref, clo_ref, chi_ref, x_ref, *,
             tile_b: int, N: int, R: int, row_group: int):
    p_idx = pl.program_id(0)
    barrett = _make_barrett(scal_ref[0, p_idx], fscal_ref[0, p_idx])
    v = _fwd_pointwise_rotate(
        barrett, dig_ref[0].reshape(tile_b * R, N), flo_ref[0], fhi_ref[0],
        bsk_ref[0].astype(jnp.int32),
        r1_ref[0].astype(jnp.int32), r2_ref[0].astype(jnp.int32),
        tile_b=tile_b, N=N, R=R, row_group=row_group)
    x_ref[0] = _inverse_residues(barrett, v, clo_ref[0], chi_ref[0],
                                 tile_b=tile_b, N=N)


@functools.partial(jax.jit, static_argnames=("plan", "tile_b", "interpret"))
def ntt_step_fused_pallas(digits_i8, bsk_g, rows1, rows2, plan: NTTPlan,
                          tile_b: int = 256, interpret: bool = False):
    """Fused group-2 step core: digits -> per-prime x residues.

    digits_i8: int8 [B, R, N] gadget digits of acc (R = 2L)
    bsk_g:     int16 [3, P, R, 2, N] (s1, s2, s1*s2 BSK residues)
    rows1/2:   int16 [P, B, N] gathered psi rows for t1 / t2
    Returns int32 [P, B, 2, N] residues (feed crt_combine).
    """
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
        interpret=interpret,
    )(scal, fscal, digits_i8[None], flo, fhi, bsk_t, rows1, rows2, clo, chi)
