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


def _k_fused_pipelined(scal_ref, fscal_ref, dig_ref, flo_ref, fhi_ref,
                       bsk_ref, r1_ref, r2_ref, clo_ref, chi_ref, x_ref, *,
                       tile_b: int, N: int, R: int, row_group: int,
                       sub: int):
    """The VERDICT r3 #2 experiment: manually interleaved MXU/VPU phases
    over ``sub`` split sub-tiles inside ONE grid step.

    The fused kernel's measured loss is Mosaic executing the matmul and
    elementwise phases strictly sequentially (module STATUS block); XLA
    wins because its conv fusions run the barrett/recombine VPU chains
    concurrently with the MXU *inside* each loop nest.  This variant
    restructures the same math as a software pipeline so that, at every
    point of the instruction stream, an MXU matmul of sub-tile k sits
    adjacent to the independent VPU chain of sub-tile k-1 — if Mosaic's
    scheduler (or the hardware's issue overlap) can run the units
    concurrently at all, this exposes it; if the step time does not move
    vs _k_fused, the sequential-phase hypothesis is confirmed at the
    instruction level too (ledger either way).

    Bit-exact: identical arithmetic to _k_fused, only reordered.
    """
    p_idx = pl.program_id(0)
    barrett = _make_barrett(scal_ref[0, p_idx], fscal_ref[0, p_idx])
    ts = tile_b // sub
    kh = bsk_ref[0].astype(jnp.int32)
    flo, fhi = flo_ref[0], fhi_ref[0]
    clo, chi = clo_ref[0], chi_ref[0]
    dig = dig_ref[0]

    from zig_tfhe_tpu.ops.ntt import residue_limbs

    def fwd_mxu(k):                                     # MXU phase A
        d8 = dig[k * ts:(k + 1) * ts].reshape(ts * R, N)
        lo = jax.lax.dot_general(d8, flo, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        hi = jax.lax.dot_general(d8, fhi, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        return lo, hi

    def vpu_chain(k, lo, hi):                           # VPU phase B
        d_hat = barrett(lo + jax.lax.shift_left(hi, jnp.int32(8)))
        d_hat = d_hat.reshape(ts, R, N)
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
        r1 = r1_ref[0, k * ts:(k + 1) * ts].astype(jnp.int32)
        r2 = r2_ref[0, k * ts:(k + 1) * ts].astype(jnp.int32)
        d1, d2 = r1 - 1, r2 - 1
        d12 = barrett(d1 * d2)
        vs = []
        for c in range(2):
            r1c = barrett(d1 * us[0][c] + d2 * us[1][c])
            r2c = barrett(d12 * us[2][c])
            vs.append(barrett(r1c + r2c))
        v = jnp.stack(vs, axis=1).reshape(ts * 2, N)
        lo8, hi8 = residue_limbs(v)                     # VPU phase C
        return jnp.concatenate([lo8, hi8], axis=-1)     # [2*ts, 2N]

    def inv_mxu(limbs):                                 # MXU phase D
        z_lo = jax.lax.dot_general(limbs, clo, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        z_hi = jax.lax.dot_general(limbs, chi, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        return z_lo, z_hi

    def finish_vpu(z_lo, z_hi):                         # VPU phase E
        return barrett(z_lo + barrett(z_hi) * 256).reshape(ts, 2, N)

    # software pipeline: at every step one MXU phase is adjacent to the
    # PREVIOUS sub-tile's independent VPU phase
    fwd = [None] * sub
    limbs = [None] * sub
    zz = [None] * sub
    for k in range(sub):
        fwd[k] = fwd_mxu(k)                 # MXU(k)
        if k > 0:
            limbs[k - 1] = vpu_chain(k - 1, *fwd[k - 1])   # VPU(k-1)
    limbs[sub - 1] = vpu_chain(sub - 1, *fwd[sub - 1])
    for k in range(sub):
        zz[k] = inv_mxu(limbs[k])           # MXU(k)
        if k > 0:
            x_ref[0, (k - 1) * ts:k * ts] = finish_vpu(*zz[k - 1])  # VPU(k-1)
    x_ref[0, (sub - 1) * ts:] = finish_vpu(*zz[sub - 1])


@functools.partial(jax.jit, static_argnames=("plan", "tile_b", "interpret",
                                             "pipeline_sub"))
def ntt_step_fused_pallas(digits_i8, bsk_g, rows1, rows2, plan: NTTPlan,
                          tile_b: int = 256, interpret: bool = False,
                          pipeline_sub: int = 0):
    """Fused group-2 step core: digits -> per-prime x residues.

    digits_i8: int8 [B, R, N] gadget digits of acc (R = 2L)
    bsk_g:     int16 [3, P, R, 2, N] (s1, s2, s1*s2 BSK residues)
    rows1/2:   int16 [P, B, N] gathered psi rows for t1 / t2
    Returns int32 [P, B, 2, N] residues (feed crt_combine).

    pipeline_sub > 1 selects the manually MXU/VPU-interleaved variant
    (_k_fused_pipelined) with that many sub-tiles; 0/1 is the plain
    fused kernel.  ZTFHE_PALLAS_SUB sets it for the blind-rotate path.
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

    if pipeline_sub and pipeline_sub > 1:
        assert tile_b % pipeline_sub == 0, (tile_b, pipeline_sub)
        kernel = functools.partial(_k_fused_pipelined, tile_b=tile_b, N=N,
                                   R=R, row_group=group, sub=pipeline_sub)
    else:
        kernel = functools.partial(_k_fused, tile_b=tile_b, N=N, R=R,
                                   row_group=group)
    return pl.pallas_call(
        kernel,
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
