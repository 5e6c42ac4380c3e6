"""Pallas TPU kernel: fused Toeplitz-build + int8 matmul external product.

The XLA path (ops/blind_rotate.py) materializes the per-step negacyclic
circulant operands in HBM (~100 MB per blind-rotate step at 128-bit) and
reads them back for the matmul.  This kernel builds each circulant tile in
VMEM with log2(N) `pltpu.roll` doublings and feeds the MXU directly:

  out[b, o*N+n] = sum_kl 2^(8*(kl+drop)) *
                  sum_{j,k} digits[b, j*N+k] * T_{kl,j,o}[k, n]

Grid: (B_tiles, n_kl * 2L); the output block is revisited across the inner
axis and accumulated in VMEM (zeroed on the first visit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zig_tfhe_tpu.params import SecurityParams
from zig_tfhe_tpu.trgsw import N_KLIMBS


def _kernel(bsk_ref, dig_ref, out_ref, *, N: int, rows_2l: int, drop: int):
    kj = pl.program_id(1)
    kl = kj // rows_2l

    @pl.when(kj == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ext = bsk_ref[0, 0]                    # [2, 2N] int8
    rows = ext[:, None, :]                 # [2, 1, 2N]
    s = 1
    while s < N:
        # static roll-right by s via slice+concat (Mosaic cannot lower
        # tpu.dynamic_rotate on int8 vectors, so pltpu.roll is off-limits)
        rolled = jnp.concatenate([rows[..., -s:], rows[..., :-s]], axis=2)
        rows = jnp.concatenate([rows, rolled], axis=1)
        s *= 2
    # rows[o, k, :] = roll(ext_o, k); circulant T_o = rows[o, :, :N]
    t_cat = jnp.concatenate([rows[0, :, :N], rows[1, :, :N]], axis=1)  # [N, 2N]
    part = jax.lax.dot_general(
        dig_ref[:], t_cat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    shift = (kl + drop) * 8
    out_ref[:] += jax.lax.shift_left(part, shift.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("params", "block_b"))
def extprod_matmul_pallas(digit_limb, bsk_ext_limbs, params: SecurityParams,
                          block_b: int = 512):
    """Single-digit-limb external-product matmul.

    digit_limb:    int8 [B, 2L*N] (one digit limb; bgbit<=8 params need one)
    bsk_ext_limbs: int8 [n_kl, 2L, 2, 2N]
    Returns int32 [B, 2N] == sum over key limbs of the shifted circulant
    matmuls (exact mod 2^32).
    """
    N, L = params.N, params.L
    B = digit_limb.shape[0]
    n_kl = bsk_ext_limbs.shape[0]
    drop = N_KLIMBS - n_kl
    rows_2l = 2 * L
    block_b = min(block_b, B)
    assert B % block_b == 0, (B, block_b)

    grid = (B // block_b, n_kl * rows_2l)
    return pl.pallas_call(
        functools.partial(_kernel, N=N, rows_2l=rows_2l, drop=drop),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 2, 2 * N), lambda bt, kj: (kj // rows_2l, kj % rows_2l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, N), lambda bt, kj: (bt, kj % rows_2l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, 2 * N), lambda bt, kj: (bt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2 * N), jnp.int32),
    )(bsk_ext_limbs, digit_limb)
