"""Matmul-NTT engine: exactness oracles.

Mirrors the reference's FFT-vs-naive oracle pattern (fft.zig:695-714,
814-846): every transform path is checked against the schoolbook negacyclic
product, and the NTT external product is checked bit-exactly against the
independent Toeplitz-matmul engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zig_tfhe_tpu import params as P
from zig_tfhe_tpu import trgsw as T
from zig_tfhe_tpu.ops import ntt
from zig_tfhe_tpu.ops.blind_rotate import external_product
from zig_tfhe_tpu.ops.blind_rotate_ntt import external_product_ntt
from zig_tfhe_tpu.ops.poly import negacyclic_polymul_naive, negacyclic_rotate


@pytest.mark.parametrize("N,dbound", [(64, 32), (1024, 32), (1024, 128)])
def test_ntt_polymul_exact_vs_naive(N, dbound):
    bound_bits = (N.bit_length() - 1) + dbound.bit_length() + 32
    plan = ntt.make_plan(N, bound_bits)
    rng = np.random.default_rng(N + dbound)
    a = rng.integers(-dbound, dbound, (3, N)).astype(np.int32)
    b = rng.integers(-2**31, 2**31, N).astype(np.int32)
    a_hat = ntt.ntt_forward(jnp.asarray(a), plan, 1, dbound)
    b_hat = ntt.to_ntt_form(jnp.asarray(b), plan)
    prods = [ntt.barrett_reduce(a_hat[i] * b_hat[i].astype(jnp.int32), p)
             for i, p in enumerate(plan.primes)]
    c = np.asarray(ntt.ntt_inverse_to_crt(prods, plan))
    for k in range(a.shape[0]):
        assert np.array_equal(c[k], negacyclic_polymul_naive(a[k], b))


def test_rotate_diag_matches_coefficient_rotation():
    N = 64
    plan = ntt.make_plan(N, 6 + 6 + 2)
    rng = np.random.default_rng(7)
    a = rng.integers(-32, 32, (5, N)).astype(np.int32)
    t = rng.integers(0, 2 * N, 5).astype(np.int32)
    a_hat = ntt.ntt_forward(jnp.asarray(a), plan, 1, 32)
    r_hat = ntt.rotate_diag(a_hat, jnp.asarray(t), plan, minus_one=False)
    c = np.asarray(ntt.ntt_inverse_to_crt(r_hat, plan))
    ref = np.asarray(negacyclic_rotate(jnp.asarray(a), jnp.asarray(t)))
    assert np.array_equal(c, ref)


def test_external_product_ntt_matches_toeplitz(tiny):
    """drop=0 NTT extprod must agree bit-exactly with the Toeplitz engine."""
    rng = np.random.default_rng(11)
    trgsw_ct = jnp.asarray(
        rng.integers(-2**31, 2**31,
                     (2 * tiny.L, 2, tiny.N)).astype(np.int32))
    ct = jnp.asarray(
        rng.integers(-2**31, 2**31, (4, 2, tiny.N)).astype(np.int32))
    plan = ntt.plan_for_params(tiny, 0)
    t_ntt = ntt.to_ntt_form(trgsw_ct, plan)            # [P, 2L, 2, N]
    out_ntt = np.asarray(external_product_ntt(t_ntt, ct, tiny, 0))
    ext_limbs = T.to_ext_limbs(trgsw_ct, T.N_KLIMBS)
    out_toep = np.asarray(external_product(ext_limbs, ct, tiny))
    assert np.array_equal(out_ntt, out_toep)


def test_barrett_reduce_full_range():
    rng = np.random.default_rng(3)
    for p in (12289, 18433, 40961, 59393, 61441):
        v = np.concatenate([
            rng.integers(-2**31, 2**31 - 1, 4096),
            np.array([0, 1, -1, 2**31 - 1, -2**31, p, -p, p // 2, -(p // 2)]),
        ]).astype(np.int32)
        r = np.asarray(ntt.barrett_reduce(jnp.asarray(v), p)).astype(np.int64)
        assert np.all((r - v.astype(np.int64)) % p == 0)
        assert np.all(np.abs(r) <= 0.55 * p)


def test_plan_prime_products_cover_bounds():
    for name in ("128bit", "80bit", "uint4", "tiny"):
        params = P.PARAMS_BY_NAME[name]
        for drop in (0, ntt.default_drop_bits(params)):
            plan = ntt.plan_for_params(params, drop)
            prod = 1.0
            for p in plan.primes:
                prod *= p
            bound = (2 * (2 * params.L) * params.N
                     * (1 << (params.bgbit - 1)) * (1 << (31 - drop)))
            assert prod >= 4 * bound, (name, drop, plan.primes)


def test_crt_margin_at_worst_case_magnitudes(tiny):
    """Drive the external product to its integer-magnitude bound: all
    digits at -Bg/2 and keys at the centered extreme.  Any CRT m-rounding
    slip would corrupt the result by ~P (gigantic), so exact equality with
    the Toeplitz engine is a sharp probe of the P/4 margin."""
    import jax.numpy as jnp

    from zig_tfhe_tpu import trgsw as T
    from zig_tfhe_tpu.ops import ntt
    from zig_tfhe_tpu.ops.blind_rotate import external_product
    from zig_tfhe_tpu.ops.blind_rotate_ntt import external_product_ntt

    N, L = tiny.N, tiny.L
    # TRGSW rows all at the most-negative torus value (centered extreme)
    trgsw_ct = jnp.full((2 * L, 2, N), -(2**31), jnp.int32)
    # ciphertext whose gadget digits all hit -Bg/2: x = sum_l (-Bg/2) h_l
    dig = -(1 << (tiny.bgbit - 1))
    val = sum(dig * (1 << (32 - (i + 1) * tiny.bgbit))
              for i in range(L)) - tiny.decomposition_offset
    ct = jnp.full((2, 2, N), np.int32(np.uint32(val % (1 << 32)).view(np.int32)),
                  jnp.int32)
    plan = ntt.plan_for_params(tiny, 0)
    t_ntt = ntt.to_ntt_form(trgsw_ct, plan)
    out_ntt = np.asarray(external_product_ntt(t_ntt, ct, tiny, 0))
    out_toep = np.asarray(external_product(
        T.to_ext_limbs(trgsw_ct, T.N_KLIMBS), ct, tiny))
    assert np.array_equal(out_ntt, out_toep)
