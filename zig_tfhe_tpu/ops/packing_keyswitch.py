"""TLWE -> TRLWE packing key switch (the tree-PBS enabler).

No reference analog: the reference has only the lv1->lv0 identity key
switch (trgsw.zig:471-502) and evaluates nothing above message modulus 16
(everything is comptime-pinned to the 128-bit boolean set,
params.zig:386-416).  Packing K TLWE(lv1) samples into ONE TRLWE — sample
k's message landing on coefficient k*delta — is what lets an encrypted
small-modulus index SELECT among K encrypted values with a single blind
rotation (models/lut.py:bootstrap_lut_radix), the standard route to
message moduli beyond the N=1024 modswitch capacity (docs/NOISE.md §8).

TPU-first: the whole pack is one int8-limb matmul (the identity-key-switch
kernel, ops/keyswitch.py) plus K static negacyclic rotations; the
block-spread multiply is one NTT round trip against a static window
polynomial.

Security note: the packing key encrypts lv1-key digit multiples UNDER the
lv1 key itself — the standard LWE-to-RLWE packing assumption (same
circular flavor as every TFHE bootstrapping-key/KSK cycle; see
docs/NOISE.md "Multi-bit key assumption" for the library's posture).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from zig_tfhe_tpu import trlwe as _trlwe
from zig_tfhe_tpu.ops import ntt as _ntt
from zig_tfhe_tpu.ops.decomposition import ks_decompose
from zig_tfhe_tpu.ops.keyswitch import ks_plaintexts
from zig_tfhe_tpu.ops.poly import negacyclic_rotate, small_matmul_torus
from zig_tfhe_tpu.params import SecurityParams


def gen_packing_ksk(key, secret_key_lv1, params: SecurityParams,
                    basebit: int | None = None, t: int | None = None,
                    alpha: float | None = None):
    """Packing key-switch key: int32 [n1*t, 2, N].

    Row (i*t + j) is a TRLWE encryption (under the SAME lv1 key) of the
    constant polynomial with coefficient 0 equal to
    ``s1[i] * 2^(32-(j+1)*basebit)`` — the shared key-switch row encoding
    (ops/keyswitch.py:ks_plaintexts) lifted to ring ciphertexts.

    alpha defaults to the LV1 noise (params.bsk_alpha): the rows are
    TRLWE encryptions under the lv1 key, the same assumption as the
    bootstrapping key's rows.  (The lv0-calibrated ksk_alpha would be
    dimensionally wrong here — at uint4 it measurably blows the packed
    testvec's budget once the block spread multiplies it by sqrt(delta).)
    """
    if params.torus_bits != 32:
        raise NotImplementedError(
            "the packing key switch (and the tree-PBS/radix routes built "
            "on it) is 32-bit-torus only: its digit contraction and "
            "exactness bounds (docs/NOISE.md §9) are specific to the "
            "32-bit plans.  64-bit sets cover the same ground with "
            "single-shot LUTs through m=32 (measured all-exact, "
            "docs/TORUS64.md §9) and the classic digit-multiply path; "
            "TORUS64.md §5 prices a 64-bit radix route 2.5x worse than "
            "the 32-bit one anyway")
    basebit = params.basebit if basebit is None else basebit
    t = params.iks_t if t is None else t
    alpha = params.bsk_alpha if alpha is None else alpha
    n1, N = params.n1, params.N
    vals = ks_plaintexts(secret_key_lv1, basebit, t)       # [n1, t]
    mu = jnp.zeros((n1, t, N), jnp.int32).at[:, :, 0].set(vals)
    ct = _trlwe.encrypt_torus(key, mu, float(alpha), secret_key_lv1)
    return ct.reshape(n1 * t, 2, N)


def packing_key_switch(tlwes, pksk, basebit: int, t: int, delta: int):
    """Pack TLWE(lv1) samples k onto coefficients k*delta of one TRLWE.

    tlwes: int32 [..., K, n1+1] (lv1 samples, e.g. bootstrap_to_lv1
           outputs); pksk: int32 [n1*t, 2, N] from gen_packing_ksk.
    Returns int32 [..., 2, N] whose phase is
    ``sum_k message_k * X^(k*delta)`` (+ key-switch noise elsewhere).

    out = sum_k X^(k*delta) * ((0, b_k) - sum_ij digit_kij * PKSK[ij]);
    the digit contraction is one exact int8-limb matmul over all K
    samples, the rotations are static (K is a Python int).
    """
    if tlwes.dtype == jnp.int64:
        raise NotImplementedError(
            "packing key switch is 32-bit-torus only (its decompose and "
            "digit contraction assume int32 carriers) — see gen_packing_ksk")
    n1 = tlwes.shape[-1] - 1
    N = pksk.shape[-1]
    K = tlwes.shape[-2]
    half_base = 1 << (basebit - 1)
    digits = ks_decompose(tlwes[..., :n1], basebit, t)     # [..., K, n1, t]
    d = digits.reshape(digits.shape[:-2] + (n1 * t,))
    u = small_matmul_torus(d, pksk.reshape(n1 * t, 2 * N), half_base)
    u = u.reshape(u.shape[:-1] + (2, N))                   # [..., K, 2, N]
    base = (-u).at[..., 1, 0].add(tlwes[..., n1])
    out = None
    for k in range(K):
        term = negacyclic_rotate(base[..., k, :, :], (k * delta) % (2 * N))
        out = term if out is None else out + term
    return out


@functools.lru_cache(maxsize=None)
def _window_poly(N: int, delta: int) -> np.ndarray:
    """W(X) = X^(-delta/2) * (1 + X + ... + X^(delta-1)) as centered
    int8 negacyclic coefficients: +1 on [0, delta/2), -1 on [N - delta/2, N)
    (negative exponents wrap with the X^N = -1 sign)."""
    w = np.zeros(N, np.int8)
    w[: delta // 2] = 1
    w[N - delta // 2:] = -1
    return w


def spread_blocks(packed, delta: int, params: SecurityParams):
    """Multiply a packed TRLWE by the centered block window W(X).

    Each point mass at k*delta becomes a constant block of width delta
    CENTERED on k*delta — exactly the bin structure a Generator testvec
    has, so a blind rotation over a modulus-(N/delta) index decodes it
    with the full delta/2 phase margin.  Exact mod 2^32 via one NTT round
    trip: |true conv| <= delta * 2^31 <= 2^40 at delta <= 512, covered by
    the bound-41 plan (P = 2^47.09 > 4 * 2^41).
    """
    assert delta & (delta - 1) == 0 and delta >= 2, delta
    # the exactness argument above requires |conv| <= delta * 2^31 <= 2^40,
    # i.e. delta <= 512 = N/2 at N=1024 (m_hi = 1 would give delta = N and
    # a 2^41 bound — still under P/4 but outside the documented contract;
    # ADVICE r3 #2 asked the code to enforce the bound the comment proves)
    assert delta <= params.N // 2, (delta, params.N)
    plan = _ntt.make_plan(params.N, 41)
    w = jnp.asarray(_window_poly(params.N, delta))
    p_hat = _ntt.ntt_forward(packed, plan, digit_limbs=4, digit_bound=128)
    w_hat = _ntt.ntt_forward(w, plan, digit_limbs=1, digit_bound=1)
    v_hat = [_ntt.barrett_reduce(p_hat[i] * w_hat[i], p)
             for i, p in enumerate(plan.primes)]
    return _ntt.ntt_inverse_to_crt(v_hat, plan)


def pack_tlwes_blocks(tlwes, m_hi: int, pksk, params: SecurityParams,
                      basebit: int | None = None, t: int | None = None):
    """Pack K = m_hi TLWE(lv1) samples into a blind-rotation testvec.

    Sample k's message occupies the delta = N/m_hi coefficient block
    centered on k*delta; the result is a (noisy) TRLWE usable directly as
    a per-lane testvec for a blind rotation over a modulus-m_hi input.
    tlwes: int32 [..., m_hi, n1+1] -> int32 [..., 2, N].
    """
    basebit = params.basebit if basebit is None else basebit
    t = params.iks_t if t is None else t
    N = params.N
    assert N % m_hi == 0, (N, m_hi)
    delta = N // m_hi
    packed = packing_key_switch(tlwes, pksk, basebit, t, delta)
    return spread_blocks(packed, delta, params)
