"""Parameter-set sanity (params.zig:431-466 analog)."""

import numpy as np

from zig_tfhe_tpu import params as P


def test_all_sets_sane():
    for p in P.ALL_PARAMS:
        assert p.tlwe_lv0.n > 0
        assert p.tlwe_lv1.n > 0
        assert p.tlwe_lv0.alpha > 0.0
        assert p.tlwe_lv1.alpha > 0.0
        assert p.trgsw_lv1.l > 0
        assert p.trgsw_lv1.bgbit > 0
        assert p.trgsw_lv1.bg == 1 << p.trgsw_lv1.bgbit
        assert p.N == 1 << p.nbit
        assert p.basebit * p.iks_t < 32
        assert p.bgbit * p.L <= 32


def test_constants_match_reference():
    assert P.SECURITY_80_BIT.security_bits == 80
    assert P.SECURITY_110_BIT.security_bits == 110
    assert P.SECURITY_128_BIT.security_bits == 128
    assert P.SECURITY_UINT1.security_bits == 1
    assert P.SECURITY_UINT5.security_bits == 5
    assert P.SECURITY_UINT8.security_bits == 8
    # 128-bit set values (params.zig:350-378)
    p = P.SECURITY_128_BIT
    assert (p.n0, p.N, p.bgbit, p.L, p.basebit, p.iks_t) == (700, 1024, 6, 3, 2, 9)
    assert p.tlwe_lv0.alpha == 2.0e-5 and p.tlwe_lv1.alpha == 2.0e-8
    assert P.DEFAULT_SECURITY is P.SECURITY_128_BIT


def test_decomposition_offset_128bit():
    # offset = sum_i 32 * 2^(32-6(i+1)) for L=3 (key.zig:121-131)
    p = P.SECURITY_128_BIT
    expected = (32 * (1 << 26) + 32 * (1 << 20) + 32 * (1 << 14)) % (1 << 32)
    assert p.decomposition_offset == expected


def test_digit_limbs():
    assert P.SECURITY_128_BIT.digit_limbs == 1   # bgbit=6
    assert P.SECURITY_UINT1.digit_limbs == 2     # bgbit=10
    assert P.SECURITY_UINT3.digit_limbs == 3     # bgbit=23


def test_security_info():
    assert "128" in P.security_info(P.SECURITY_128_BIT)
