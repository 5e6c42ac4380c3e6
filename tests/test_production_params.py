"""Opt-in slow tests at PRODUCTION parameter sets with real noise.

The regular suite exercises full pipelines at TEST_TINY (alpha=0, exact)
plus statistical paths at tiny scale; these tests run the real 80-bit and
uint4 configurations end-to-end.  NOTE: tests/conftest.py pins the CPU
backend for the whole pytest process, so under pytest these always run on
CPU (minutes); the TPU benches (bench.py, bench_lut.py) cover the same
configurations on hardware.  Opt in with ZTFHE_SLOW_TESTS=1.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zig_tfhe_tpu import key as K
from zig_tfhe_tpu import params as P
from zig_tfhe_tpu import tlwe
from zig_tfhe_tpu.models import gates as G
from zig_tfhe_tpu.models import lut as L

slow = pytest.mark.skipif(
    os.environ.get("ZTFHE_SLOW_TESTS", "") in ("", "0"),
    reason="set ZTFHE_SLOW_TESTS=1 to run production-parameter tests")


@slow
def test_80bit_nand_truth_table_real_noise():
    params = P.SECURITY_80_BIT
    sk = K.SecretKey.generate(jax.random.key(0), params)
    ck = K.CloudKey.generate(jax.random.key(1), sk, params)
    bits_a = jnp.asarray(np.array([0, 0, 1, 1], bool))
    bits_b = jnp.asarray(np.array([0, 1, 0, 1], bool))
    cta = tlwe.encrypt_bool(jax.random.key(2), bits_a,
                            params.tlwe_lv0.alpha, sk.key_lv0)
    ctb = tlwe.encrypt_bool(jax.random.key(3), bits_b,
                            params.tlwe_lv0.alpha, sk.key_lv0)
    out = G.gate("nand", cta, ctb, ck)
    dec = list(np.asarray(tlwe.decrypt_bool(out, sk.key_lv0)))
    assert dec == [True, True, True, False]


@slow
def test_uint4_lut_real_noise():
    params = P.SECURITY_UINT4
    m = 16
    f = lambda x: (x * 7 + 3) % m
    sk = K.SecretKey.generate(jax.random.key(4), params)
    ck = K.CloudKey.generate(jax.random.key(5), sk, params)
    table = L.Generator.new(m, params).generate_lookup_table(f)
    msgs = np.arange(m)
    ct = L.encrypt_message(jax.random.key(6), jnp.asarray(msgs), m,
                           params.tlwe_lv0.alpha, sk.key_lv0)
    out = L.bootstrap_lut(ct, table, ck)
    dec = [int(L.decrypt_message(out[i], m, sk.key_lv0)) for i in range(m)]
    assert dec == [f(x) for x in msgs]


@slow
@pytest.mark.parametrize("pname", ["uint1", "uint2", "uint6", "uint8"])
def test_uint_family_lut_real_noise(pname):
    """LUT bootstrap sweep across the multi-bit family (uint4 is covered
    above; this samples the rest of the range, including the large-Bg
    sets whose digit_limbs > 1 exercise the multi-limb forward NTT)."""
    params = P.PARAMS_BY_NAME[pname]
    m = 1 << params.security_bits  # uintN: messageModulus = 2^N
    probe = np.unique(np.linspace(0, m - 1, min(m, 8), dtype=np.int64))
    f = lambda x: (x * 5 + 1) % m
    sk = K.SecretKey.generate(jax.random.key(10), params)
    ck = K.CloudKey.generate(jax.random.key(11), sk, params)
    table = L.Generator.new(m, params).generate_lookup_table(f)
    ct = L.encrypt_message(jax.random.key(12), jnp.asarray(probe), m,
                           params.tlwe_lv0.alpha, sk.key_lv0)
    out = L.bootstrap_lut(ct, table, ck)
    dec = np.asarray(L.decrypt_message(out, m, sk.key_lv0))
    assert np.array_equal(dec, np.array([f(int(x)) for x in probe]))


@slow
def test_110bit_gate_truth_tables_real_noise():
    params = P.SECURITY_110_BIT
    sk = K.SecretKey.generate(jax.random.key(20), params)
    ck = K.CloudKey.generate(jax.random.key(21), sk, params)
    bits_a = jnp.asarray(np.array([0, 0, 1, 1], bool))
    bits_b = jnp.asarray(np.array([0, 1, 0, 1], bool))
    cta = tlwe.encrypt_bool(jax.random.key(22), bits_a,
                            params.tlwe_lv0.alpha, sk.key_lv0)
    ctb = tlwe.encrypt_bool(jax.random.key(23), bits_b,
                            params.tlwe_lv0.alpha, sk.key_lv0)
    for gname, expect in [("xor", [False, True, True, False]),
                          ("and", [False, False, False, True])]:
        out = G.gate(gname, cta, ctb, ck)
        assert list(np.asarray(tlwe.decrypt_bool(out, sk.key_lv0))) == expect
