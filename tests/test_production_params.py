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
