"""LUT / programmable bootstrapping (lut/ package analog + real
bootstrap_lut, which the reference documents but never shipped)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zig_tfhe_tpu import tlwe
from zig_tfhe_tpu.models import lut as L


def test_div_round():
    # generator.zig:337-356
    assert L.div_round(5, 2) == 3
    assert L.div_round(4, 2) == 2
    assert L.div_round(3, 2) == 2
    assert L.div_round(1, 2) == 1
    assert L.div_round(0, 2) == 0


def test_encoder_roundtrip():
    for m in [2, 4, 8, 32]:
        enc = L.Encoder.new(m)
        for x in range(m):
            assert enc.decode(enc.encode(x)) == x
    enc2 = L.Encoder.new(2)
    assert enc2.decode_bool(enc2.encode(1))
    assert not enc2.decode_bool(enc2.encode(0))


def test_generator_shapes(tiny):
    g = L.Generator.new(2, tiny)
    assert g.message_modulus == 2
    assert g.poly_degree == tiny.N
    assert g.lookup_table_size == tiny.N
    table = g.generate_lookup_table(lambda x: x)
    assert not table.is_empty()
    table.clear()
    assert table.is_empty()


def test_mod_switch_range(tiny):
    g = L.Generator.new(2, tiny)
    for x in [0, (1 << 31), (1 << 32) - 1]:
        assert 0 <= g.mod_switch(x) < g.lookup_table_size


@pytest.mark.parametrize("m,f", [
    (2, lambda x: x),            # identity
    (2, lambda x: 1 - x),        # NOT
    (4, lambda x: (x + 1) % 4),  # increment
    (4, lambda x: (x * 3) % 4),
    (8, lambda x: (x * x) % 8),  # square
])
def test_bootstrap_lut_exact(tiny, tiny_sk, tiny_ck, m, f):
    g = L.Generator.new(m, tiny)
    table = g.generate_lookup_table(f)
    msgs = jnp.arange(m)
    ct = tlwe.encrypt_message(jax.random.key(51), msgs, m, 0.0, tiny_sk.key_lv0)
    out = L.bootstrap_lut(ct, table, tiny_ck)
    dec = np.asarray(tlwe.decrypt_message(out, m, tiny_sk.key_lv0))
    assert np.array_equal(dec, np.array([f(x) for x in range(m)]))


def test_bootstrap_lut_per_lane_testvecs(tiny, tiny_sk, tiny_ck):
    # heterogeneous batch: lane 0 applies identity, lane 1 applies NOT
    m = 2
    g = L.Generator.new(m, tiny)
    tv = jnp.stack([g.generate_lookup_table(lambda x: x).as_jax(),
                    g.generate_lookup_table(lambda x: 1 - x).as_jax()])
    msgs = jnp.asarray([1, 1])
    ct = tlwe.encrypt_message(jax.random.key(52), msgs, m, 0.0, tiny_sk.key_lv0)
    out = L.bootstrap_lut(ct, tv, tiny_ck)
    dec = np.asarray(tlwe.decrypt_message(out, m, tiny_sk.key_lv0))
    assert list(dec) == [1, 0]


def test_generate_lookup_table_full(tiny, tiny_sk, tiny_ck):
    # full-control variant returning raw torus values (generator.zig:155-191)
    m = 2
    g = L.Generator.new(m, tiny)
    enc = L.Encoder.new(m)
    table = g.generate_lookup_table_full(lambda x: enc.encode(1 - x))
    ct = tlwe.encrypt_message(jax.random.key(53), jnp.arange(m), m, 0.0,
                              tiny_sk.key_lv0)
    out = L.bootstrap_lut(ct, table, tiny_ck)
    dec = np.asarray(tlwe.decrypt_message(out, m, tiny_sk.key_lv0))
    assert list(dec) == [1, 0]


def test_bootstrap_lut_m16_multilimb_digits():
    """m=16 LUT at TEST_TINY_UINT (bgbit=11 -> 2-limb digit path, basebit=4)."""
    import jax
    from zig_tfhe_tpu import params as P, key as K
    p = P.TEST_TINY_UINT
    assert p.digit_limbs == 2
    sk = K.SecretKey.generate(jax.random.key(200), p)
    ck = K.CloudKey.generate(jax.random.key(201), sk, p)
    m = 16
    g = L.Generator.new(m, p)
    f = lambda x: (x * x + 3) % m
    table = g.generate_lookup_table(f)
    msgs = jnp.arange(m)
    ct = tlwe.encrypt_message(jax.random.key(202), msgs, m, 0.0, sk.key_lv0)
    out = L.bootstrap_lut(ct, table, ck)
    dec = np.asarray(tlwe.decrypt_message(out, m, sk.key_lv0))
    assert np.array_equal(dec, np.array([f(x) for x in range(m)]))
