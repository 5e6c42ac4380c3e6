"""Deterministic keyed randomness for encryption.

The reference seeds every encryption from an atomic-counter/nanotime hash
(utils.zig:16-22), so ciphertexts are NOT reproducible run-to-run and no
golden vectors are possible.  Here all randomness flows from
``jax.random`` keys: same key -> same ciphertext, enabling cross-run test
vectors while remaining cryptographically keyed (threefry) per encryption.

Noise model: gaussian noise on the torus is ``round(normal() * alpha * 2^32)``
added mod 2^32 (utils.zig:85-92 does f64ToTorus(sample) + mu; for
|sample| << 1 both formulations agree to the integer rounding convention,
which is absorbed by the noise distribution itself).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TWO32 = float(1 << 32)


def uniform_torus(key, shape):
    """Uniform torus elements as int32 bit patterns."""
    bits = jax.random.bits(key, shape, dtype=jnp.uint32)
    return jax.lax.bitcast_convert_type(bits, jnp.int32)


def uniform_binary(key, shape):
    """Uniform {0,1} secret-key bits as int32 (key.zig:49-54)."""
    return jax.random.bernoulli(key, 0.5, shape).astype(jnp.int32)


def gaussian_torus(key, shape, alpha: float):
    """Gaussian torus noise with stddev ``alpha`` (of the torus), as int32.

    Computed in float32: stddev alpha*2^32 <= ~2^17 for all parameter sets,
    far below f32's exact-integer range, so rounding error is sub-ulp of the
    noise itself.  alpha == 0 yields exactly zero noise (used by TEST_TINY).
    """
    if alpha == 0.0:
        return jnp.zeros(shape, jnp.int32)
    n = jax.random.normal(key, shape, dtype=jnp.float32)
    scaled = n * jnp.float32(alpha * _TWO32)
    return jnp.round(scaled).astype(jnp.int32)


def split_many(key, n: int):
    return list(jax.random.split(key, n))
