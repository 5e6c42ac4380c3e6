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


def uniform_torus(key, shape, width: int = 32):
    """Uniform torus elements as int32 (width=32) / int64 (width=64) bit
    patterns.  64-bit draws need jax_enable_x64 (utils.torus.require_width
    gives the loud error at the parameter-set boundary)."""
    if width == 64:
        bits = jax.random.bits(key, shape, dtype=jnp.uint64)
        return jax.lax.bitcast_convert_type(bits, jnp.int64)
    bits = jax.random.bits(key, shape, dtype=jnp.uint32)
    return jax.lax.bitcast_convert_type(bits, jnp.int32)


def uniform_binary(key, shape):
    """Uniform {0,1} secret-key bits as int32 (key.zig:49-54)."""
    return jax.random.bernoulli(key, 0.5, shape).astype(jnp.int32)


def gaussian_torus(key, shape, alpha: float, width: int = 32):
    """Gaussian torus noise with stddev ``alpha`` (of the torus), as the
    width's carrier dtype.

    Computed in float32: at width 32 every set's stddev alpha*2^32 <= ~2^17
    sits below f32's exact-integer range (rounding error sub-ulp of the
    noise).  At width 64 large absolute stddevs (e.g. lv0 alpha ~2^-15 of
    the torus -> 2^49) exceed 2^24, so samples quantize to f32 ulps —
    a RELATIVE 2^-24 perturbation of each sample, statistically invisible
    against the noise itself (the distribution's tail bounds are what
    matters, not low-bit entropy).  alpha == 0 yields exactly zero noise.
    """
    dtype = jnp.int32 if width == 32 else jnp.int64
    if alpha == 0.0:
        return jnp.zeros(shape, dtype)
    n = jax.random.normal(key, shape, dtype=jnp.float32)
    scaled = n * jnp.float32(alpha * float(1 << width))
    return jnp.round(scaled).astype(dtype)


def split_many(key, n: int):
    return list(jax.random.split(key, n))
