"""zig_tfhe_tpu — a TPU-native TFHE framework (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of thedonutfactory/zig-tfhe for
TPU hardware: batch-first ciphertext arrays, exact mod-2^32 arithmetic via
signed int8-limb matmuls on the MXU (no float FFT), one-matmul key
switching, lax.scan blind rotation, and mesh sharding over the gate batch.

Quick start::

    import jax
    from zig_tfhe_tpu import params, key, models

    sk = key.SecretKey.generate(jax.random.key(0), params.SECURITY_128_BIT)
    ck = key.CloudKey.generate(jax.random.key(1), sk, params.SECURITY_128_BIT)
    ...
"""

from zig_tfhe_tpu import params
from zig_tfhe_tpu import utils
from zig_tfhe_tpu import ops
from zig_tfhe_tpu import tlwe
from zig_tfhe_tpu import trlwe
from zig_tfhe_tpu import trgsw
from zig_tfhe_tpu import key
from zig_tfhe_tpu import bootstrap
from zig_tfhe_tpu import models
from zig_tfhe_tpu import parallel

__version__ = "0.5.0"


def get_info() -> dict:
    """Library info (main.zig:85-97 analog)."""
    import jax

    return {
        "name": "zig_tfhe_tpu",
        "version": __version__,
        "backend": jax.default_backend(),
        "devices": len(jax.devices()),
        "default_security": params.DEFAULT_SECURITY.name,
    }


def print_info() -> None:
    for k, v in get_info().items():
        print(f"{k}: {v}")
