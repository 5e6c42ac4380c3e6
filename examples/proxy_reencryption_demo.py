#!/usr/bin/env python
"""Proxy re-encryption demo: Alice -> Bob -> Carol delegation chain.

Port-equivalent of examples/proxy_reencryption_demo.zig: public-key
generation timing, batched re-encryption of messages, a 3-hop chain, and an
accuracy report — batch-first (all messages re-encrypted in one matmul).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from zig_tfhe_tpu import key as K, params as P, tlwe
from zig_tfhe_tpu.models import proxy_reenc as PR


def main():
    params = P.PARAMS_BY_NAME[sys.argv[1]] if len(sys.argv) > 1 else P.SECURITY_128_BIT
    print("=== LWE Proxy Re-encryption Demo (TPU-native) ===\n")

    alice = K.SecretKey.generate(jax.random.key(0), params)
    bob = K.SecretKey.generate(jax.random.key(1), params)
    carol = K.SecretKey.generate(jax.random.key(2), params)

    t0 = time.time()
    bob_pk = PR.PublicKeyLv0.generate(jax.random.key(3), bob.key_lv0, params)
    jax.block_until_ready(bob_pk.encryptions)
    print(f"Public key generation: {(time.time()-t0)*1000:.1f} ms")

    t0 = time.time()
    rk_ab = PR.ProxyReencryptionKey.new_asymmetric(
        jax.random.key(4), alice.key_lv0, bob_pk, params)
    jax.block_until_ready(rk_ab.key_encryptions)
    print(f"Asymmetric re-enc keygen (Alice->Bob): {(time.time()-t0)*1000:.1f} ms")

    t0 = time.time()
    rk_bc_sym = PR.ProxyReencryptionKey.new_symmetric(
        jax.random.key(5), bob.key_lv0, carol.key_lv0, params)
    jax.block_until_ready(rk_bc_sym.key_encryptions)
    print(f"Symmetric re-enc keygen (Bob->Carol): {(time.time()-t0)*1000:.1f} ms")

    # batched re-encryption of many messages at once
    n_msgs = 256
    bits = jnp.asarray(np.random.default_rng(0).integers(0, 2, n_msgs).astype(bool))
    ct_alice = tlwe.encrypt_bool(jax.random.key(6), bits, params.tlwe_lv0.alpha,
                                 alice.key_lv0)
    t0 = time.time()
    ct_bob = PR.reencrypt(ct_alice, rk_ab)
    jax.block_until_ready(ct_bob)
    dt = time.time() - t0
    acc_bob = float((np.asarray(tlwe.decrypt_bool(ct_bob, bob.key_lv0))
                     == np.asarray(bits)).mean())
    print(f"\nRe-encrypted {n_msgs} messages Alice->Bob in {dt*1000:.1f} ms "
          f"({dt*1e6/n_msgs:.1f} us/msg), accuracy {acc_bob*100:.1f}%")

    ct_carol = PR.reencrypt(ct_bob, rk_bc_sym)
    acc_carol = float((np.asarray(tlwe.decrypt_bool(ct_carol, carol.key_lv0))
                       == np.asarray(bits)).mean())
    print(f"3-hop chain Alice->Bob->Carol accuracy: {acc_carol*100:.1f}%")
    if acc_carol < 0.9:
        sys.exit(1)


if __name__ == "__main__":
    main()
