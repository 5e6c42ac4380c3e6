#!/usr/bin/env python
"""Add Two Numbers — homomorphic 16-bit addition (402 + 304 = 706).

Port-equivalent of examples/add_two_numbers.zig, batch-first: stage-1 gates
of the adder run as single batched bootstraps, and a Kogge-Stone variant
shows the TPU-native log-depth carry (use --adder=kogge).

Usage:
  python examples/add_two_numbers.py [--params 128bit] [--adder kogge|ripple]
  (use --params tiny for a fast exact CPU run)
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from zig_tfhe_tpu import key as K, params as P
from zig_tfhe_tpu.models import circuits as C, gates as G


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="128bit", choices=sorted(P.PARAMS_BY_NAME))
    ap.add_argument("--adder", default="kogge", choices=["kogge", "ripple"])
    ap.add_argument("--a", type=int, default=402)
    ap.add_argument("--b", type=int, default=304)
    args = ap.parse_args()
    params = P.PARAMS_BY_NAME[args.params]

    print("=== TFHE Add Two Numbers (TPU-native) ===\n")
    t0 = time.time()
    print("Generating keys...")
    sk = K.SecretKey.generate(jax.random.key(0), params)
    ck = K.CloudKey.generate(jax.random.key(1), sk, params)
    jax.block_until_ready(jax.tree_util.tree_leaves(ck))
    print(f"Keys generated in {time.time()-t0:.1f}s\n")

    a, b = args.a, args.b
    expected = (a + b) % (1 << 16)
    print(f"A = {a}, B = {b}, expected sum = {expected}")

    ct_a = C.encrypt_bits(jax.random.key(2), a, 16, sk, params)
    ct_b = C.encrypt_bits(jax.random.key(3), b, 16, sk, params)

    t0 = time.time()
    if args.adder == "kogge":
        ct_sum, _ = C.kogge_stone_add(ct_a, ct_b, ck)
        rounds = 2 + 2 * 4  # 1 pg + 4 doubling rounds (xor+and / or) + sum xor
    else:
        cin = G.constant(False, params, batch=(1,))
        ct_sum, _ = C.ripple_carry_add(ct_a, ct_b, cin, ck)
        rounds = 1 + 2 * 16
    jax.block_until_ready(ct_sum)
    dt = time.time() - t0

    result = C.decrypt_bits(ct_sum, sk)
    print(f"\nHomomorphic sum = {result}  ({'OK' if result == expected else 'WRONG'})")
    print(f"Adder: {args.adder}, ~{rounds} batched bootstrap rounds, "
          f"{dt*1000:.0f} ms total ({dt*1000/rounds:.0f} ms/round incl. compile)")
    if result != expected:
        sys.exit(1)


if __name__ == "__main__":
    main()
