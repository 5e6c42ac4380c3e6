#!/usr/bin/env python
"""Sealed-bid auction on encrypted bids: max + per-bidder win bits.

The auctioneer never sees a bid: bidders submit FheUint ciphertexts,
the server computes the winning price with an encrypted max tree and
each bidder's "did I win" bit with encrypted equality — all exact
compositions of programmable bootstraps (models/integer.py).  Only the
final results decrypt.

Run (CPU, ~2 min):  JAX_PLATFORMS=cpu python examples/encrypted_auction_demo.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                 ".jax_cache"))

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

from zig_tfhe_tpu import key as K  # noqa: E402
from zig_tfhe_tpu import params as P  # noqa: E402
from zig_tfhe_tpu.models.integer import FheUint  # noqa: E402


def main():
    pname = sys.argv[1] if len(sys.argv) > 1 else "tiny_uint"
    params = P.PARAMS_BY_NAME[pname]
    bids = [23, 57, 41, 12]
    print(f"=== Encrypted sealed-bid auction on {pname}: bids {bids} ===\n")

    sk = K.SecretKey.generate(jax.random.key(0), params)
    ck = K.CloudKey.generate(jax.random.key(1), sk, params)

    cts = [FheUint.encrypt(jax.random.key(10 + i), b, 2, sk, ck)
           for i, b in enumerate(bids)]

    t0 = time.time()
    # max tree (2 levels for 4 bidders)
    m01 = cts[0].max(cts[1])
    m23 = cts[2].max(cts[3])
    winning = m01.max(m23)
    # per-bidder win bit: bid == winning price
    wins = [(c == winning) for c in cts]
    price = winning.decrypt(sk)
    flags = [int(w.decrypt(sk)) for w in wins]
    dt = time.time() - t0

    expected_price = max(bids)
    expected_flags = [int(b == expected_price) for b in bids]
    print(f"winning price: {price} (expected {expected_price})")
    print(f"win flags:     {flags} (expected {expected_flags})")
    ok = price == expected_price and flags == expected_flags
    print(f"-> {'OK' if ok else 'WRONG'} [{dt:.1f}s]")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
