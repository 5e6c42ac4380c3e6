"""Encrypted radix integer arithmetic on programmable bootstraps.

Multi-digit homomorphic add/mul built purely from the LUT machinery
(models/lut.py) — a capability layer the reference does not have (its
multi-bit parameter sets exist but nothing ever composes them;
SURVEY.md §2 #10 notes even bootstrapLut is missing there).

Representation: little-endian base-8 digits, each digit a PBS message
with modulus 16.  The factor-2 headroom makes every intermediate fit the
message space exactly:

  * add:   digit + digit + carry <= 15        (one PBS splits mod/div 8)
  * mul:   a digit product x*y (x,y < 8) is computed EXACTLY via the
           packing trick  w = x + 8*bit_k(y) <= 15 : a single univariate
           LUT of w recovers (w mod 8) * (w div 8) * 2^k = x*y_k*2^k,
           pre-split into its low/high base-8 parts; three bit-planes +
           two carry normalizations assemble the 2-digit product.

All heterogeneous LUT lanes of a round run as ONE batched bootstrap
(per-lane testvecs, models/lut.py:bootstrap_lut), so the sequential
depth is small: an add is 1 PBS round per digit; a digit mul is 5 PBS
rounds.  Rounds that apply several LUTs to the SAME input (mod/div of a
sum, the three bit-planes, each partial product's lo/hi split) use
multi-value bootstrapping (models/lut.py:bootstrap_multi_lut): one blind
rotation serves all the round's LUTs, halving the dominant cost of both
add (2 LUT lanes -> 1 rotation per digit) and mul (14 lanes -> 7
rotations); ZTFHE_NO_MULTIVALUE=1 restores plain per-lane bootstraps.
Every step is exact (no message-capacity rounding), verified
digit-for-digit in tests/test_integer.py.

Works on any parameter set whose PBS is reliable at m=16 (uint4,
TEST_TINY_UINT; see docs/NOISE.md §8 for the capacity analysis).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from zig_tfhe_tpu import tlwe as _tlwe
from zig_tfhe_tpu.key import CloudKey
from zig_tfhe_tpu.models import lut as L
from zig_tfhe_tpu.params import SecurityParams

BASE = 8          # radix of the encrypted integers
M = 16            # PBS message modulus per digit (headroom factor 2)


# ---------------------------------------------------------------------------
# LUT bank (static per parameter set)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _luts(params: SecurityParams):
    gen = L.Generator.new(M, params)
    bank = {
        "mod": gen.generate_lookup_table(lambda t: t % BASE),
        "div": gen.generate_lookup_table(lambda t: t // BASE),
    }
    for k in range(3):  # BASE = 2^3 bit-planes
        # outputs 8*bit directly so the packing add w = x + bits8 never
        # scales a ciphertext (scalar-multiplying a PBS output by 8 would
        # amplify its noise 8x and break real-noise parameter sets)
        bank[f"bit{k}"] = gen.generate_lookup_table(
            lambda y, k=k: 8 * ((y >> k) & 1))
        # w = x + 8*b packs (x, b); the LUT returns x*b*2^k split base-8
        bank[f"pp{k}lo"] = gen.generate_lookup_table(
            lambda w, k=k: ((w % 8) * (w // 8) << k) % BASE)
        bank[f"pp{k}hi"] = gen.generate_lookup_table(
            lambda w, k=k: ((w % 8) * (w // 8) << k) // BASE)
    return bank


def _pbs(cts, table_names, ck: CloudKey):
    """One batched heterogeneous bootstrap: lane i of ``cts`` [B, n0+1]
    gets the LUT named table_names[i] (a single shared name is allowed)."""
    bank = _luts(ck.params)
    if isinstance(table_names, str):
        tv = bank[table_names].as_jax()
    else:
        tv = jnp.stack([bank[n].as_jax() for n in table_names])
    return L.bootstrap_lut(cts, tv, ck)


def _pbs_rows(rows, table_names, ck: CloudKey):
    """Batched multi-lane bootstrap: rows [L, ..., n0+1], one LUT per lane
    broadcast over the batch dims.  Returns [L, ..., n0+1].

    This is the batch-first workhorse: ALL lanes of ALL batch elements run
    as one bootstrap (the per-gate cost amortizes to the ~0.2 ms/op batched
    rate instead of one scan per value)."""
    bank = _luts(ck.params)
    Lanes = rows.shape[0]
    batch = rows.shape[1:-1]
    n1 = rows.shape[-1]
    B = int(np.prod(batch)) if batch else 1
    flat = rows.reshape(Lanes * B, n1)
    tv = jnp.stack([bank[n].as_jax() for n in table_names])    # [L, 2, N]
    tv = jnp.repeat(tv, B, axis=0)                             # [L*B, 2, N]
    out = L.bootstrap_lut(flat, tv, ck)
    return out.reshape((Lanes,) + batch + (n1,))


def _use_mv() -> bool:
    """Multi-value bootstrapping for the shared-input LUT rounds (default
    on; ZTFHE_NO_MULTIVALUE=1 forces one blind rotation per lane)."""
    import os
    return os.environ.get("ZTFHE_NO_MULTIVALUE", "") not in ("1", "true")


@functools.lru_cache(maxsize=None)
def _factored(params: SecurityParams, name: str):
    return L.factor_lut(_luts(params)[name], M)


def _pbs_mv(ct, table_names, ck: CloudKey):
    """K LUTs of the SAME input for one blind rotation (multi-value
    bootstrap, models/lut.py:bootstrap_multi_lut): ct [..., n0+1] ->
    [K, ..., n0+1].  Falls back to one-rotation-per-lane when disabled."""
    if not _use_mv():
        rows = jnp.broadcast_to(ct[None], (len(table_names),) + ct.shape)
        return _pbs_rows(rows, table_names, ck)
    batch = ct.shape[:-1]
    B = int(np.prod(batch)) if batch else 1
    flat = ct.reshape(B, ct.shape[-1])
    bank = _luts(ck.params)
    out = L.bootstrap_multi_lut(flat, [bank[n] for n in table_names], M, ck)
    return out.reshape((len(table_names),) + batch + (ct.shape[-1],))


def _pbs_mv_groups(rows, name_groups, ck: CloudKey):
    """Grouped multi-value bootstrap: rows [G, ..., n0+1]; group g's input
    feeds the K LUTs named in name_groups[g].  ONE blind rotation over the
    flattened G*B batch (shared T0 testvec), then per-group factored
    applies.  Returns [G, K, ..., n0+1] (K equal across groups)."""
    from zig_tfhe_tpu import trlwe as _trlwe
    from zig_tfhe_tpu.ops.blind_rotate import blind_rotate
    from zig_tfhe_tpu.ops.keyswitch import identity_key_switch

    G = rows.shape[0]
    K = len(name_groups[0])
    assert all(len(g) == K for g in name_groups), name_groups
    if not _use_mv():
        flat_names = [n for g in name_groups for n in g]
        rep = jnp.repeat(rows, K, axis=0)          # [G*K, ..., n0+1]
        out = _pbs_rows(rep, flat_names, ck)
        return out.reshape((G, K) + rows.shape[1:])
    params = ck.params
    batch = rows.shape[1:-1]
    B = int(np.prod(batch)) if batch else 1
    flat = rows.reshape(G * B, rows.shape[-1])
    base = jnp.asarray(L.multi_lut_base(M, params.N))
    acc = blind_rotate(flat, base, ck, params).reshape(G, B, 2, params.N)
    outs = jnp.stack([
        jnp.stack([L.apply_factored(acc[g], *_factored(params, n)[:2])
                   for n in name_groups[g]])
        for g in range(G)
    ])                                             # [G, K, B, 2, N]
    lv1 = _trlwe.sample_extract(outs.reshape(G * K * B, 2, params.N), 0)
    out = identity_key_switch(lv1, ck.ksk1, params)
    return out.reshape((G, K) + batch + (rows.shape[-1],))


# ---------------------------------------------------------------------------
# Codec
# ---------------------------------------------------------------------------


def encrypt_radix(key, value, n_digits: int, alpha: float, sk):
    """Encrypt value(s) as n_digits little-endian base-8 digits.

    value: python int or int array [...].  Returns int32 [..., n_digits,
    n0+1] (batch-first: a batch of integers is just a leading axis).
    """
    v = jnp.asarray(value, jnp.int32)
    shifts = jnp.arange(n_digits, dtype=jnp.int32) * 3
    digits = (v[..., None] >> shifts) & (BASE - 1)
    return _tlwe.encrypt_message(key, digits, M, alpha, sk)


def decrypt_radix(ct_digits, sk):
    """[..., D, n0+1] -> int or int64 array [...]."""
    msgs = np.asarray(_tlwe.decrypt_message(ct_digits, M, sk)) % BASE
    D = msgs.shape[-1]
    weights = (1 << (3 * np.arange(D, dtype=np.int64)))
    out = (msgs.astype(np.int64) * weights).sum(axis=-1)
    return int(out) if out.ndim == 0 else out


def _zeros_like_digit(d):
    return jnp.zeros_like(d)


# ---------------------------------------------------------------------------
# Addition
# ---------------------------------------------------------------------------


def radix_add(a_digits, b_digits, ck: CloudKey):
    """Exact homomorphic addition: [..., D, n0+1] x2 -> [..., D+1, n0+1].

    Sequential carry chain over digits; each digit position is one
    batched 2-lane bootstrap over the whole batch (sum = t mod 8,
    carry = t div 8 with t = a + b + carry <= 15).
    """
    D = a_digits.shape[-2]
    carry = _zeros_like_digit(a_digits[..., 0, :])
    out = []
    for i in range(D):
        t = a_digits[..., i, :] + b_digits[..., i, :] + carry
        both = _pbs_mv(t, ("mod", "div"), ck)    # 1 rotation, 2 LUTs
        out.append(both[0])
        carry = both[1]
    out.append(carry)
    return jnp.stack(out, axis=-2)


# ---------------------------------------------------------------------------
# Multiplication
# ---------------------------------------------------------------------------


def digit_mul(x_ct, y_ct, ck: CloudKey):
    """Exact product of two encrypted digits (< 8): returns (lo, hi).

    5 sequential PBS rounds (7 blind rotations total with multi-value
    bootstrapping; 14 without), every message <= 15:
      1. bits of y (3 LUTs, 1 rotation);
      2. partial products via the w = x + 8*b packing (6 LUTs over the
         3 distinct w_k — lo_k = (x*y_k*2^k) mod 8, hi_k = ... div 8 —
         3 rotations);
      3. low-part carry normalization of lo_0 + lo_1 (2 LUTs, 1 rotation);
      4. final low digit + carry from + lo_2 (2 LUTs, 1 rotation);
      5. high-digit refresh (1 lane, plain).

    Bound check for step 5: hi_0 <= 0, hi_1 <= 1, hi_2 <= 3 and the two
    carries are <= 1 each, so the linear hi sum is <= 6 < 8 — a single
    mod-8 refresh is exact.
    """
    x, y = x_ct, y_ct                                   # [..., n0+1]
    bits8 = _pbs_mv(y, ("bit0", "bit1", "bit2"), ck)    # 1 rotation, 3 LUTs
    w = x[None] + bits8                                 # w_k = x + 8*y_k
    parts = _pbs_mv_groups(                             # 3 rotations, 6 LUTs
        w, (("pp0lo", "pp0hi"), ("pp1lo", "pp1hi"),
            ("pp2lo", "pp2hi")), ck)                    # [3, 2, ..., n0+1]
    lo0, lo1, lo2 = parts[0, 0], parts[1, 0], parts[2, 0]
    hi_parts = parts[0, 1] + parts[1, 1] + parts[2, 1]  # <= 0 + 1 + 3

    t01 = lo0 + lo1                                     # <= 14
    s01 = _pbs_mv(t01, ("mod", "div"), ck)
    t = s01[0] + lo2                                    # <= 14
    fin = _pbs_mv(t, ("mod", "div"), ck)
    lo = fin[0]
    hi_lin = hi_parts + s01[1] + fin[1]                 # <= 6 < 8
    hi = _pbs_rows(hi_lin[None], ("mod",), ck)[0]
    return lo, hi


def radix_scale(a_digits, y_ct, ck: CloudKey):
    """[..., D, n0+1] x digit [..., n0+1] -> [..., D+1, n0+1].

    All D digit products run as ONE batched mul (the digit axis folds
    into digit_mul's batch dims)."""
    D = a_digits.shape[-2]
    a_rows = jnp.moveaxis(a_digits, -2, 0)               # [D, ..., n0+1]
    y_rows = jnp.broadcast_to(y_ct[None], a_rows.shape)
    lo, hi = digit_mul(a_rows, y_rows, ck)               # [D, ..., n0+1]
    z = _zeros_like_digit(lo[0])[None]
    row_lo = jnp.moveaxis(jnp.concatenate([lo, z]), 0, -2)
    row_hi = jnp.moveaxis(jnp.concatenate([z, hi]), 0, -2)
    return radix_add(row_lo, row_hi, ck)[..., : D + 1, :]


def radix_mul(a_digits, b_digits, ck: CloudKey):
    """Full product: [..., Da, n0+1] x [..., Db, n0+1] -> [..., Da+Db, n0+1]
    (exact schoolbook over batched rows)."""
    Da, Db = a_digits.shape[-2], b_digits.shape[-2]
    zero = _zeros_like_digit(a_digits[..., 0, :])[..., None, :]
    acc = jnp.concatenate([zero] * (Da + Db), axis=-2)
    for j in range(Db):
        row = radix_scale(a_digits, b_digits[..., j, :], ck)  # [..., Da+1]
        padded = jnp.concatenate(
            [zero] * j + [row] + [zero] * (Db - 1 - j), axis=-2)
        acc = radix_add(acc, padded, ck)[..., : Da + Db, :]
    return acc


# ---------------------------------------------------------------------------
# High-level encrypted-integer handle
# ---------------------------------------------------------------------------


class FheUint:
    """Operator-overloaded encrypted unsigned integer (tfhe-rs-style DX).

    A thin immutable handle over the radix machinery: ``digits`` is the
    int32 [..., D, n0+1] little-endian base-8 ciphertext array and ``ck``
    the evaluation key.  ``a + b`` / ``a * b`` return new handles (widened
    by the exact result: +1 digit for add, Da+Db for mul); mixed-width
    operands are allowed.  Plain ints are encrypted trivially (b-only
    ciphertexts) on the fly, so ``x + 3`` and ``x * 2`` work.

    No reference analog (the reference composes nothing on its multi-bit
    sets); works on any parameter set whose PBS is reliable at m=16
    (uint4, TEST_TINY_UINT).
    """

    __slots__ = ("digits", "ck")

    def __init__(self, digits, ck: CloudKey):
        self.digits = digits
        self.ck = ck

    @classmethod
    def encrypt(cls, key, value, n_digits: int, sk, ck: CloudKey,
                alpha: float | None = None) -> "FheUint":
        a = ck.params.tlwe_lv0.alpha if alpha is None else alpha
        return cls(encrypt_radix(key, value, n_digits, a, sk.key_lv0), ck)

    def _coerce(self, other) -> "FheUint":
        if isinstance(other, FheUint):
            return other
        v = int(other)
        if v < 0:
            raise ValueError(f"FheUint is unsigned, got {v}")
        D = max(1, (v.bit_length() + 2) // 3)
        # trivial (noiseless, a=0) ciphertext of the constant; digits are
        # extracted with Python ints so arbitrary-width constants work
        # (int32 conversion/shifts would fail beyond 2^31)
        digits = jnp.asarray([(v >> (3 * i)) & (BASE - 1) for i in range(D)],
                             jnp.int32)
        ct = jnp.zeros(self.digits.shape[:-2] + (D, self.digits.shape[-1]),
                       jnp.int32)
        enc = jnp.int32((1 << 32) // (2 * M)) * digits   # PBS codec: x/(2M)
        ct = ct.at[..., :, -1].set(jnp.broadcast_to(enc, ct.shape[:-1]))
        return FheUint(ct, self.ck)

    @property
    def n_digits(self) -> int:
        return self.digits.shape[-2]

    def __add__(self, other):
        o = self._coerce(other)
        return FheUint(radix_add(*_pad_to_match(self.digits, o.digits),
                                 self.ck), self.ck)

    __radd__ = __add__

    def __mul__(self, other):
        o = self._coerce(other)
        return FheUint(radix_mul(self.digits, o.digits, self.ck), self.ck)

    __rmul__ = __mul__

    def decrypt(self, sk):
        return decrypt_radix(self.digits, sk.key_lv0)


def _pad_to_match(a, b):
    """Zero-pad the narrower radix array (most-significant end) so both
    have equal digit counts (a trivial zero digit encrypts 0 exactly)."""
    Da, Db = a.shape[-2], b.shape[-2]
    if Da == Db:
        return a, b

    def pad(x, extra):
        z = jnp.zeros(x.shape[:-2] + (extra, x.shape[-1]), jnp.int32)
        return jnp.concatenate([x, z], axis=-2)

    return (a, pad(b, Da - Db)) if Da > Db else (pad(a, Db - Da), b)
