"""Even/odd split-ring engine: N=2048 negacyclic arithmetic on the
N=1024 NTT plan (docs/TORUS64.md §4).

The matmul-NTT engine's int8 residue-limb cap admits only three primes
p ≡ 1 (mod 4096) below 63000 (44.8 bits of CRT product) — a DIRECT
N=2048 transform is impossible at any torus width (TORUS64.md §3).  The
unblocking isomorphism: Z[X]/(X^2048+1) ≅ pairs over Y = X², i.e.

    a(X) = a_e(Y) + X * a_o(Y),   a_e, a_o ∈ Z[Y]/(Y^1024+1),

so one N=2048 ring product becomes FOUR N=1024 products on the shipped
74.8-bit five-prime pool:

    c_e = Σ a_e b_e + Y * (a_o b_o)        c_o = Σ a_e b_o + a_o b_e

with multiply-by-Y a static diagonal (psi^(2k+1)) in the NTT domain.
The external product collapses onto the EXISTING per-prime contraction
(ops/ntt.py:pointwise_extprod) by flattening (row, input-parity) into a
2R-row axis and (component, output-parity) into a 4-plane column axis,
with the Y-twist folded into the key planes at keygen — zero new
hot-loop code on the MXU path.

X^t rotation (t = 2u + r): r=0 keeps parities ((Y^u e, Y^u o)); r=1
swaps them with one extra Y ((Y^(u+1) o, Y^u e)).  Branchless: ONE psi-
row gather (for Y^u) + a static psi^1 diagonal + a parity select.

Supported ring/torus: N > 1024 parameter sets (SecurityParams.split_ring)
with 64-bit carriers, group=1 blind rotation (the classic per-bit BSK —
multi-bit subset-product combining across the parity swap is future
work).  Reference anchor: the reference pins Torus=u32/N=1024 at
comptime (params.zig:21-30, 386-416); this engine is the capability door
beyond that ceiling (TORUS64.md §5: capability GO, throughput NO-GO —
~3.8x per-gate cost vs the 32-bit path, shipped for message-modulus and
noise-headroom demand, not for throughput).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from zig_tfhe_tpu.ops import ntt as _ntt
from zig_tfhe_tpu.ops.blind_rotate import modswitch, _decompose_to_rows
from zig_tfhe_tpu.ops.poly import negacyclic_rotate
from zig_tfhe_tpu.params import SecurityParams


def split(x):
    """[..., N] -> [..., 2, N/2]: (even-index, odd-index) coefficient
    halves — a(X) = a_e(X^2) + X * a_o(X^2)."""
    return jnp.stack([x[..., 0::2], x[..., 1::2]], axis=-2)


def unsplit(x):
    """[..., 2, N/2] -> [..., N]: inverse of split (re-interleave)."""
    half = x.shape[-1]
    out = jnp.stack([x[..., 0, :], x[..., 1, :]], axis=-1)
    return out.reshape(x.shape[:-2] + (2 * half,))


def _rot_merged_rows(t, plan: _ntt.NTTPlan):
    """psi^(t(2k+1)) rows for all primes in one gather: int32 [B, P*N]."""
    merged = jnp.asarray(plan.rot_merged)
    return jnp.take(merged, t, axis=0).astype(jnp.int32)


def fold_key_split(res_e, res_o, plan: _ntt.NTTPlan):
    """Fold the Y-twist into split-key NTT planes.

    res_e/res_o: int16 [P, ..., R, 2, Nh] residues of the even/odd key
    halves (to_ntt_form output).  Returns int16 [..., P, 2R, 4, Nh] laid
    out for ops/ntt.py:pointwise_extprod: row axis r' = 2r + q_in,
    column axis c' = 2c + q_out, with

        K[(r,0),(c,0)] = k_e[r,c]      K[(r,1),(c,0)] = psi1 * k_o[r,c]
        K[(r,0),(c,1)] = k_o[r,c]      K[(r,1),(c,1)] = k_e[r,c]

    so u[c'] = Σ_r' d[r'] K[r',c'] computes c_e = d_e k_e + Y d_o k_o
    and c_o = d_e k_o + d_o k_e per component.  psi1 = psi^(2k+1) is the
    NTT diagonal of multiply-by-Y (plan.rot row 1).
    """
    outs = []
    for i, p in enumerate(plan.primes):
        psi1 = jnp.asarray(plan.rot[i][1].astype(np.int32))      # [Nh]
        ke = res_e[i].astype(jnp.int32)                  # [..., R, 2, Nh]
        ko = res_o[i].astype(jnp.int32)
        # |psi1 * ko| <= (p/2)^2 < 2^30: one product + barrett, then a
        # final centered reduce to |.| <= p/2 for canonical int16 storage
        koy = _ntt.barrett_reduce(psi1 * ko, p)
        koy = koy - jnp.int32(p) * (koy > jnp.int32(p // 2)).astype(jnp.int32)
        koy = koy + jnp.int32(p) * (koy < -jnp.int32(p // 2)).astype(jnp.int32)
        # rows (q_in): [..., R, 2(q_in), 2(c), 2(q_out), Nh]
        q0 = jnp.stack([ke, ko], axis=-2)            # [..., R, 2c, 2q, Nh]
        q1 = jnp.stack([koy, ke], axis=-2)
        k4 = jnp.stack([q0, q1], axis=-4)            # [..., R, 2qi, 2c, 2q, Nh]
        sh = k4.shape
        k4 = k4.reshape(sh[:-5] + (sh[-5] * 2, 4, sh[-1]))
        outs.append(k4.astype(jnp.int16))
    return jnp.stack(outs, axis=-4) if outs[0].ndim > 3 else jnp.stack(outs)


def rotate_minus1_split(us, t, plan: _ntt.NTTPlan):
    """(X^t - 1) * u in the split NTT domain, t in [0, 4*Nh).

    us: per-prime int32 [B, 4, Nh] with plane index 2c + q (the
    pointwise_extprod output under the fold_key_split layout), |.| <=
    0.55p.  Returns per-prime int32 [B, 2, 2, Nh] (component, parity)
    with |.| <= 0.52p.

    t = 2u + r:  X^t (e, o) = r ? (Y^(u+1) o, Y^u e) : (Y^u e, Y^u o).
    One psi-row gather for Y^u; Y^(u+1) = psi1 * Y^u folds the +1 into
    the operand (psi1 * u_o, then the shared row) — branchless parity
    select, no second gather.  Overflow: |row * sel| <= (p/2)(0.55p)
    <= 1.04e9 and the subtracted u adds < 2^16 — int32-safe for every
    plan prime (cap 63000).
    """
    Nh = plan.N
    t = jnp.asarray(t) & jnp.int32(4 * Nh - 1)
    r = (t & 1)[:, None, None]                       # [B, 1, 1]
    rows_all = _rot_merged_rows(t >> 1, plan)        # [B, P*Nh]
    outs = []
    for i, p in enumerate(plan.primes):
        row = rows_all[:, i * Nh:(i + 1) * Nh][:, None, :]   # [B, 1, Nh]
        psi1 = jnp.asarray(plan.rot[i][1].astype(np.int32))
        v = us[i].astype(jnp.int32)                  # [B, 4, Nh]
        ue = v[..., 0::2, :]                         # [B, 2, Nh] (q=0)
        uo = v[..., 1::2, :]                         # [B, 2, Nh] (q=1)
        m_o = _ntt.barrett_reduce(psi1 * uo, p)      # psi1*u_o, <= 0.52p
        sel_e = jnp.where(r != 0, m_o, ue)
        sel_o = jnp.where(r != 0, ue, uo)
        ve = _ntt.barrett_reduce(row * sel_e - ue, p)
        vo = _ntt.barrett_reduce(row * sel_o - uo, p)
        outs.append(jnp.stack([ve, vo], axis=-2))    # [B, 2, 2, Nh]
    return outs


def gen_bootstrapping_key_ntt_split(key, secret_key, params: SecurityParams,
                                    drop: int, levels=None,
                                    bgbit: int | None = None):
    """Split-engine BSK: per-bit TRGSW(s0[i]) keys in folded split-NTT
    form, int16 [n0, P, 2R, 4, Nh] (fold_key_split layout).

    Encryption itself runs in the full X-ring (the exact int64 Toeplitz
    product — keygen is off the hot path); only the NTT residues are
    computed half-wise on the Nh plan.  group=1 only (module docstring).
    """
    from zig_tfhe_tpu import trgsw as _trgsw

    e = params.bgbit if bgbit is None else bgbit
    la, lb = _ntt.norm_levels(params, levels, bgbit=e)
    plan = _ntt.plan_for_params(params, drop, 1, (la, lb), bgbit=e,
                                pseudorandom_key=True)
    trgsw_ct = _trgsw.encrypt_gadget_rows(
        key, secret_key.key_lv0, params.bsk_alpha, secret_key.key_lv1,
        params, e, la, lb)                           # [n0, R, 2, N] int64
    halves = split(trgsw_ct)                         # [n0, R, 2, 2, Nh]
    w = params.torus_bits
    res_e = _ntt.to_ntt_form(halves[..., 0, :], plan, drop, width=w)
    res_o = _ntt.to_ntt_form(halves[..., 1, :], plan, drop, width=w)
    folded = fold_key_split(res_e, res_o, plan)      # [n0, P, 2R, 4, Nh]
    return folded


def blind_rotate_split(tlwe_batch, testvec, bsk_split,
                       params: SecurityParams, drop_bits: int,
                       unroll: int = 1, levels=None,
                       bgbit: int | None = None):
    """Blind rotation over the split ring (N > 1024, 64-bit torus).

    tlwe_batch: int64 [B, n0+1]; testvec: int64 [2, N] or [B, 2, N];
    bsk_split: int16 [n0, P, 2R, 4, Nh].  Returns int64 [B, 2, N].

    Per step: decompose (coefficient-wise — parity layout free), forward
    NTT of 2R half-rows, the folded pointwise contraction, the parity-
    select rotation, inverse + 64-bit CRT.  The initial X^(-b) testvec
    rotation runs in the coefficient domain (a per-batch gather): a
    full-torus NTT rotation needs |conv| <= 2^75 which misses the
    74.8-bit pool by 0.2 bits (TORUS64.md §4) — once per gate it is ~1%
    of the n0-step scan.
    """
    e = params.bgbit if bgbit is None else bgbit
    if levels is None:
        levels = bsk_split.shape[2] // 4
    levels = _ntt.norm_levels(params, levels, bgbit=e)
    n_rows = levels[0] + levels[1]
    assert 2 * n_rows == bsk_split.shape[2], (levels, bsk_split.shape)
    plan = _ntt.plan_for_params(params, drop_bits, 1, levels, bgbit=e,
                                pseudorandom_key=True)
    if bsk_split.shape[1] != plan.n_primes:
        raise ValueError(
            f"split BSK holds {bsk_split.shape[1]} CRT prime planes but "
            f"the current plan selects {plan.n_primes} — key and plan "
            "were built under different plan bounds")
    n0, N = params.n0, params.N
    Nh = N // 2
    assert plan.N == Nh, (plan.N, N)
    w = params.torus_bits
    B = tlwe_batch.shape[0]
    e_limbs = _ntt.engine_digit_limbs(e)
    dbound = _ntt.top_limb_bound(1 << (e - 1), e_limbs)

    b = tlwe_batch[..., n0]
    b_tilda = jnp.int32(2 * N) - modswitch(b, params)    # [B], [0, 2N]
    if testvec.ndim == 2:
        testvec = testvec[None]
    testvec = jnp.broadcast_to(testvec, (B, 2, N))
    acc_full = negacyclic_rotate(testvec, b_tilda)       # [B, 2, N]
    acc = split(acc_full)                                # [B, 2, 2, Nh]

    a_cols = jnp.swapaxes(tlwe_batch[..., :n0], 0, 1)    # [n0, B]

    def step(acc, xs):
        bsk_i, a_col = xs                  # [P, 2R, 4, Nh], [B]
        t = modswitch(a_col, params)       # [B] in [0, 2N]
        rows = _decompose_to_rows(acc.reshape(B, 2, N), params, levels,
                                  bgbit=e)               # [B, R, N]
        rows = rows.reshape(B, n_rows * 2, Nh)           # (r, q_in) rows
        d_hat = _ntt.ntt_forward(rows, plan, e_limbs, dbound)
        u = _ntt.pointwise_extprod(d_hat, bsk_i, plan)   # [B, 4, Nh]/prime
        v = rotate_minus1_split(u, t, plan)              # [B, 2, 2, Nh]
        delta = _ntt.ntt_inverse_to_crt(v, plan, w)      # int64
        if drop_bits:
            delta = jax.lax.shift_left(delta, jnp.asarray(drop_bits,
                                                          delta.dtype))
        return acc + delta, None

    acc, _ = jax.lax.scan(step, acc, (bsk_split, a_cols), unroll=unroll)
    return unsplit(acc)                                  # [B, 2, N]
