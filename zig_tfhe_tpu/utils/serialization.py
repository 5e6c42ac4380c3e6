"""Key and ciphertext (de)serialization.

The reference has NO serialization anywhere (SURVEY.md §5) — but multi-host
key distribution requires it, so it is a first-class feature here.  Format:
numpy ``.npz`` with a manifest entry carrying the parameter-set name and
object kind; torus arrays are stored as uint32, key material as int8/int32.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from zig_tfhe_tpu import key as K
from zig_tfhe_tpu import params as P
from zig_tfhe_tpu.models import proxy_reenc as PR

_KIND_SECRET = "secret_key"
_KIND_CLOUD = "cloud_key"
_KIND_CIPHERTEXT = "ciphertext"
_KIND_PUBLIC = "public_key"
_KIND_REENC = "reenc_key"


def _manifest(kind: str, params_name: str, extra=None) -> np.ndarray:
    doc = {"format": "zig_tfhe_tpu.v1", "kind": kind, "params": params_name}
    if extra:
        doc.update(extra)
    return np.frombuffer(json.dumps(doc).encode(), dtype=np.uint8)


def _read_manifest(z) -> dict:
    return json.loads(bytes(z["__manifest__"]).decode())


def save_secret_key(path, sk: K.SecretKey, params: P.SecurityParams) -> None:
    np.savez(path, __manifest__=_manifest(_KIND_SECRET, params.name),
             key_lv0=np.asarray(sk.key_lv0), key_lv1=np.asarray(sk.key_lv1))


def load_secret_key(path):
    z = np.load(path)
    m = _read_manifest(z)
    assert m["kind"] == _KIND_SECRET, m
    sk = K.SecretKey(jnp.asarray(z["key_lv0"]), jnp.asarray(z["key_lv1"]))
    return sk, P.PARAMS_BY_NAME[m["params"]]


def save_cloud_key(path, ck: K.CloudKey) -> None:
    arrays = dict(testvec=np.asarray(ck.testvec), ksk1=np.asarray(ck.ksk1))
    if ck.bsk_ntt is not None:
        arrays["bsk_ntt"] = np.asarray(ck.bsk_ntt)
    if ck.bsk_ext_limbs is not None:
        arrays["bsk_ext_limbs"] = np.asarray(ck.bsk_ext_limbs)
    np.savez(path, __manifest__=_manifest(
        _KIND_CLOUD, ck.params.name, {"bsk_ntt_drop": ck.bsk_ntt_drop, "bsk_group": ck.bsk_group}),
        **arrays)


def load_cloud_key(path) -> K.CloudKey:
    z = np.load(path)
    m = _read_manifest(z)
    assert m["kind"] == _KIND_CLOUD, m
    return K.CloudKey(
        testvec=jnp.asarray(z["testvec"]),
        ksk1=jnp.asarray(z["ksk1"]),
        bsk_ntt=jnp.asarray(z["bsk_ntt"]) if "bsk_ntt" in z else None,
        bsk_ext_limbs=(jnp.asarray(z["bsk_ext_limbs"])
                       if "bsk_ext_limbs" in z else None),
        params=P.PARAMS_BY_NAME[m["params"]],
        bsk_ntt_drop=m.get("bsk_ntt_drop", 0),
        bsk_group=m.get("bsk_group", 1),
    )


def save_ciphertext(path, ct, params: P.SecurityParams) -> None:
    np.savez(path, __manifest__=_manifest(_KIND_CIPHERTEXT, params.name),
             ct=np.asarray(ct).view(np.uint32))


def load_ciphertext(path):
    z = np.load(path)
    m = _read_manifest(z)
    assert m["kind"] == _KIND_CIPHERTEXT, m
    return jnp.asarray(z["ct"].view(np.int32)), P.PARAMS_BY_NAME[m["params"]]


def save_public_key(path, pk: PR.PublicKeyLv0, params: P.SecurityParams) -> None:
    np.savez(path, __manifest__=_manifest(_KIND_PUBLIC, params.name),
             encryptions=np.asarray(pk.encryptions))


def load_public_key(path):
    z = np.load(path)
    m = _read_manifest(z)
    assert m["kind"] == _KIND_PUBLIC, m
    return PR.PublicKeyLv0(jnp.asarray(z["encryptions"])), P.PARAMS_BY_NAME[m["params"]]


def save_reenc_key(path, rk: PR.ProxyReencryptionKey, params: P.SecurityParams) -> None:
    np.savez(path, __manifest__=_manifest(
        _KIND_REENC, params.name, {"basebit": rk.basebit, "t": rk.t}),
        key_encryptions=np.asarray(rk.key_encryptions))


def load_reenc_key(path):
    z = np.load(path)
    m = _read_manifest(z)
    assert m["kind"] == _KIND_REENC, m
    rk = PR.ProxyReencryptionKey(jnp.asarray(z["key_encryptions"]),
                                 basebit=m["basebit"], t=m["t"])
    return rk, P.PARAMS_BY_NAME[m["params"]]
