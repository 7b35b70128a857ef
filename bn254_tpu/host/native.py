"""ctypes binding for the native host core (csrc/bn254_host.cpp).

The C++ library implements the host-side runtime math natively — scalar
muls, pairings, hash-to-G1 — the role the reference delegates to its Rust
math dependency (SURVEY.md §2.3). The pure-Python modules in this package
remain the oracle; `available()` gates every use so the framework degrades
gracefully to the oracle when no compiler is present.

Builds on demand (make -C csrc) the first time it is loaded; the result is
cached at csrc/build/libbn254_host.so.

All byte interfaces are big-endian 32-byte field elements; G1 = x||y,
G2 = x.re||x.im||y.re||y.im, matching the reference's uncompressed layout
(reference utils.rs:107-127).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_CSRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
)
_SO = os.path.join(_CSRC, "build", "libbn254_host.so")

_lib = None
_lock = threading.Lock()
_tried = False


def _build_and_load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO):
            try:
                subprocess.run(
                    ["make", "-C", _CSRC],
                    check=True,
                    capture_output=True,
                    timeout=300,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.bn254_g1_mul.argtypes = [u8p, ctypes.c_int, u8p, u8p]
        lib.bn254_g1_mul.restype = ctypes.c_int
        lib.bn254_g2_mul.argtypes = [u8p, ctypes.c_int, u8p, u8p]
        lib.bn254_g2_mul.restype = ctypes.c_int
        lib.bn254_g1_add.argtypes = [u8p, ctypes.c_int, u8p, ctypes.c_int, u8p]
        lib.bn254_g1_add.restype = ctypes.c_int
        lib.bn254_g2_add.argtypes = [u8p, ctypes.c_int, u8p, ctypes.c_int, u8p]
        lib.bn254_g2_add.restype = ctypes.c_int
        lib.bn254_pairing.argtypes = [u8p, ctypes.c_int, u8p, ctypes.c_int, u8p]
        lib.bn254_pairing.restype = ctypes.c_int
        lib.bn254_pairing_check.argtypes = [u8p, u8p, u8p, ctypes.c_uint64]
        lib.bn254_pairing_check.restype = ctypes.c_int
        lib.bn254_pairing_product.argtypes = [u8p, u8p, u8p,
                                              ctypes.c_uint64, u8p]
        lib.bn254_pairing_product.restype = ctypes.c_int
        lib.bn254_hash_to_g1.argtypes = [u8p, ctypes.c_uint64, u8p]
        lib.bn254_hash_to_g1.restype = ctypes.c_int
        lib.bn254_sign.argtypes = [u8p, ctypes.c_uint64, u8p, u8p]
        lib.bn254_sign.restype = ctypes.c_int
        lib.bn254_verify.argtypes = [u8p, ctypes.c_uint64, u8p, ctypes.c_int,
                                     u8p, ctypes.c_int]
        lib.bn254_verify.restype = ctypes.c_int
        lib.bn254_g2_y_from_x.argtypes = [u8p, u8p]
        lib.bn254_g2_y_from_x.restype = ctypes.c_int
        lib.bn254_g2_in_subgroup.argtypes = [u8p]
        lib.bn254_g2_in_subgroup.restype = ctypes.c_int
        lib.bn254_g1_on_curve.argtypes = [u8p]
        lib.bn254_g1_on_curve.restype = ctypes.c_int
        lib.bn254_g2_on_curve.argtypes = [u8p]
        lib.bn254_g2_on_curve.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    if os.environ.get("BN254_DISABLE_NATIVE"):
        return False
    return _build_and_load() is not None


def _buf(b: bytes) -> ctypes.Array:
    return (ctypes.c_uint8 * len(b)).from_buffer_copy(b)


def _out(n: int) -> ctypes.Array:
    return (ctypes.c_uint8 * n)()


def _u8p(a):
    return ctypes.cast(a, ctypes.POINTER(ctypes.c_uint8))


# ---- affine tuple <-> bytes (ints, None = infinity) ----


def _g1_bytes(aff) -> tuple[bytes, int]:
    if aff is None:
        return bytes(64), 1
    return aff[0].to_bytes(32, "big") + aff[1].to_bytes(32, "big"), 0


def _g1_from(buf, inf: int):
    if inf:
        return None
    raw = bytes(buf)
    return (int.from_bytes(raw[:32], "big"), int.from_bytes(raw[32:], "big"))


def _g2_bytes(aff) -> tuple[bytes, int]:
    if aff is None:
        return bytes(128), 1
    (x0, x1), (y0, y1) = aff
    return (
        x0.to_bytes(32, "big") + x1.to_bytes(32, "big")
        + y0.to_bytes(32, "big") + y1.to_bytes(32, "big")
    ), 0


def _g2_from(buf, inf: int):
    if inf:
        return None
    raw = bytes(buf)
    c = [int.from_bytes(raw[i * 32:(i + 1) * 32], "big") for i in range(4)]
    return ((c[0], c[1]), (c[2], c[3]))


# ---- public wrappers (affine int tuples; None = identity) ----


def g1_mul(aff, k: int):
    lib = _build_and_load()
    raw, inf = _g1_bytes(aff)
    out = _out(64)
    r = lib.bn254_g1_mul(_u8p(_buf(raw)), inf,
                         _u8p(_buf((k % (1 << 256)).to_bytes(32, "big"))),
                         _u8p(out))
    return _g1_from(out, r)


def g2_mul(aff, k: int):
    lib = _build_and_load()
    raw, inf = _g2_bytes(aff)
    out = _out(128)
    r = lib.bn254_g2_mul(_u8p(_buf(raw)), inf,
                         _u8p(_buf((k % (1 << 256)).to_bytes(32, "big"))),
                         _u8p(out))
    return _g2_from(out, r)


def g1_add(a, b):
    lib = _build_and_load()
    ra, ia = _g1_bytes(a)
    rb, ib = _g1_bytes(b)
    out = _out(64)
    r = lib.bn254_g1_add(_u8p(_buf(ra)), ia, _u8p(_buf(rb)), ib, _u8p(out))
    return _g1_from(out, r)


def g2_add(a, b):
    lib = _build_and_load()
    ra, ia = _g2_bytes(a)
    rb, ib = _g2_bytes(b)
    out = _out(128)
    r = lib.bn254_g2_add(_u8p(_buf(ra)), ia, _u8p(_buf(rb)), ib, _u8p(out))
    return _g2_from(out, r)


def hash_to_g1(msg: bytes):
    """Affine hash point, or None if all 255 counters fail."""
    lib = _build_and_load()
    out = _out(64)
    ctr = lib.bn254_hash_to_g1(_u8p(_buf(msg)) if msg else _u8p(_out(1)),
                               len(msg), _u8p(out))
    if ctr < 0:
        return None
    return _g1_from(out, 0)


def sign(msg: bytes, sk: int):
    lib = _build_and_load()
    out = _out(64)
    r = lib.bn254_sign(_u8p(_buf(msg)) if msg else _u8p(_out(1)), len(msg),
                       _u8p(_buf(sk.to_bytes(32, "big"))), _u8p(out))
    if r < 0:
        return None
    return _g1_from(out, 0)


def verify(msg: bytes, sig_aff, pk_aff) -> bool:
    lib = _build_and_load()
    rs, is_ = _g1_bytes(sig_aff)
    rp, ip = _g2_bytes(pk_aff)
    r = lib.bn254_verify(_u8p(_buf(msg)) if msg else _u8p(_out(1)), len(msg),
                         _u8p(_buf(rs)), is_, _u8p(_buf(rp)), ip)
    if r < 0:
        raise RuntimeError("hash-to-G1 failed")
    return bool(r)


def pairing_check(pairs) -> bool:
    """prod e(P, Q) == 1 for affine (g1_aff, g2_aff) pairs."""
    lib = _build_and_load()
    n = len(pairs)
    ps = bytearray()
    qs = bytearray()
    infs = bytearray()
    for g1a, g2a in pairs:
        r1, i1 = _g1_bytes(g1a)
        r2, i2 = _g2_bytes(g2a)
        ps += r1
        qs += r2
        infs.append((1 if i1 else 0) | (2 if i2 else 0))
    return bool(
        lib.bn254_pairing_check(
            _u8p(_buf(bytes(ps))), _u8p(_buf(bytes(qs))),
            _u8p(_buf(bytes(infs))), n,
        )
    )


def _fq12_from_raw(raw: bytes):
    cs = [int.from_bytes(raw[i * 32:(i + 1) * 32], "big") for i in range(12)]
    fq2s = [(cs[2 * i], cs[2 * i + 1]) for i in range(6)]
    return ((fq2s[0], fq2s[1], fq2s[2]), (fq2s[3], fq2s[4], fq2s[5]))


def pairing_product(pairs):
    """prod e(P, Q) as a canonical Fq12 nested tuple (oracle layout) —
    the native `pairing_batch` with one shared final exponentiation."""
    lib = _build_and_load()
    n = len(pairs)
    ps = bytearray()
    qs = bytearray()
    infs = bytearray()
    for g1a, g2a in pairs:
        r1, i1 = _g1_bytes(g1a)
        r2, i2 = _g2_bytes(g2a)
        ps += r1
        qs += r2
        infs.append((1 if i1 else 0) | (2 if i2 else 0))
    out = _out(384)
    lib.bn254_pairing_product(
        _u8p(_buf(bytes(ps))), _u8p(_buf(bytes(qs))),
        _u8p(_buf(bytes(infs))), n, _u8p(out),
    )
    return _fq12_from_raw(bytes(out))


def pairing(g1_aff, g2_aff):
    """Canonical Fq12 value of e(P, Q) as nested tuples (oracle layout)."""
    lib = _build_and_load()
    r1, i1 = _g1_bytes(g1_aff)
    r2, i2 = _g2_bytes(g2_aff)
    out = _out(384)
    lib.bn254_pairing(_u8p(_buf(r1)), i1, _u8p(_buf(r2)), i2, _u8p(out))
    raw = bytes(out)
    cs = [int.from_bytes(raw[i * 32:(i + 1) * 32], "big") for i in range(12)]
    # layout: c0.c0(re,im), c0.c1, c0.c2, c1.c0, c1.c1, c1.c2
    fq2s = [(cs[2 * i], cs[2 * i + 1]) for i in range(6)]
    return ((fq2s[0], fq2s[1], fq2s[2]), (fq2s[3], fq2s[4], fq2s[5]))


def g2_in_subgroup(aff) -> bool:
    lib = _build_and_load()
    raw, inf = _g2_bytes(aff)
    if inf:
        return True
    return bool(lib.bn254_g2_in_subgroup(_u8p(_buf(raw))))


def g1_on_curve(aff) -> bool:
    lib = _build_and_load()
    raw, inf = _g1_bytes(aff)
    if inf:
        return True
    return bool(lib.bn254_g1_on_curve(_u8p(_buf(raw))))


def g2_on_curve(aff) -> bool:
    lib = _build_and_load()
    raw, inf = _g2_bytes(aff)
    if inf:
        return True
    return bool(lib.bn254_g2_on_curve(_u8p(_buf(raw))))
