"""Native C++ host core (csrc/bn254_host.cpp) vs the pure-Python oracle.

Covers the cross-checks SURVEY.md §4 calls for on the host runtime: scalar
muls, adds, hash-to-G1 bit-exactness, pairing values, pairing products,
sign/verify round-trips, and the subgroup/curve predicates. Skips when no
compiler toolchain is available.
"""

import random

import pytest

from bn254_tpu.constants import P, R
from bn254_tpu.host import curve as C
from bn254_tpu.host import field as F
from bn254_tpu.host import native as N
from bn254_tpu.host import pairing as PR
from bn254_tpu.hash.tai import hash_to_g1_affine

pytestmark = pytest.mark.skipif(
    not N.available(), reason="native host core not built"
)


def canon12(a):
    return tuple(tuple(tuple(c % P for c in c2) for c2 in c6) for c6 in a)


G2_GEN_AFF = C.g2_to_affine(C.G2_ONE)


def test_g1_mul_matches_oracle():
    random.seed(101)
    for _ in range(8):
        k = random.randrange(0, R)
        exp = C.g1_to_affine(C.g1_mul_py(C.G1_ONE, k))
        assert N.g1_mul((1, 2), k) == exp
    # above-order scalars are NOT reduced (subgroup-check semantics)
    assert N.g1_mul((1, 2), R) is None
    assert N.g1_mul((1, 2), R + 5) == C.g1_to_affine(C.g1_mul_py(C.G1_ONE, 5))


def test_g2_mul_matches_oracle():
    random.seed(102)
    for _ in range(4):
        k = random.randrange(0, R)
        exp = C.g2_to_affine(C.g2_mul_py(C.G2_ONE, k))
        assert N.g2_mul(G2_GEN_AFF, k) == exp


def test_adds_and_identity():
    p7 = N.g1_mul((1, 2), 7)
    p11 = N.g1_mul((1, 2), 11)
    assert N.g1_add(p7, p11) == N.g1_mul((1, 2), 18)
    assert N.g1_add(p7, None) == p7
    assert N.g1_add(None, None) is None
    assert N.g1_add(p7, (p7[0], P - p7[1])) is None
    q3 = N.g2_mul(G2_GEN_AFF, 3)
    q4 = N.g2_mul(G2_GEN_AFF, 4)
    assert N.g2_add(q3, q4) == N.g2_mul(G2_GEN_AFF, 7)


def test_hash_to_g1_bit_exact():
    for msg in [b"sample", b"hello", b"", b"\x00" * 33, bytes(range(200))]:
        assert N.hash_to_g1(msg) == hash_to_g1_affine(msg)


def test_pairing_value_matches_oracle():
    got = N.pairing((1, 2), G2_GEN_AFF)
    exp = canon12(PR.pairing_batch_py([(C.G1_ONE, C.G2_ONE)]))
    assert got == exp


def test_pairing_identity_handling():
    assert N.pairing(None, G2_GEN_AFF) == canon12(F.FQ12_ONE)
    assert N.pairing((1, 2), None) == canon12(F.FQ12_ONE)
    assert N.pairing_check([(None, G2_GEN_AFF)])


def test_pairing_product_matches_oracle():
    random.seed(103)
    pairs_aff = []
    pairs_jac = []
    for _ in range(3):
        a = random.randrange(1, R)
        b = random.randrange(1, R)
        pairs_aff.append((N.g1_mul((1, 2), a), N.g2_mul(G2_GEN_AFF, b)))
        pairs_jac.append((C.g1_mul(C.G1_ONE, a), C.g2_mul(C.G2_ONE, b)))
    got = N.pairing_product(pairs_aff)
    exp = canon12(PR.pairing_batch_py(pairs_jac))
    assert got == exp


def test_bilinearity_check():
    a, b = 1234577, 87654323
    Pa = N.g1_mul((1, 2), a)
    Qb = N.g2_mul(G2_GEN_AFF, b)
    ng2 = (G2_GEN_AFF[0], F.fq2_neg(G2_GEN_AFF[1]))
    good = N.g1_mul((1, 2), a * b % R)
    assert N.pairing_check([(Pa, Qb), (good, ng2)])
    bad = N.g1_mul((1, 2), (a * b + 1) % R)
    assert not N.pairing_check([(Pa, Qb), (bad, ng2)])


def test_sign_verify_roundtrip():
    sk = 0x1AB1126FF2E37C6E6EDDEA943CCB3A48F83B380B856424EE552E113595525565
    pk = N.g2_mul(G2_GEN_AFF, sk)
    sig = N.sign(b"sample", sk)
    exp = C.g1_to_affine(
        C.g1_mul_py(C.g1_from_affine(hash_to_g1_affine(b"sample")), sk)
    )
    assert sig == exp
    assert N.verify(b"sample", sig, pk)
    assert not N.verify(b"tampered", sig, pk)
    assert not N.verify(b"sample", N.g1_mul((1, 2), 99), pk)


def test_predicates():
    assert N.g1_on_curve((1, 2))
    assert not N.g1_on_curve((1, 3))
    assert N.g2_on_curve(G2_GEN_AFF)
    assert N.g2_in_subgroup(G2_GEN_AFF)
    assert N.g2_in_subgroup(N.g2_mul(G2_GEN_AFF, 123456789))


def test_non_subgroup_twist_point_rejected():
    # find a twist-curve point and shift it off the r-torsion by checking
    # a random x until a point is found; with cofactor > 1 a random point
    # is almost surely outside the subgroup
    random.seed(104)
    while True:
        x = (random.randrange(P), random.randrange(P))
        rhs = F.fq2_add(F.fq2_mul(F.fq2_sq(x), x), C.B2)
        y = F.fq2_sqrt(rhs)
        if y is not None:
            break
    assert N.g2_on_curve((x, y))
    assert not N.g2_in_subgroup((x, y))


def test_protocol_layer_uses_native_consistently():
    # the protocol API must produce identical results whichever backend runs
    from bn254_tpu import ECDSA, PrivateKey, PublicKey

    sk = PrivateKey(123456789)
    pk = PublicKey.from_private_key(sk)
    sig = ECDSA.sign(b"dispatch-check", sk)
    ECDSA.verify(b"dispatch-check", sig, pk)  # must not raise
    exp = C.g1_to_affine(
        C.g1_mul_py(
            C.g1_from_affine(hash_to_g1_affine(b"dispatch-check")), 123456789
        )
    )
    assert C.g1_to_affine(sig.point) == exp
