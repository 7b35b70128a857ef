"""Oracle pairing tests: bilinearity, non-degeneracy, batch product semantics."""

from bn254_tpu.host import curve as C
from bn254_tpu.host import field as F
from bn254_tpu.host import pairing as PR


def test_bilinearity():
    e = PR.pairing(C.G1_ONE, C.G2_ONE)
    e_sq = F.fq12_mul(e, e)
    assert PR.gt_eq(PR.pairing(C.g1_mul(C.G1_ONE, 2), C.G2_ONE), e_sq)
    assert PR.gt_eq(PR.pairing(C.G1_ONE, C.g2_mul(C.G2_ONE, 2)), e_sq)


def test_bilinearity_random_scalars():
    a, b = 987654321987654321, 123456789123456789
    lhs = PR.pairing(C.g1_mul(C.G1_ONE, a), C.g2_mul(C.G2_ONE, b))
    rhs = F.fq12_pow(PR.pairing(C.G1_ONE, C.G2_ONE), a * b)
    assert PR.gt_eq(lhs, rhs)


def test_non_degenerate():
    assert not PR.gt_eq(PR.pairing(C.G1_ONE, C.G2_ONE), PR.GT_ONE)


def test_batch_product_cancellation():
    # e(P, Q) * e(-P, Q) == 1 with one shared final exponentiation
    res = PR.pairing_batch(
        [(C.G1_ONE, C.G2_ONE), (C.g1_neg(C.G1_ONE), C.G2_ONE)]
    )
    assert PR.gt_eq(res, PR.GT_ONE)


def test_pairing_with_identity_is_one():
    res = PR.pairing(C.G1_IDENTITY, C.G2_ONE)
    assert PR.gt_eq(res, PR.GT_ONE)
    res = PR.pairing(C.G1_ONE, C.G2_IDENTITY)
    assert PR.gt_eq(res, PR.GT_ONE)


def test_frobenius_consistency():
    # fq12_frob(a, 1) must equal a^p
    a = PR.pairing(C.g1_mul(C.G1_ONE, 7), C.g2_mul(C.G2_ONE, 9))
    from bn254_tpu.constants import P

    assert F.fq12_eq(F.fq12_frob(a, 1), F.fq12_pow(a, P))
    assert F.fq12_eq(F.fq12_frob(a, 2), F.fq12_pow(a, P * P))
