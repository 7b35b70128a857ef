"""G1/G2 host (oracle) group-arithmetic tests.

Wires up the go-ethereum precompile fixture (vendored at tests/data/bn256.json
from reference src/bn256.json — dead data in the reference, never loaded by
its code, SURVEY.md §2.1) as golden vectors for curve add and scalar mul,
plus structural group laws.
"""

import json
import os

import pytest

from bn254_tpu.constants import P, R
from bn254_tpu.host import curve as C
from bn254_tpu.host import field as F

_FIXTURE = os.path.join(os.path.dirname(__file__), "data", "bn256.json")
with open(_FIXTURE) as f:
    BN256_VECTORS = json.load(f)


def parse_pt(xh, yh):
    x, y = int(xh, 16), int(yh, 16)
    if x == 0 and y == 0:
        return None
    return (x, y)


def encode_pt(aff):
    if aff is None:
        return "0" * 128
    return f"{aff[0]:064x}{aff[1]:064x}"


@pytest.mark.parametrize("vec", BN256_VECTORS["add"])
def test_bn256_add_vectors(vec):
    p1 = C.g1_from_affine(parse_pt(vec["x1"], vec["y1"]))
    p2 = C.g1_from_affine(parse_pt(vec["x2"], vec["y2"]))
    res = C.g1_to_affine(C.g1_add(p1, p2))
    assert encode_pt(res) == vec["result"]


@pytest.mark.parametrize("vec", BN256_VECTORS["mul"])
def test_bn256_mul_vectors(vec):
    pt = C.g1_from_affine(parse_pt(vec["x"], vec["y"]))
    res = C.g1_to_affine(C.g1_mul(pt, int(vec["scalar"], 16)))
    assert encode_pt(res) == vec["result"]


def test_g1_group_laws():
    g = C.G1_ONE
    g2 = C.g1_double(g)
    g3a = C.g1_add(g2, g)
    g3b = C.g1_add(g, g2)
    assert C.g1_eq(g3a, g3b)
    # P + (-P) = identity
    assert C.g1_to_affine(C.g1_add(g, C.g1_neg(g))) is None
    # [r]G = identity
    assert C.g1_to_affine(C.g1_mul(g, R)) is None
    # scalar distributivity: [a+b]G = [a]G + [b]G
    a, b = 12345678901234567890, 98765432109876543210
    lhs = C.g1_mul(g, a + b)
    rhs = C.g1_add(C.g1_mul(g, a), C.g1_mul(g, b))
    assert C.g1_eq(lhs, rhs)


def test_g2_group_laws():
    g = C.G2_ONE
    assert C.g2_is_on_curve(C.g2_to_affine(g))
    assert C.g2_to_affine(C.g2_mul(g, R)) is None
    a, b = 31415926535897932384, 27182818284590452353
    lhs = C.g2_mul(g, a + b)
    rhs = C.g2_add(C.g2_mul(g, a), C.g2_mul(g, b))
    assert C.g2_eq(lhs, rhs)
    # doubling consistency
    assert C.g2_eq(C.g2_double(g), C.g2_mul(g, 2))


def test_g2_twist_b_constant():
    # b' = 3/xi; sanity: b' * xi == 3
    assert F.fq2_mul(C.B2, (9, 1)) == (3 % P, 0)
