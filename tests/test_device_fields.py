"""Device limb engine + tower fields vs the host oracle."""

import random

import jax
import numpy as np
import pytest

from bn254_tpu.constants import P
from bn254_tpu.fields import limbs as L
from bn254_tpu.fields import tower as T
from bn254_tpu.host import field as HF

random.seed(42)
B = 8
XS = [random.randrange(P) for _ in range(B)]
YS = [random.randrange(P) for _ in range(B)]


def ints(el):
    return [int(v) for v in L.to_ints(L.from_mont(el))]


@pytest.fixture(scope="module")
def mont_xy():
    return L.to_mont(L.from_ints(XS)), L.to_mont(L.from_ints(YS))


def test_mont_roundtrip(mont_xy):
    am, _ = mont_xy
    assert ints(am) == XS


def test_mul_add_sub_neg(mont_xy):
    am, bm = mont_xy
    assert ints(L.mont_mul(am, bm)) == [(x * y) % P for x, y in zip(XS, YS)]
    assert ints(L.add_mod(am, bm)) == [(x + y) % P for x, y in zip(XS, YS)]
    assert ints(L.sub_mod(am, bm)) == [(x - y) % P for x, y in zip(XS, YS)]
    assert ints(L.neg_mod(am)) == [(-x) % P for x in XS]
    assert ints(L.mul_small(am, 9)) == [(9 * x) % P for x in XS]


def test_lazy_chains(mont_xy):
    """Lazy adds feed multiplication without normalisation."""
    am, bm = mont_xy
    s = L.add_mod(am, bm)
    assert s.lmax > 1 << 15  # actually lazy
    assert ints(L.mont_mul(s, s)) == [
        ((x + y) ** 2) % P for x, y in zip(XS, YS)
    ]
    q = L.add_mod(L.add_mod(am, am), L.add_mod(am, am))
    assert ints(L.mont_mul(q, bm)) == [(4 * x * y) % P for x, y in zip(XS, YS)]


def test_inv_sqrt(mont_xy):
    am, _ = mont_xy
    inv = jax.jit(L.inv_mod)(am)
    assert ints(L.mont_mul(inv, am)) == [1] * B
    sq = L.mont_mul(am, am)
    r = jax.jit(L.sqrt_candidate)(sq)
    assert ints(L.mont_mul(r, r)) == [(x * x) % P for x in XS]


def test_vreduce(mont_xy):
    am, bm = mont_xy
    big = L.add_mod(L.add_mod(am, bm), L.add_mod(am, bm))
    red = L.vreduce(big)
    assert red.vmax < 1 << 256
    assert ints(red) == [(2 * (x + y)) % P for x, y in zip(XS, YS)]


def test_canon_edges():
    edge = L.from_ints([0, 1, P - 1, P, 2 * P - 1, 2 * P], vmax=2 * P + 1)
    got = [int(v) for v in L.to_ints(L.canon(edge))]
    assert got == [0, 1, P - 1, 0, P - 1, 0]


def test_eq_is_zero(mont_xy):
    am, bm = mont_xy
    assert bool(L.eq(am, am).all())
    assert not bool(L.eq(am, bm).any())
    assert bool(L.is_zero(L.sub_mod(am, am)).all())


# ---------------------------------------------------------------------------
# tower vs oracle
# ---------------------------------------------------------------------------


def rand_fq12():
    return tuple(
        tuple((random.randrange(P), random.randrange(P)) for _ in range(3))
        for _ in range(2)
    )


HAS = [rand_fq12() for _ in range(4)]
HBS = [rand_fq12() for _ in range(4)]


def batch12(hs):
    def conv(path):
        return L.to_mont(L.from_ints([path(h) for h in hs]))

    return T.Fq12(
        T.Fq6(
            *[
                T.Fq2(
                    conv(lambda h, i=i: h[0][i][0]),
                    conv(lambda h, i=i: h[0][i][1]),
                )
                for i in range(3)
            ]
        ),
        T.Fq6(
            *[
                T.Fq2(
                    conv(lambda h, i=i: h[1][i][0]),
                    conv(lambda h, i=i: h[1][i][1]),
                )
                for i in range(3)
            ]
        ),
    )


def host_list(dev, n):
    outs = T.fq12_to_host(dev)
    return [
        tuple(
            tuple((int(c2[0][j]), int(c2[1][j])) for c2 in c6) for c6 in outs
        )
        for j in range(n)
    ]


@pytest.fixture(scope="module")
def dev12():
    return batch12(HAS), batch12(HBS)


def test_fq12_mul_sq(dev12):
    da, db = dev12
    got = host_list(jax.jit(T.fq12_mul)(da, db), 4)
    assert got == [HF._canon12(HF.fq12_mul(a, b)) for a, b in zip(HAS, HBS)]
    got = host_list(jax.jit(T.fq12_sq)(da), 4)
    assert got == [HF._canon12(HF.fq12_sq(a)) for a in HAS]


def test_fq12_frob_conj(dev12):
    da, _ = dev12
    for k in (1, 2, 3):
        got = host_list(jax.jit(lambda a, k=k: T.fq12_frob(a, k))(da), 4)
        assert got == [HF._canon12(HF.fq12_frob(a, k)) for a in HAS]
    got = host_list(T.fq12_conj(da), 4)
    assert got == [HF._canon12(HF.fq12_conj(a)) for a in HAS]


def test_fq12_inv(dev12):
    da, _ = dev12
    got = host_list(jax.jit(T.fq12_inv)(da), 4)
    assert got == [HF._canon12(HF.fq12_inv(a)) for a in HAS]
