"""Device (TPU) tower fields Fq2 / Fq6 / Fq12 over the limb engine.

TPU-first structure: every tower multiplication gathers its leaf Fq
multiplications into ONE batched `mont_mul` call by stacking operands along
an internal batch axis (axis 1, after the limb axis):

    Fq2  mul -> 3 leaves   (Karatsuba)
    Fq6  mul -> 6 Fq2 muls -> 18 leaves
    Fq12 mul -> 3 Fq6 muls -> 54 leaves, one mont_mul

This keeps the traced graph small (one multiplier instantiation per tower
op) and keeps the VPU lanes full: the internal leaf axis multiplies the
user batch.

Tower (same as the host oracle, matching alt_bn128 convention):
    Fq2  = Fq[i]/(i^2+1),  Fq6 = Fq2[v]/(v^3 - xi),  Fq12 = Fq6[w]/(w^2 - v)
with xi = 9 + i.

All elements live in the Montgomery <= 2p domain of `limbs`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import NLIMBS, P
from ..host import field as HF
from . import limbs as L


class Fq2(NamedTuple):
    c0: jnp.ndarray  # (16, *batch)
    c1: jnp.ndarray


class Fq6(NamedTuple):
    c0: Fq2
    c1: Fq2
    c2: Fq2


class Fq12(NamedTuple):
    c0: Fq6
    c1: Fq6


# ---------------------------------------------------------------------------
# stacking helpers (gather independent ops into one batched call)
# ---------------------------------------------------------------------------


def _stack(arrs):
    return jnp.stack(arrs, axis=1)


def _unstack(arr, n):
    return [arr[:, i] for i in range(n)]


def fq2_stack(elems):
    return Fq2(_stack([e.c0 for e in elems]), _stack([e.c1 for e in elems]))


def fq2_unstack(e: Fq2, n: int):
    return [Fq2(a, b) for a, b in zip(_unstack(e.c0, n), _unstack(e.c1, n))]


def fq6_stack(elems):
    return Fq6(
        fq2_stack([e.c0 for e in elems]),
        fq2_stack([e.c1 for e in elems]),
        fq2_stack([e.c2 for e in elems]),
    )


def fq6_unstack(e: Fq6, n: int):
    return [
        Fq6(a, b, c)
        for a, b, c in zip(
            fq2_unstack(e.c0, n), fq2_unstack(e.c1, n), fq2_unstack(e.c2, n)
        )
    ]


# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------


def _mont_const(x: int) -> jnp.ndarray:
    """Host int -> (16,) Montgomery-form limb constant."""
    from ..constants import MONT_R_MOD_P

    return L.const_limbs((x * MONT_R_MOD_P) % P)


def const_fq2(value: tuple, like: jnp.ndarray) -> Fq2:
    """(c0, c1) host ints -> Montgomery Fq2 broadcast against `like`."""
    shape = (NLIMBS,) + (1,) * (like.ndim - 1)
    return Fq2(
        _mont_const(value[0]).reshape(shape),
        _mont_const(value[1]).reshape(shape),
    )


def fq2_zero(batch_shape=()) -> Fq2:
    z = L.mont_zero(batch_shape)
    return Fq2(z, z)


def fq2_one(batch_shape=()) -> Fq2:
    return Fq2(L.mont_one(batch_shape), L.mont_zero(batch_shape))


def fq6_zero(batch_shape=()) -> Fq6:
    z = fq2_zero(batch_shape)
    return Fq6(z, z, z)


def fq6_one(batch_shape=()) -> Fq6:
    return Fq6(fq2_one(batch_shape), fq2_zero(batch_shape), fq2_zero(batch_shape))


def fq12_zero(batch_shape=()) -> Fq12:
    return Fq12(fq6_zero(batch_shape), fq6_zero(batch_shape))


def fq12_one(batch_shape=()) -> Fq12:
    return Fq12(fq6_one(batch_shape), fq6_zero(batch_shape))


# ---------------------------------------------------------------------------
# Fq2 arithmetic
# ---------------------------------------------------------------------------


def fq2_add(a: Fq2, b: Fq2) -> Fq2:
    return Fq2(L.add_mod(a.c0, b.c0), L.add_mod(a.c1, b.c1))


def fq2_sub(a: Fq2, b: Fq2) -> Fq2:
    return Fq2(L.sub_mod(a.c0, b.c0), L.sub_mod(a.c1, b.c1))


def fq2_neg(a: Fq2) -> Fq2:
    return Fq2(L.neg_mod(a.c0), L.neg_mod(a.c1))


def fq2_conj(a: Fq2) -> Fq2:
    return Fq2(a.c0, L.neg_mod(a.c1))


def fq2_double(a: Fq2) -> Fq2:
    return Fq2(L.add_mod(a.c0, a.c0), L.add_mod(a.c1, a.c1))


def fq2_mul(a: Fq2, b: Fq2) -> Fq2:
    """Karatsuba: 3 leaf muls in one batched mont_mul."""
    sa = L.add_mod(a.c0, a.c1)
    sb = L.add_mod(b.c0, b.c1)
    prods = L.mont_mul(_stack([a.c0, a.c1, sa]), _stack([b.c0, b.c1, sb]))
    t0, t1, t2 = _unstack(prods, 3)
    return Fq2(L.sub_mod(t0, t1), L.sub_mod(L.sub_mod(t2, t0), t1))


def fq2_sq(a: Fq2) -> Fq2:
    """(a0+a1)(a0-a1) and 2*a0*a1 — 2 leaf muls in one call."""
    s = L.add_mod(a.c0, a.c1)
    d = L.sub_mod(a.c0, a.c1)
    prods = L.mont_mul(_stack([s, a.c0]), _stack([d, L.add_mod(a.c1, a.c1)]))
    t0, t1 = _unstack(prods, 2)
    return Fq2(t0, t1)


def fq2_mul_fq(a: Fq2, s: jnp.ndarray) -> Fq2:
    prods = L.mont_mul(_stack([a.c0, a.c1]), _stack([s, s]))
    t0, t1 = _unstack(prods, 2)
    return Fq2(t0, t1)


def fq2_mul_small(a: Fq2, k: int) -> Fq2:
    return Fq2(mul_small(a.c0, k), mul_small(a.c1, k))


def fq2_mul_xi(a: Fq2) -> Fq2:
    """Multiply by xi = 9 + i: (9 c0 - c1, c0 + 9 c1)."""
    n0 = mul_small(a.c0, 9)
    n1 = mul_small(a.c1, 9)
    return Fq2(L.sub_mod(n0, a.c1), L.add_mod(a.c0, n1))


def fq2_inv(a: Fq2) -> Fq2:
    norm = L.add_mod(L.mont_mul(a.c0, a.c0), L.mont_mul(a.c1, a.c1))
    inv = L.inv_mod(norm)
    prods = L.mont_mul(_stack([a.c0, L.neg_mod(a.c1)]), _stack([inv, inv]))
    t0, t1 = _unstack(prods, 2)
    return Fq2(t0, t1)


def fq2_eq(a: Fq2, b: Fq2) -> jnp.ndarray:
    return L.eq(a.c0, b.c0) & L.eq(a.c1, b.c1)


def fq2_is_zero(a: Fq2) -> jnp.ndarray:
    return L.is_zero(a.c0) & L.is_zero(a.c1)


def fq2_select(mask, t: Fq2, f: Fq2) -> Fq2:
    return Fq2(L.select(mask, t.c0, f.c0), L.select(mask, t.c1, f.c1))


# small-integer multiple with binary-ladder reduction back to <= 2p
_P16 = L.const_limbs(16 * P, NLIMBS + 1)
_P8 = L.const_limbs(8 * P, NLIMBS + 1)
_P4 = L.const_limbs(4 * P, NLIMBS + 1)
_P2_17 = L.const_limbs(2 * P, NLIMBS + 1)


def mul_small(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """a * k for a small positive constant k <= 15 (a <= 2p -> out <= 2p).

    Bound: s = k*a <= 30p < 32p; the 16p/8p/4p/2p conditional-subtract
    ladder reduces any value < 32p to <= 2p."""
    assert 0 < k <= 15
    s = L.carry(a * jnp.uint32(k), NLIMBS + 1)
    for m in (_P16, _P8, _P4, _P2_17):
        s = L.cond_sub(s, m)
    return s[:NLIMBS]


# ---------------------------------------------------------------------------
# Fq6 arithmetic (Karatsuba-style, 6 Fq2 muls per mul, batched)
# ---------------------------------------------------------------------------


def fq6_add(a: Fq6, b: Fq6) -> Fq6:
    return Fq6(fq2_add(a.c0, b.c0), fq2_add(a.c1, b.c1), fq2_add(a.c2, b.c2))


def fq6_sub(a: Fq6, b: Fq6) -> Fq6:
    return Fq6(fq2_sub(a.c0, b.c0), fq2_sub(a.c1, b.c1), fq2_sub(a.c2, b.c2))


def fq6_neg(a: Fq6) -> Fq6:
    return Fq6(fq2_neg(a.c0), fq2_neg(a.c1), fq2_neg(a.c2))


def fq6_mul(a: Fq6, b: Fq6) -> Fq6:
    """Toom-style interpolation (same identity as host fq6_mul): 6 Fq2 muls
    [t0=a0b0, t1=a1b1, t2=a2b2, u0=(a1+a2)(b1+b2), u1=(a0+a1)(b0+b1),
     u2=(a0+a2)(b0+b2)] gathered into one batched fq2_mul (18 leaves)."""
    astack = fq2_stack(
        [
            a.c0,
            a.c1,
            a.c2,
            fq2_add(a.c1, a.c2),
            fq2_add(a.c0, a.c1),
            fq2_add(a.c0, a.c2),
        ]
    )
    bstack = fq2_stack(
        [
            b.c0,
            b.c1,
            b.c2,
            fq2_add(b.c1, b.c2),
            fq2_add(b.c0, b.c1),
            fq2_add(b.c0, b.c2),
        ]
    )
    t0, t1, t2, u0, u1, u2 = fq2_unstack(fq2_mul(astack, bstack), 6)
    c0 = fq2_add(t0, fq2_mul_xi(fq2_sub(fq2_sub(u0, t1), t2)))
    c1 = fq2_add(fq2_sub(fq2_sub(u1, t0), t1), fq2_mul_xi(t2))
    c2 = fq2_add(fq2_sub(fq2_sub(u2, t0), t2), t1)
    return Fq6(c0, c1, c2)


def fq6_sq(a: Fq6) -> Fq6:
    return fq6_mul(a, a)


def fq6_mul_by_v(a: Fq6) -> Fq6:
    return Fq6(fq2_mul_xi(a.c2), a.c0, a.c1)


def fq6_mul_fq2(a: Fq6, s: Fq2) -> Fq6:
    st = fq2_stack([s, s, s])
    r = fq2_mul(fq6_to_stack(a), st)
    p0, p1, p2 = fq2_unstack(r, 3)
    return Fq6(p0, p1, p2)


def fq6_to_stack(a: Fq6) -> Fq2:
    return fq2_stack([a.c0, a.c1, a.c2])


def fq6_inv(a: Fq6) -> Fq6:
    c0 = fq2_sub(fq2_sq(a.c0), fq2_mul_xi(fq2_mul(a.c1, a.c2)))
    c1 = fq2_sub(fq2_mul_xi(fq2_sq(a.c2)), fq2_mul(a.c0, a.c1))
    c2 = fq2_sub(fq2_sq(a.c1), fq2_mul(a.c0, a.c2))
    t = fq2_add(
        fq2_add(
            fq2_mul_xi(fq2_mul(a.c2, c1)), fq2_mul_xi(fq2_mul(a.c1, c2))
        ),
        fq2_mul(a.c0, c0),
    )
    t_inv = fq2_inv(t)
    return Fq6(fq2_mul(c0, t_inv), fq2_mul(c1, t_inv), fq2_mul(c2, t_inv))


def fq6_eq(a: Fq6, b: Fq6) -> jnp.ndarray:
    return fq2_eq(a.c0, b.c0) & fq2_eq(a.c1, b.c1) & fq2_eq(a.c2, b.c2)


def fq6_select(mask, t: Fq6, f: Fq6) -> Fq6:
    return Fq6(
        fq2_select(mask, t.c0, f.c0),
        fq2_select(mask, t.c1, f.c1),
        fq2_select(mask, t.c2, f.c2),
    )


# ---------------------------------------------------------------------------
# Fq12 arithmetic
# ---------------------------------------------------------------------------


def fq12_add(a: Fq12, b: Fq12) -> Fq12:
    return Fq12(fq6_add(a.c0, b.c0), fq6_add(a.c1, b.c1))


def fq12_sub(a: Fq12, b: Fq12) -> Fq12:
    return Fq12(fq6_sub(a.c0, b.c0), fq6_sub(a.c1, b.c1))


def fq12_mul(a: Fq12, b: Fq12) -> Fq12:
    """Karatsuba over Fq6: 3 Fq6 muls in one batched call (54 leaves)."""
    astack = fq6_stack([a.c0, a.c1, fq6_add(a.c0, a.c1)])
    bstack = fq6_stack([b.c0, b.c1, fq6_add(b.c0, b.c1)])
    t0, t1, t2 = fq6_unstack(fq6_mul(astack, bstack), 3)
    c0 = fq6_add(t0, fq6_mul_by_v(t1))
    c1 = fq6_sub(fq6_sub(t2, t0), t1)
    return Fq12(c0, c1)


def fq12_sq(a: Fq12) -> Fq12:
    """Complex-style squaring: c0' = (c0+c1)(c0+v*c1) - t - v*t, c1' = 2t
    with t = c0*c1 — 2 Fq6 muls in one batched call."""
    t_and_u = fq6_unstack(
        fq6_mul(
            fq6_stack([a.c0, fq6_add(a.c0, a.c1)]),
            fq6_stack([a.c1, fq6_add(a.c0, fq6_mul_by_v(a.c1))]),
        ),
        2,
    )
    t, u = t_and_u
    c0 = fq6_sub(fq6_sub(u, t), fq6_mul_by_v(t))
    c1 = fq6_add(t, t)
    return Fq12(c0, c1)


def fq12_conj(a: Fq12) -> Fq12:
    """w -> -w: the p^6 Frobenius (inverse in the cyclotomic subgroup)."""
    return Fq12(a.c0, fq6_neg(a.c1))


def fq12_neg(a: Fq12) -> Fq12:
    return Fq12(fq6_neg(a.c0), fq6_neg(a.c1))


def fq12_inv(a: Fq12) -> Fq12:
    t = fq6_sub(fq6_sq(a.c0), fq6_mul_by_v(fq6_sq(a.c1)))
    t_inv = fq6_inv(t)
    return Fq12(fq6_mul(a.c0, t_inv), fq6_neg(fq6_mul(a.c1, t_inv)))


def fq12_eq(a: Fq12, b: Fq12) -> jnp.ndarray:
    return fq6_eq(a.c0, b.c0) & fq6_eq(a.c1, b.c1)


def fq12_is_one(a: Fq12) -> jnp.ndarray:
    batch = a.c0.c0.c0.shape[1:]
    return fq12_eq(a, fq12_one(batch))


def fq12_select(mask, t: Fq12, f: Fq12) -> Fq12:
    return Fq12(
        fq6_select(mask, t.c0, f.c0), fq6_select(mask, t.c1, f.c1)
    )


# ---------------------------------------------------------------------------
# Frobenius endomorphism (coefficients precomputed from the host oracle)
# ---------------------------------------------------------------------------


def _frob_tables():
    tables = {}
    for k in (1, 2, 3):
        tables[k] = (
            HF.FROB_GAMMA_V[k],
            HF.FROB_GAMMA_V2[k],
            HF.FROB_GAMMA_W[k],
        )
    return tables


_FROB = _frob_tables()


def _fq2_frob(a: Fq2, k: int) -> Fq2:
    return a if k % 2 == 0 else fq2_conj(a)


def fq12_frob(a: Fq12, k: int) -> Fq12:
    """a^(p^k) for k in {1, 2, 3}."""
    gv, gv2, gw = _FROB[k]
    like = a.c0.c0.c0
    gv_c = const_fq2(gv, like)
    gv2_c = const_fq2(gv2, like)
    gw_c = const_fq2(gw, like)

    c0 = Fq6(
        _fq2_frob(a.c0.c0, k),
        fq2_mul(_fq2_frob(a.c0.c1, k), gv_c),
        fq2_mul(_fq2_frob(a.c0.c2, k), gv2_c),
    )
    c1 = Fq6(
        fq2_mul(_fq2_frob(a.c1.c0, k), gw_c),
        fq2_mul(_fq2_frob(a.c1.c1, k), fq2_mul(gv_c, gw_c)),
        fq2_mul(_fq2_frob(a.c1.c2, k), fq2_mul(gv2_c, gw_c)),
    )
    return Fq12(c0, c1)


# ---------------------------------------------------------------------------
# host <-> device conversion (tuples of ints <-> Montgomery limb tensors)
# ---------------------------------------------------------------------------


def fq2_from_ints(vals) -> Fq2:
    """vals: (c0, c1) ints or nested lists with trailing pair structure."""
    c0, c1 = vals
    return Fq2(L.to_mont(L.from_ints(c0)), L.to_mont(L.from_ints(c1)))


def fq2_to_ints(a: Fq2):
    return (L.to_ints(L.from_mont(a.c0)), L.to_ints(L.from_mont(a.c1)))


def fq12_from_host(h, batch_shape=()) -> Fq12:
    """Host oracle Fq12 tuple -> device Fq12 (broadcast to batch_shape)."""
    import numpy as np

    def conv(x):
        arr = L.to_mont(L.from_ints(x))
        return jnp.broadcast_to(
            arr.reshape((NLIMBS,) + (1,) * len(batch_shape)),
            (NLIMBS,) + tuple(batch_shape),
        )

    (a0, a1, a2), (b0, b1, b2) = h
    return Fq12(
        Fq6(
            Fq2(conv(a0[0]), conv(a0[1])),
            Fq2(conv(a1[0]), conv(a1[1])),
            Fq2(conv(a2[0]), conv(a2[1])),
        ),
        Fq6(
            Fq2(conv(b0[0]), conv(b0[1])),
            Fq2(conv(b1[0]), conv(b1[1])),
            Fq2(conv(b2[0]), conv(b2[1])),
        ),
    )


def fq12_to_host(a: Fq12):
    """Device Fq12 -> host oracle tuples (batch element 0 if batched, or
    object arrays for full batches)."""

    def conv(x):
        return L.to_ints(L.from_mont(x))

    return (
        (
            (conv(a.c0.c0.c0), conv(a.c0.c0.c1)),
            (conv(a.c0.c1.c0), conv(a.c0.c1.c1)),
            (conv(a.c0.c2.c0), conv(a.c0.c2.c1)),
        ),
        (
            (conv(a.c1.c0.c0), conv(a.c1.c0.c1)),
            (conv(a.c1.c1.c0), conv(a.c1.c1.c1)),
            (conv(a.c1.c2.c0), conv(a.c1.c2.c1)),
        ),
    )
