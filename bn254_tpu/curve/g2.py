"""Device G2: E'/Fq2, y^2 = x^3 + 3/xi (batched Jacobian over the tower)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import G2_GEN_X, G2_GEN_Y, NLIMBS
from ..fields import limbs as L
from ..fields import tower as T
from ..host import curve as HC
from . import jacobian as J
from .ops import Fq2Ops

OPS = Fq2Ops

# b' = 3/xi as host ints (computed by the oracle; constant of the twist)
B2_HOST = HC.B2


def _bc_fq2(val, batch_shape):
    def bc(v):
        return L.bcast_to(L.to_mont(L.from_ints(v)), batch_shape)

    return T.Fq2(bc(val[0]), bc(val[1]))


def generator(batch_shape=()) -> J.JPoint:
    return J.JPoint(
        _bc_fq2(G2_GEN_X, batch_shape),
        _bc_fq2(G2_GEN_Y, batch_shape),
        T.fq2_one(batch_shape),
    )


def identity(batch_shape=()) -> J.JPoint:
    return J.identity(OPS, batch_shape)


def add(p1, p2):
    return J.add(OPS, p1, p2)


def double(p):
    return J.double(OPS, p)


def neg(p):
    return J.neg(OPS, p)


def scalar_mul(p, scalar_limbs, nbits: int = 256):
    return J.scalar_mul(OPS, p, scalar_limbs, nbits)


def to_affine(p):
    return J.to_affine(OPS, p)


def eq(p1, p2):
    return J.eq(OPS, p1, p2)


def is_on_curve_affine(x: T.Fq2, y: T.Fq2):
    y2 = T.fq2_sq(y)
    x3 = T.fq2_mul(T.fq2_sq(x), x)
    b2 = _bc_fq2(B2_HOST, OPS.batch_shape(x.c0))
    return T.fq2_eq(y2, T.fq2_add(x3, b2))


# ---------------------------------------------------------------------------
# host <-> device
# ---------------------------------------------------------------------------


def from_host(points) -> J.JPoint:
    """Host Jacobian Fq2 points -> batched device point."""
    single = not isinstance(points, list)
    if single:
        points = [points]

    def fq2_batch(vals):
        return T.Fq2(
            L.to_mont(L.from_ints([v[0] for v in vals])),
            L.to_mont(L.from_ints([v[1] for v in vals])),
        )

    dev = J.JPoint(
        fq2_batch([pt[0] for pt in points]),
        fq2_batch([pt[1] for pt in points]),
        fq2_batch([pt[2] for pt in points]),
    )
    if single:
        dev = jax.tree_util.tree_map(lambda a: a[:, 0], dev)
    return dev


def to_host_affine(p: J.JPoint):
    """Batched device point -> host affine ((x0,x1),(y0,y1)) or None list."""
    x, y, inf = to_affine(p)
    x0 = L.to_ints(L.from_mont(x.c0))
    x1 = L.to_ints(L.from_mont(x.c1))
    y0 = L.to_ints(L.from_mont(y.c0))
    y1 = L.to_ints(L.from_mont(y.c1))
    infs = np.asarray(inf)
    fx0, fx1, fy0, fy1, fi = (
        np.ravel(x0), np.ravel(x1), np.ravel(y0), np.ravel(y1), np.ravel(infs),
    )
    out = [
        None
        if fi[j]
        else ((int(fx0[j]), int(fx1[j])), (int(fy0[j]), int(fy1[j])))
        for j in range(fx0.shape[0])
    ]
    if infs.ndim == 0:
        return out[0]
    return out
