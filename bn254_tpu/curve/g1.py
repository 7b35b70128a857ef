"""Device G1: E/Fq, y^2 = x^3 + 3 (batched Jacobian over the limb engine)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import B, G1_GEN, NLIMBS
from ..fields import limbs as L
from ..fields import tower as T
from . import jacobian as J
from .ops import FqOps

OPS = FqOps


def generator(batch_shape=()) -> J.JPoint:
    def bc(v):
        return L.bcast_to(L.to_mont(L.from_ints(v)), batch_shape)

    return J.JPoint(bc(G1_GEN[0]), bc(G1_GEN[1]), L.mont_one(batch_shape))


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


def is_on_curve_affine(x, y):
    """y^2 == x^3 + 3 for Montgomery-domain affine coords (batch bool)."""
    y2 = L.mont_sqr(y)
    x3 = L.mont_mul(L.mont_sqr(x), x)
    b = L.mul_small(L.mont_one(x.batch_shape), B)
    return L.eq(y2, L.add_mod(x3, b))


# ---------------------------------------------------------------------------
# host <-> device
# ---------------------------------------------------------------------------


def from_host(points) -> J.JPoint:
    """Host Jacobian int points (list or single) -> batched device point.

    Accepts the host oracle representation (X, Y, Z ints, identity Z=0).
    """
    single = not isinstance(points, (list, tuple)) or (
        len(points) == 3 and isinstance(points[0], int)
    )
    if single:
        points = [points]
    xs = [pt[0] for pt in points]
    ys = [pt[1] for pt in points]
    zs = [pt[2] for pt in points]
    dev = J.JPoint(
        L.to_mont(L.from_ints(xs)),
        L.to_mont(L.from_ints(ys)),
        L.to_mont(L.from_ints(zs)),
    )
    if single:
        dev = jax.tree_util.tree_map(lambda a: a[:, 0], dev)
    return dev


def to_host_affine(p: J.JPoint):
    """Batched device point -> list of host affine tuples (None = identity)."""
    x, y, inf = to_affine(p)
    xi = L.to_ints(L.from_mont(x))
    yi = L.to_ints(L.from_mont(y))
    infs = np.asarray(inf)
    flat_x, flat_y, flat_i = (
        np.ravel(xi), np.ravel(yi), np.ravel(infs),
    )
    out = [
        None if flat_i[j] else (int(flat_x[j]), int(flat_y[j]))
        for j in range(flat_x.shape[0])
    ]
    if infs.ndim == 0:
        return out[0]
    return out
