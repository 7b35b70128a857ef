"""Cross-chip collectives for BN254 batch verification.

The key reduction is an **all-reduce whose monoid is Fq12 multiplication**
(element-wise field product of Miller-loop values). XLA's `psum` only
knows +/min/max, so the product-reduce is built from log2(n) recursive-
doubling rounds of `ppermute` + local Fq12 multiplication — riding ICI
between chips and DCN between hosts, exactly the structure SURVEY.md §5.8
prescribes. Each round's fq12_mul renormalises the limb representation,
so no carry drift accumulates across rounds.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..fields import tower as T


def jacobian_allreduce_add(p, add_fn, axis_name: str, axis_size: int):
    """All-reduce a (per-shard) Jacobian point by group addition.

    Same recursive-doubling structure as `fq12_allreduce_mul`, with the
    branch-free point add as the monoid. Used to combine the per-shard
    weighted-signature sums in sharded aggregate verification.
    """
    assert axis_size & (axis_size - 1) == 0, "axis size must be a power of 2"
    rounds = int(math.log2(axis_size))
    for k in range(rounds):
        shift = 1 << k
        perm = [(i, (i + shift) % axis_size) for i in range(axis_size)]
        shifted = jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(x, axis_name, perm), p
        )
        p = add_fn(p, shifted)
    return p


def fq12_allreduce_mul(f: T.Fq12, axis_name: str, axis_size: int) -> T.Fq12:
    """Product of f over the named mesh axis, available on every member.

    Recursive doubling: after round k every rank holds the product of a
    2^(k+1)-sized contiguous (cyclic) group; for power-of-two axis sizes
    each rank ends with the full product. axis_size must be a power of 2
    (mesh shapes are under our control; asserted here).
    """
    assert axis_size & (axis_size - 1) == 0, "axis size must be a power of 2"
    rounds = int(math.log2(axis_size))
    perm_src_dst = lambda shift: [
        (i, (i + shift) % axis_size) for i in range(axis_size)
    ]
    for k in range(rounds):
        shift = 1 << k
        shifted = jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(x, axis_name, perm_src_dst(shift)), f
        )
        f = T.fq12_mul(f, shifted)
    return f
