"""Bit-exactness of the MXU fold-matmul Montgomery multiply (spike).

kernels/fold_mul.py must agree with the Python-int REDC oracle
(a*b*R^-1 mod p) for every input class the pipeline produces: canonical
values, lazy values up to STD_BOUND, lazy limbs, and adversarial
all-ones/max-limb patterns. The matmul path runs on whatever backend the
test session uses (CPU here — XLA lowers the bf16 dots identically in
exact-integer range).
"""

import random

import numpy as np
import pytest

from bn254_tpu.constants import MONT_R, NLIMBS, P
from bn254_tpu.fields import limbs as L
from bn254_tpu.kernels import fold_mul as FM

R_INV = pow(MONT_R, -1, P)
STD = L.STD_BOUND


def _oracle(a: int, b: int) -> int:
    return a * b * R_INV % P


def _check(avals, bvals, a_el=None, b_el=None):
    a_el = a_el if a_el is not None else L.from_ints(avals, vmax=max(avals) + 1)
    b_el = b_el if b_el is not None else L.from_ints(bvals, vmax=max(bvals) + 1)
    out = FM.fold_mul(a_el, b_el)
    assert out.lmax == 1 << 15
    assert out.vmax < 1 << 258  # the fold tail's contract
    got = [int(v) % P for v in L.to_ints(out)]
    want = [_oracle(a, b) for a, b in zip(avals, bvals)]
    assert got == want
    # the raw (non-canonical) value must respect the static bound
    raw = [int(v) for v in L.to_ints(out)]
    assert all(v < out.vmax for v in raw)


def test_canonical_random():
    rng = random.Random(20260820)
    avals = [rng.randrange(P) for _ in range(8)]
    bvals = [rng.randrange(P) for _ in range(8)]
    _check(avals, bvals)


def test_edge_values():
    avals = [0, 1, P - 1, P, MONT_R % P, (1 << 254) - 1, 2, P - 1]
    bvals = [1, 0, P - 1, P, P - 2, (1 << 253) + 12345, 2, 1]
    _check(avals, bvals)


def test_lazy_value_bounds_up_to_std():
    """Inputs tagged/valued near STD_BOUND (what pinned Miller carriers
    actually look like)."""
    rng = random.Random(7)
    avals = [STD - 1 - rng.randrange(1 << 64) for _ in range(4)]
    bvals = [STD - 1 - rng.randrange(1 << 64) for _ in range(4)]
    a_el = L.retag(L.from_ints(avals, vmax=max(avals) + 1), STD)
    b_el = L.retag(L.from_ints(bvals, vmax=max(bvals) + 1), STD)
    _check(avals, bvals, a_el, b_el)


def test_lazy_limbs():
    """Limb-lazy inputs (lmax 2^16, as add_mod outputs) take the group
    size-1 product path; fold_mul must not normalise-and-lose them."""
    rng = random.Random(99)
    avals = [rng.randrange(P) for _ in range(4)]
    bvals = [rng.randrange(P) for _ in range(4)]
    a_el = L.from_ints(avals, vmax=P)
    b_el = L.from_ints(bvals, vmax=P)
    a_lazy = L.add_mod(a_el, a_el)  # lmax 2^16, value 2a
    out = FM.fold_mul(a_lazy, b_el)
    got = [int(v) % P for v in L.to_ints(out)]
    want = [_oracle(2 * a, b) for a, b in zip(avals, bvals)]
    assert got == want


def test_max_limb_pattern():
    """All-ones limbs (value = 2^270 - 1 pattern capped by from_ints) —
    the largest column sums the product stage can see."""
    v = sum((0x7FFF) << (15 * i) for i in range(17)) + (0x7F << 255)
    _check([v, v], [v, 1])


def test_matches_mont_mul_scan():
    """Same residue as the production mont_mul on random STD inputs."""
    rng = random.Random(3)
    avals = [rng.randrange(P) * 17 % (1 << 260) for _ in range(4)]
    bvals = [rng.randrange(P) * 23 % (1 << 260) for _ in range(4)]
    a_el = L.from_ints(avals, vmax=max(avals) + 1)
    b_el = L.from_ints(bvals, vmax=max(bvals) + 1)
    ref = L.mont_mul(a_el, b_el)
    got = FM.fold_mul(a_el, b_el)
    ref_i = [int(v) % P for v in L.to_ints(ref)]
    got_i = [int(v) % P for v in L.to_ints(got)]
    assert ref_i == got_i


def test_fold_sqr_matches_oracle():
    rng = random.Random(42)
    vals = [rng.randrange(P) for _ in range(6)] + [0, 1, P - 1, P]
    a_el = L.from_ints(vals, vmax=max(vals) + 1)
    out = FM.fold_sqr(a_el)
    got = [int(v) % P for v in L.to_ints(out)]
    want = [_oracle(v, v) for v in vals]
    assert got == want
    assert out.vmax < 1 << 258 and out.lmax == 1 << 15


def test_fold_sqr_lazy_inputs():
    rng = random.Random(77)
    vals = [STD - 1 - rng.randrange(1 << 64) for _ in range(4)]
    a_el = L.retag(L.from_ints(vals, vmax=max(vals) + 1), STD)
    lazy = L.add_mod(a_el, L.from_ints([1] * 4, vmax=2))  # lmax 2^15+2
    out = FM.fold_sqr(lazy)
    got = [int(v) % P for v in L.to_ints(out)]
    want = [_oracle(v + 1, v + 1) for v in vals]
    assert got == want
