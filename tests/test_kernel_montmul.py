"""Pallas CIOS Montgomery-mul kernel vs the lax.scan reference path.

The kernel (kernels/montmul.py) produces the TPU headline number; this
suite executes the EXACT kernel body under the Pallas interpreter on CPU
and requires bit-identical limbs against limbs.mont_mul's scan path and
value equality against the Python-int Montgomery oracle — on random
inputs, boundary inputs (limbs at the 2^16-1 limb-lazy maximum, values
near the vmax contract), and non-BLOCK-aligned lane counts (padding
path). Covers VERDICT round-1 item 4.
"""

import random

import jax
import numpy as np
import pytest

from bn254_tpu.constants import LIMB_BITS, MONT_R, NLIMBS, P
from bn254_tpu.fields import limbs as L
from bn254_tpu.kernels import montmul as MK

RINV = pow(MONT_R, -1, P)


def _limbs_to_ints(arr):
    return L.to_ints(arr)


def _scan_mont_mul(a_el, b_el):
    """Force the scan path (pallas is already off on the CPU backend)."""
    assert not MK.use_pallas(a_el.batch_shape)
    return L.mont_mul(a_el, b_el)


def _oracle(a_vals, b_vals):
    return [(a * b * RINV) % P for a, b in zip(a_vals, b_vals)]


def _check(a_el, b_el):
    scan_out = jax.jit(lambda a, b: L.mont_mul(a, b))(a_el, b_el)
    kern_out = MK.montmul_batched(a_el.arr, b_el.arr, interpret=True)
    assert np.array_equal(np.asarray(scan_out.arr), np.asarray(kern_out)), (
        "kernel limbs differ from the scan path"
    )
    a_vals = _limbs_to_ints(a_el.arr).reshape(-1)
    b_vals = _limbs_to_ints(b_el.arr).reshape(-1)
    got = _limbs_to_ints(kern_out).reshape(-1)
    want = _oracle(a_vals, b_vals)
    for g, w in zip(got, want):
        assert int(g) % P == w % P


def test_kernel_random_block_aligned():
    rng = random.Random(101)
    n = MK.BLOCK  # one full block
    a = L.from_ints([rng.randrange(P) for _ in range(n)], vmax=P)
    b = L.from_ints([rng.randrange(P) for _ in range(n)], vmax=P)
    _check(a, b)


def test_kernel_random_padded_lanes():
    """Non-BLOCK-multiple lane count exercises the pad/slice path."""
    rng = random.Random(103)
    n = MK.BLOCK + 37
    a = L.from_ints([rng.randrange(P) for _ in range(n)], vmax=P)
    b = L.from_ints([rng.randrange(P) for _ in range(n)], vmax=P)
    _check(a, b)


def _lazy_boundary_el(n, top, rng=None, jitter=False):
    """Limb-lazy El with limbs at the 2^16-1 maximum and value ~top*2^255.

    Builds the raw limb array directly (bypassing from_ints' canonical
    radix-2^15 split) to hit the kernel's true input contract: limbs up
    to 2^16-1 as produced by one lazy add of two normalised elements.
    """
    arr = np.full((NLIMBS, n), (1 << 16) - 1, dtype=np.uint32)
    arr[NLIMBS - 1, :] = top
    if jitter:
        for j in range(n):
            i = rng.randrange(NLIMBS - 1)
            arr[i, j] = rng.randrange(1 << 16)
    vals = L.to_ints(arr).reshape(-1)
    vmax = int(max(vals)) + 1
    return L.El(jax.numpy.asarray(arr), vmax, 1 << 16)


def test_kernel_boundary_lazy_limbs():
    """Limbs at 2^16-1 (limb-lazy max) and values near the vmax contract:
    a.vmax*b.vmax + R*p must stay under 2^538 — pick top limbs so the
    product bound is within ~2x of the limit."""
    rng = random.Random(107)
    n = MK.BLOCK
    a = _lazy_boundary_el(n, top=0x7F, rng=rng, jitter=True)
    b = _lazy_boundary_el(n, top=0x7F, rng=rng, jitter=True)
    assert a.vmax * b.vmax + MONT_R * P < 1 << 538
    assert a.vmax * b.vmax + MONT_R * P > 1 << 520  # genuinely near the top
    _check(a, b)


def test_kernel_zero_and_one():
    ints = [0, 1, P - 1, P, MONT_R % P] + [2**k for k in range(0, 255, 16)]
    n = len(ints)
    a = L.from_ints(ints)
    b = L.from_ints(list(reversed(ints)))
    scan_out = jax.jit(lambda a, b: L.mont_mul(a, b))(a, b)
    kern_out = MK.montmul_batched(a.arr, b.arr, interpret=True)
    assert np.array_equal(np.asarray(scan_out.arr), np.asarray(kern_out))


def test_kernel_broadcasting():
    """(18,) x (18, B) broadcast: the scalar operand fans out per lane."""
    rng = random.Random(109)
    n = 64
    a = L.from_ints(rng.randrange(P))  # scalar El (18,)
    b = L.from_ints([rng.randrange(P) for _ in range(n)], vmax=P)
    kern_out = MK.montmul_batched(a.arr[:, None], b.arr, interpret=True)
    scan_out = jax.jit(lambda a, b: L.mont_mul(a, b))(
        L.El(a.arr[:, None], a.vmax, a.lmax), b
    )
    assert np.array_equal(np.asarray(scan_out.arr), np.asarray(kern_out))
