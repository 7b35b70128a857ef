"""Shared-squaring constant-Q 2-pair Miller loop (pairing/precompute.py +
miller._miller_loop_pair2_unrolled) — equivalence and bound coverage.

The pair2 pipeline replaces the independent tier's stacked-pair Miller
loop (2 accumulators, 2 fq12_sq per digit, pair-axis product) with ONE
accumulator per tuple: sq once, fold the variable-Q line, fold a
host-precomputed constant-Q line. These tests pin:

1. numeric: pair2 == fq12_mul(miller(P0,Q0), miller(P1,Qc)) on a
   truncated NAF schedule covering both add signs + the Frobenius adds
   (CPU, fused_op routed to per-body jits, same pattern as
   tests/test_bound_pinning.py).
2. metadata: the full pair2 pipeline (device hash -> pairing_check2 ->
   final exp) traces via jax.eval_shape at REAL producer bounds.
3. schedule: precompute emits exactly one triple per device launch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bn254_tpu import config as C
from bn254_tpu.fields import limbs as L
from bn254_tpu.fields import tower as T
from bn254_tpu.hash import tai_batch as TB
from bn254_tpu.host import curve as HC
from bn254_tpu.kernels import fused as FK
from bn254_tpu.pairing import final_exp as FE
from bn254_tpu.pairing import miller as M
from bn254_tpu.pairing import precompute as PC
from bn254_tpu.utils import convert as CV

MSGS = [b"sample", b"helloo"]  # ctrs < 4 (see test_bound_pinning)

NEG_G2_AFF = HC.g2_to_affine(HC.g2_neg(HC.G2_ONE))


@pytest.fixture()
def jit_routed_bodies(monkeypatch):
    routed = {}

    def plain(fn, key, *args, interpret=False):
        if key not in routed:
            routed[key] = jax.jit(fn)
        return routed[key](*args)

    monkeypatch.setattr(FK, "fused_op", plain)
    monkeypatch.setattr(T, "_use_fused", lambda *els: not L._KERNEL_MODE)
    yield


def _canon12(x):
    return np.stack([np.asarray(L.canon(e).arr) for e in T._fq12_els(x)])


@pytest.mark.parametrize("q_const", [HC.g2_neg(HC.G2_ONE), HC.G2_ONE])
def test_pair2_matches_pair_product_truncated(jit_routed_bodies, q_const):
    """pair2 unrolled == product of the two independent scan Miller
    values, truncated NAF with both add signs (+ the Frobenius adds),
    for both constant second points the protocol uses (-G2::one in
    verify, +G2::one in the key-consistency check)."""
    naf = (1, -1)
    B = 2
    sks = [7, 11]
    hx, hy = CV.g1_batch_to_device_affine(
        [HC.g1_mul(HC.G1_ONE, 3 + i) for i in range(B)]
    )
    sx, sy = CV.g1_batch_to_device_affine(
        [HC.g1_mul(HC.G1_ONE, 100 + i) for i in range(B)]
    )
    pqx, pqy = CV.g2_batch_to_device_affine(
        [HC.g2_mul(HC.G2_ONE, k) for k in sks]
    )
    coeffs = PC.g2_line_coeffs(HC.g2_to_affine(q_const), naf=naf)
    got = _canon12(
        M._miller_loop_pair2_unrolled(hx, hy, pqx, pqy, sx, sy, coeffs,
                                      naf=naf)
    )

    ngx, ngy = CV.g2_const_affine(q_const, (B,))
    scan = jax.jit(
        lambda a, b, c, d: M._miller_loop_scan(a, b, c, d, naf=naf)
    )
    f0 = scan(hx, hy, pqx, pqy)
    f1 = scan(sx, sy, ngx, ngy)
    want = _canon12(jax.jit(T.fq12_mul)(f0, f1))
    assert np.array_equal(got, want)


def test_pair2_pipeline_traces_on_hash_bounds(monkeypatch):
    """Full pair2 pipeline traces (eval_shape) at real hash bounds."""
    from bn254_tpu.dist import batch_verify as BV

    def plain(fn, key, *args, interpret=False):
        return fn(*args)

    monkeypatch.setattr(FK, "fused_op", plain)
    monkeypatch.setattr(T, "_use_fused", lambda *els: not L._KERNEL_MODE)
    monkeypatch.setattr(C, "DEFAULT", C.DEFAULT.replace(pair2_miller=True))
    naf6 = M._ATE_NAF[:6]
    win3 = FE._U_WINDOWS[:3]
    monkeypatch.setattr(M, "_ATE_NAF", naf6)
    monkeypatch.setattr(FE, "_U_WINDOWS", win3)
    PC.neg_g2_one_coeffs.cache_clear()
    try:
        blocks, w, s = TB.prepare_blocks_host(MSGS)
        sx, sy = CV.g1_batch_to_device_affine(
            [HC.g1_mul(HC.G1_ONE, 3 + i) for i in range(2)]
        )
        pqx, pqy = CV.g2_batch_to_device_affine(
            [HC.g2_mul(HC.G2_ONE, 3 + i) for i in range(2)]
        )

        def pipeline(blocks, sx, sy, pqx, pqy):
            hx, hy, found, _ = TB.hash_to_g1_batch(
                blocks, w, s, k_candidates=4
            )
            return BV.verify_batch_independent(
                hx, hy, sx, sy, pqx, pqy
            ), found

        out, _ = jax.eval_shape(
            pipeline, jnp.asarray(blocks), sx, sy, pqx, pqy
        )
        assert out.shape == (2,) and out.dtype == jnp.bool_
    finally:
        PC.neg_g2_one_coeffs.cache_clear()


def test_pair2_coeff_schedule_counts():
    coeffs = PC.neg_g2_one_coeffs()
    n_dbl = sum(1 for k, *_ in coeffs if k == "dbl")
    n_add = sum(1 for k, *_ in coeffs if k == "add")
    nonzero = sum(1 for d in M._ATE_NAF if d != 0)
    assert n_dbl == len(M._ATE_NAF)
    assert n_add == nonzero + 2  # NAF adds + two Frobenius adds
    # triples are canonical host Fq2 pairs
    for _, ca, cb, cc in coeffs[:3]:
        for v in (*ca, *cb, *cc):
            assert 0 <= v < PC.P
