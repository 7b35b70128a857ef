"""RLC-weight validation: every input form is bound-checked (VERDICT r4
weak #3 / next #7), plus the Config(rlc_bits=...) round trip.

Soundness context (SURVEY §3.2 note): an RLC weight wider than the
ladder length would be silently truncated by the fixed-schedule ladder,
degrading the advertised 2^-rlc_bits forgery bound — so oversize weights
must raise at the host boundary for EVERY accepted input form, and the
unchecked raw-El form is rejected outright.
"""

import numpy as np
import pytest

from bn254_tpu import config as C
from bn254_tpu.curve import glv as GLV
from bn254_tpu.dist import batch_verify as BV
from bn254_tpu.fields import limbs as L
from bn254_tpu.utils import convert as CV


def test_plain_list_oversize_raises():
    ws = [1, 1 << 128]  # == 2^nbits: one bit too wide for a 128 ladder
    with pytest.raises(ValueError, match="exceeds 128 bits"):
        BV._resolve_weights(ws, 128)


def test_plain_list_at_bound_accepted():
    w, nb = BV._resolve_weights([1, (1 << 128) - 1], 128)
    assert nb == 128 and isinstance(w, L.El)


def test_weights_to_device_validates():
    with pytest.raises(ValueError, match="exceeds 32 bits"):
        BV.weights_to_device([1, 1 << 32], bits=32)
    pw = BV.weights_to_device([1, (1 << 32) - 1], bits=32)
    assert isinstance(pw, BV.PlainWeights) and pw.bits == 32
    w, nb = BV._resolve_weights(pw, None)
    assert nb == 32 and w is pw.w


def test_raw_el_weights_rejected():
    el = CV.scalars_to_device([1, 2, 3])
    with pytest.raises(TypeError, match="raw El weight tensors"):
        BV._resolve_weights(el, 128)


def test_glv_pairs_oversize_raise():
    with pytest.raises(ValueError, match="exceeds 16 bits"):
        GLV.glv_weights_to_device([(1, 0), (1 << 16, 0)], bits=32)
    with pytest.raises(ValueError, match="exceeds 16 bits"):
        GLV.glv_weights_to_device([(1, 0), (0, 1 << 16)], bits=32)


def test_random_glv_weights_bad_bits():
    with pytest.raises(ValueError, match="even"):
        GLV.random_glv_weights(4, bits=31)
    with pytest.raises(ValueError, match="bits//2 <= 126"):
        GLV.random_glv_weights(4, bits=256)


def test_random_glv_weights_in_range_and_nonzero():
    w = GLV.random_glv_weights(64, bits=32)
    a = np.asarray(L.to_ints(w.a), dtype=object).ravel()
    b = np.asarray(L.to_ints(w.b), dtype=object).ravel()
    assert int(a[0]) == 1 and int(b[0]) == 0  # w_0 pinned to 1
    assert all(0 <= int(x) < (1 << 16) for x in a)
    assert all(0 <= int(x) < (1 << 16) for x in b)
    assert all(int(x) or int(y) for x, y in zip(a, b))  # w_i != 0


def test_random_plain_weights_nonzero_full_range():
    ws = BV.random_weights_plain(64, bits=16)
    assert ws[0] == 1
    assert all(0 < w < (1 << 16) for w in ws)


def test_config_rlc_bits_round_trip(monkeypatch):
    monkeypatch.setenv("BN254_RLC_BITS", "64")
    cfg = C.Config.from_env()
    assert cfg.rlc_bits == 64
    assert cfg.replace(rlc_bits=96).rlc_bits == 96
    # the width flows through to the weight draws
    w = GLV.random_glv_weights(3, bits=cfg.rlc_bits)
    assert w.bits == 64 and w.half_bits == 32
    ws = BV.random_weights_plain(3, bits=cfg.rlc_bits)
    assert all(x < (1 << 64) for x in ws)
