"""Sharded-verifier adversarial + shape-edge tests (VERDICT round-1 item 5).

Runs make_sharded_verifier on the 8-device virtual CPU mesh with TWO
tuples per shard, asserting acceptance of a valid batch, rejection of a
tampered batch (both staged and monolithic pipelines), and the typed
error for a non-divisible batch.
"""

import os

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from bn254_tpu.dist import batch_verify as BV
from bn254_tpu.errors import InvalidLengthError
from bn254_tpu.hash.tai import hash_to_g1
from bn254_tpu.host import curve as HC
from bn254_tpu.protocol.types import PrivateKey
from bn254_tpu.utils import convert as CV

# Every test here compiles big staged-pipeline programs; a full-suite
# session deterministically crashes XLA:CPU on the ~50th-test re-compile
# (VERDICT r4 weak #1), so the module runs one-test-per-subprocess (see
# conftest.pytest_collection_modifyitems). Each test passes standalone.
pytestmark = pytest.mark.isolated

N_DEV = 8
B = 2 * N_DEV  # two tuples per shard


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < N_DEV:
        pytest.skip(f"need {N_DEV} devices, have {len(devs)}")
    return Mesh(np.array(devs[:N_DEV]), axis_names=("batch",))


@pytest.fixture(scope="module")
def batch():
    msgs = [b"dv-%d" % i for i in range(B)]
    sks = [PrivateKey(778899 + 31 * i) for i in range(B)]
    hpts = [hash_to_g1(m) for m in msgs]
    sigs = [HC.g1_mul(h, k.scalar) for h, k in zip(hpts, sks)]
    pks = [HC.g2_mul(HC.G2_ONE, k.scalar) for k in sks]
    hx, hy = CV.g1_batch_to_device_affine(hpts)
    sx, sy = CV.g1_batch_to_device_affine(sigs)
    pqx, pqy = CV.g2_batch_to_device_affine(pks)
    # deterministic odd weights (first fixed to 1, matching random_weights)
    w = [1] + [(0xB5AD4ECEDA1CE2A9 * (i + 2)) | 1 for i in range(B - 1)]
    return msgs, sks, hpts, sigs, pks, (hx, hy, sx, sy, pqx, pqy, w)


def test_sharded_staged_accept_and_tamper(mesh, batch):
    msgs, sks, hpts, sigs, pks, dev = batch
    hx, hy, sx, sy, pqx, pqy, w = dev
    run = BV.make_sharded_verifier(mesh, "batch")
    assert bool(jax.device_get(run(hx, hy, sx, sy, pqx, pqy, w)))

    # tamper one signature in the MIDDLE of a shard (index 5, shard 2)
    sigs_bad = list(sigs)
    sigs_bad[5] = HC.g1_mul(hpts[5], sks[4].scalar)
    sxb, syb = CV.g1_batch_to_device_affine(sigs_bad)
    assert not bool(jax.device_get(run(hx, hy, sxb, syb, pqx, pqy, w)))

    # tamper a public key instead (swap two pks)
    pks_bad = list(pks)
    pks_bad[0], pks_bad[9] = pks_bad[9], pks_bad[0]
    pqxb, pqyb = CV.g2_batch_to_device_affine(pks_bad)
    assert not bool(jax.device_get(run(hx, hy, sx, sy, pqxb, pqyb, w)))


@pytest.mark.skipif(
    not os.environ.get("BN254_RUN_SLOW"),
    reason="monolithic sharded program takes >30 min to compile on the "
    "CPU mesh; the staged pipeline (default, tested above) is the "
    "production path. Set BN254_RUN_SLOW=1 to include.",
)
def test_sharded_monolithic_accept_and_tamper(mesh, batch):
    msgs, sks, hpts, sigs, pks, dev = batch
    hx, hy, sx, sy, pqx, pqy, w = dev
    run = BV.make_sharded_verifier(mesh, "batch", monolithic=True)
    assert bool(jax.device_get(run(hx, hy, sx, sy, pqx, pqy, w)))
    sigs_bad = list(sigs)
    sigs_bad[12] = HC.g1_mul(hpts[12], sks[0].scalar)
    sxb, syb = CV.g1_batch_to_device_affine(sigs_bad)
    assert not bool(jax.device_get(run(hx, hy, sxb, syb, pqx, pqy, w)))


def test_chunked_fused_matches_unchunked(batch):
    """Config-5 streaming path: verify_batch_fused_chunked (monoid
    accumulation over chunks) agrees with the one-shot fused check on
    accept AND on tamper-reject, using GLV weights end-to-end."""
    from bn254_tpu.curve import glv as GLV

    msgs, sks, hpts, sigs, pks, dev = batch
    hx, hy, sx, sy, pqx, pqy, _ = dev
    w = GLV.random_glv_weights(B, bits=32)  # 16-step ladder: CI-cheap

    ok_chunked = bool(
        jax.device_get(
            BV.verify_batch_fused_chunked(
                hx, hy, sx, sy, pqx, pqy, w, chunk=B // 2
            )
        )
    )
    ok_full = bool(
        jax.device_get(
            BV.verify_batch_fused_staged(hx, hy, sx, sy, pqx, pqy, w)
        )
    )
    assert ok_chunked and ok_full

    # tamper a signature in the SECOND chunk
    sigs_bad = list(sigs)
    sigs_bad[B - 3] = HC.g1_mul(hpts[B - 3], sks[0].scalar)
    sxb, syb = CV.g1_batch_to_device_affine(sigs_bad)
    bad_chunked = bool(
        jax.device_get(
            BV.verify_batch_fused_chunked(
                hx, hy, sxb, syb, pqx, pqy, w, chunk=B // 2
            )
        )
    )
    assert not bad_chunked

    with pytest.raises(InvalidLengthError):
        BV.verify_batch_fused_chunked(
            hx, hy, sx, sy, pqx, pqy, w, chunk=5
        )


def test_sharded_chunked_stream(mesh, batch):
    """Config-5 structure on the mesh: stream the batch through the
    sharded verifier in chunks (per-shard elementwise accumulator, ONE
    collective per job, one shared final exp) — accept AND tamper-reject
    must match the one-shot sharded run."""
    msgs, sks, hpts, sigs, pks, dev = batch
    hx, hy, sx, sy, pqx, pqy, w = dev
    run = BV.make_sharded_verifier(mesh, "batch")
    assert bool(jax.device_get(
        run(hx, hy, sx, sy, pqx, pqy, w, chunk=B // 2)
    ))

    sigs_bad = list(sigs)
    sigs_bad[B - 2] = HC.g1_mul(hpts[B - 2], sks[1].scalar)
    sxb, syb = CV.g1_batch_to_device_affine(sigs_bad)
    assert not bool(jax.device_get(
        run(hx, hy, sxb, syb, pqx, pqy, w, chunk=B // 2)
    ))

    with pytest.raises(InvalidLengthError):
        run(hx, hy, sx, sy, pqx, pqy, w, chunk=B // 2 + 1)


def test_adaptive_accept_and_fallback(batch):
    """verify_batch_adaptive: all-valid batch -> all-True via the RLC
    pre-check alone; tampered batch -> exact per-tuple fallback flags
    exactly the tampered index."""
    from bn254_tpu.curve import glv as GLV

    msgs, sks, hpts, sigs, pks, dev = batch
    hx, hy, sx, sy, pqx, pqy, _ = dev
    w = GLV.random_glv_weights(B, bits=32)

    ok = np.asarray(
        BV.verify_batch_adaptive(hx, hy, sx, sy, pqx, pqy, weights=w)
    )
    assert ok.shape == (B,) and ok.all()

    sigs_bad = list(sigs)
    bad_i = 6
    sigs_bad[bad_i] = HC.g1_mul(hpts[bad_i], sks[0].scalar)
    sxb, syb = CV.g1_batch_to_device_affine(sigs_bad)
    ok2 = np.asarray(
        BV.verify_batch_adaptive(hx, hy, sxb, syb, pqx, pqy, weights=w)
    )
    assert not ok2[bad_i] and ok2.sum() == B - 1


def test_sharded_rejects_non_divisible_batch(mesh, batch):
    msgs, sks, hpts, sigs, pks, dev = batch
    hx, hy, sx, sy, pqx, pqy, w = dev
    run = BV.make_sharded_verifier(mesh, "batch")
    # slice to B-1 = 15 tuples: not divisible by 8
    cut = lambda e: type(e)(e.arr[..., : B - 1], e.vmax, e.lmax)
    from bn254_tpu.fields import tower as T

    hx2, hy2, sx2, sy2 = cut(hx), cut(hy), cut(sx), cut(sy)
    pqx2 = T.Fq2(cut(pqx.c0), cut(pqx.c1))
    pqy2 = T.Fq2(cut(pqy.c0), cut(pqy.c1))
    with pytest.raises(InvalidLengthError):
        run(hx2, hy2, sx2, sy2, pqx2, pqy2, w[: B - 1])
