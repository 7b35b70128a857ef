"""Batched device SHA-256 + try-and-increment vs the host search."""

import hashlib
import secrets

import jax.numpy as jnp
import numpy as np

from bn254_tpu.fields import limbs as L
from bn254_tpu.hash import sha256 as SHA
from bn254_tpu.hash import tai_batch as TB
from bn254_tpu.hash.tai import hash_to_g1_affine


def test_sha256_matches_hashlib():
    msgs = [b"sample\x00", b"hello\x00\x00", b"x" * 7, b"\x00" * 7]
    dig = SHA.sha256_blocks(jnp.asarray(SHA.pad_messages_host(msgs)))
    for i, m in enumerate(msgs):
        got = b"".join(int(w).to_bytes(4, "big") for w in np.asarray(dig)[i])
        assert got == hashlib.sha256(m).digest()


def test_sha256_multiblock():
    msgs = [bytes(range(100))] * 2
    dig = SHA.sha256_blocks(jnp.asarray(SHA.pad_messages_host(msgs)))
    got = b"".join(int(w).to_bytes(4, "big") for w in np.asarray(dig)[0])
    assert got == hashlib.sha256(msgs[0]).digest()


def test_digest_limb_repack():
    msgs = [b"abcdefgh"]
    dig = SHA.sha256_blocks(jnp.asarray(SHA.pad_messages_host(msgs)))
    el = SHA.digest_words_to_limbs(dig)
    val = int(L.to_ints(el)[0])
    assert val == int.from_bytes(hashlib.sha256(msgs[0]).digest(), "big")


def test_batched_tai_matches_host():
    rng = secrets.SystemRandom(1234)
    msgs = [bytes([rng.randrange(256) for _ in range(8)]) for _ in range(16)]
    x, y = TB.hash_to_g1_device(msgs)
    xs, ys = L.to_ints(L.from_mont(x)), L.to_ints(L.from_mont(y))
    for i, m in enumerate(msgs):
        ex, ey = hash_to_g1_affine(m)
        assert (int(xs[i]), int(ys[i])) == (ex, ey)


def test_sample_golden_vector():
    x, y = TB.hash_to_g1_device([b"sample", b"helloo"])
    xs = L.to_ints(L.from_mont(x))
    exp = hash_to_g1_affine(b"sample")
    assert int(xs[0]) == exp[0]
    assert (
        f"02{exp[0]:064x}"
        == "0211e028f08c500889891cc294fe758a60e84495ec1e2d0bce208c9fc67b6486fd"
    )
