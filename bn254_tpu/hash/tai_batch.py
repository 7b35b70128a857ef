"""Batched (device) SHA-256 try-and-increment hash-to-G1.

The masked K-candidate search of SURVEY.md §3.5: for each message compute
K counter candidates in parallel, validate each (rejection bound, field
membership, quadratic residuosity), then select the FIRST valid counter —
branch-free and bit-exact w.r.t. the reference's sequential search
(/root/reference/src/hash.rs:29-63), including the `mod_u256` strict-`>`
edge (a hash that reduces to exactly p fails decompression and skips the
counter: here it canonicalises to x = 0, and x=0 fails the QR check since
3 is a non-residue mod p — the same skip outcome).

With success probability ~1/2 per counter, K = 8 leaves ~0.4% of messages
unresolved; callers fall back to the host search for those (the returned
`found` mask says which).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import B as CURVE_B
from ..constants import LAST_MULTIPLE_OF_P_BELOW_2_256, NLIMBS, P
from ..fields import limbs as L
from ..fields import tower as T
from . import sha256 as SHA

_5P = L.const_limbs(LAST_MULTIPLE_OF_P_BELOW_2_256)
_4P = L.const_limbs(4 * P)
_2P = L.const_limbs(2 * P)
_1P = L.const_limbs(P)


def _lt_const(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """v < m (m a (n,) constant) via the borrow chain."""
    mb = L.bcast(m, v) * jnp.ones_like(v)

    def step(borrow, pair):
        vk, mk = pair
        t = vk + jnp.uint32(1 << 16) - mk - borrow
        return jnp.uint32(1) - (t >> 16), None

    borrow_out, _ = jax.lax.scan(
        step, jnp.zeros(v.shape[1:], jnp.uint32), (v, mb)
    )
    return borrow_out != 0


def prepare_blocks_host(messages: list[bytes]):
    """Host prep: messages (equal length) -> (blocks, ctr_word, ctr_shift).

    Appends the 0x00 counter byte (reference hash.rs:33-34) before SHA
    padding and reports where the counter byte lives in the word grid.
    """
    mlen = len(messages[0])
    assert all(len(m) == mlen for m in messages), "equal lengths required"
    padded = [bytes(m) + b"\x00" for m in messages]
    blocks = SHA.pad_messages_host(padded)
    pos = mlen  # byte index of the ctr within the padded message
    word_flat = pos // 4  # flat word index across blocks
    shift = (3 - pos % 4) * 8  # big-endian byte within the word
    return blocks, word_flat, shift


def hash_to_g1_batch(blocks: jnp.ndarray, ctr_word: int, ctr_shift: int,
                     k_candidates: int = 8):
    """Device search over K counters.

    blocks: (B, nblocks, 16) uint32 from `prepare_blocks_host` (ctr = 0).
    Returns (x_mont, y_mont, found, ctr): Montgomery affine G1 coords of
    shape (16, B), a (B,) bool mask, and the chosen counters (B,) uint32.
    """
    Bn, nblocks, _ = blocks.shape
    nb_word = ctr_word // 16
    w_in_block = ctr_word % 16

    # (B, K, nblocks, 16): add ctr << shift to the counter word
    ctrs = jnp.arange(k_candidates, dtype=jnp.uint32)
    blocks_k = jnp.broadcast_to(
        blocks[:, None], (Bn, k_candidates, nblocks, 16)
    )
    bump = jnp.zeros((k_candidates, nblocks, 16), jnp.uint32)
    bump = bump.at[:, nb_word, w_in_block].set(ctrs << ctr_shift)
    blocks_k = blocks_k + bump[None]

    digests = SHA.sha256_blocks(blocks_k)  # (B, K, 8)
    attempted = SHA.digest_words_to_limbs(digests)  # (16, B, K)

    accept = _lt_const(attempted, _5P)  # rejection bound (hash.rs:49-51)

    # reduce mod p: attempted < 2^256 < 6p
    x = attempted
    for m in (_4P, _2P, _1P):
        x = L.cond_sub(x, m)
    x_mont = L.to_mont(x)

    # y^2 = x^3 + 3; sqrt candidate via x^((p+1)/4)
    y2 = L.add_mod(
        L.mont_mul(L.mont_sqr(x_mont), x_mont),
        T.mul_small(L.mont_one(x_mont.shape[1:]), CURVE_B),
    )
    s = L.sqrt_candidate(y2)
    is_qr = L.eq(L.mont_sqr(s), y2)
    valid = accept & is_qr  # (B, K)

    # even-y selection (sign byte 0x02, utils.rs:56-63)
    s_canon = L.from_mont(s)
    odd = (s_canon[0] & 1) != 0
    y_mont = L.select(odd, L.neg_mod(s), s)

    # first valid counter per message
    found = jnp.any(valid, axis=-1)  # (B,)
    first = jnp.argmax(valid, axis=-1).astype(jnp.uint32)  # (B,)
    idx = first[None, :, None]
    x_sel = jnp.take_along_axis(x_mont, idx, axis=2)[:, :, 0]
    y_sel = jnp.take_along_axis(y_mont, idx, axis=2)[:, :, 0]
    return x_sel, y_sel, found, first


def hash_to_g1_device(messages: list[bytes], k_candidates: int = 8):
    """End-to-end batched hash-to-G1 with host fallback for rare misses.

    Returns (x_mont, y_mont) device arrays of shape (16, B), bit-exact
    with the host `hash_to_g1_affine` for every message.
    """
    from .tai import hash_to_g1_affine

    blocks, w, s = prepare_blocks_host(messages)
    x, y, found, _ = hash_to_g1_batch(
        jnp.asarray(blocks), w, s, k_candidates
    )
    found_np = np.asarray(found)
    if not found_np.all():
        misses = np.nonzero(~found_np)[0]
        xs_fix, ys_fix = [], []
        for i in misses:
            ax, ay = hash_to_g1_affine(messages[int(i)])
            xs_fix.append(ax)
            ys_fix.append(ay)
        fx = L.to_mont(L.from_ints(xs_fix))
        fy = L.to_mont(L.from_ints(ys_fix))
        x = x.at[:, jnp.asarray(misses)].set(fx)
        y = y.at[:, jnp.asarray(misses)].set(fy)
    return x, y
