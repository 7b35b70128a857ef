"""Lane-packed 256-bit limb arithmetic for TPU (the device bigint engine).

This is the TPU-native replacement for the reference dependency's
`arith::U256` / Montgomery field core (SURVEY.md §2.3, rows U256/Fq/Fr):
field elements are little-endian 16-bit limbs held in uint32 tensors of
shape ``(NLIMBS, *batch)``.

Design notes (TPU-first, not a translation of the Rust u128 design):

* **Limbs lead, batch trails.** The trailing batch dimension maps to the
  128-wide VPU lanes; the 16-limb axis maps to sublanes. A batch-major
  ``(B, 16)`` layout would waste 7/8 of each lane tile.
* **16-bit limbs in uint32.** Every partial product of a schoolbook
  multiply fits exactly in uint32 ((2^16-1)^2 < 2^32) and column sums of
  up to 2^10 terms accumulate carry-free, so the multiplier is one big
  elementwise outer product plus padded adds — pure VPU work with no
  data-dependent control flow.
* **Carry chains are `lax.scan`s over the limb axis** (length 16-33), so
  the traced graph stays small and the batch dimension stays vectorised.
* **Montgomery ("almost Montgomery") domain.** `mont_mul` maps inputs
  ≤ 2p to an output ≤ 2p with no final conditional subtract; canonical
  reduction happens only at codec/comparison boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    LIMB_BITS,
    LIMB_MASK,
    MONT_NEG_P_INV,
    MONT_R2_MOD_P,
    MONT_R_MOD_P,
    NLIMBS,
    P,
    from_limbs,
    to_limbs,
)

U32 = jnp.uint32
MASK16 = np.uint32(LIMB_MASK)


# ---------------------------------------------------------------------------
# Host <-> device conversion
# ---------------------------------------------------------------------------


def from_ints(values, n: int = NLIMBS) -> jnp.ndarray:
    """Python ints (scalar or arbitrarily nested lists) -> (n, *shape) uint32."""
    arr = np.array(values, dtype=object)
    out = np.zeros((n,) + arr.shape, dtype=np.uint32)
    flat = arr.reshape(-1)
    oflat = out.reshape(n, -1)
    for j in range(flat.shape[0]):
        v = int(flat[j])
        for i in range(n):
            oflat[i, j] = (v >> (LIMB_BITS * i)) & LIMB_MASK
    return jnp.asarray(out)


def to_ints(limb_arr) -> np.ndarray:
    """(n, *shape) uint32 -> object ndarray of python ints (shape *shape)."""
    host = np.asarray(limb_arr)
    n = host.shape[0]
    flat = host.reshape(n, -1)
    out = np.empty(flat.shape[1], dtype=object)
    for j in range(flat.shape[1]):
        acc = 0
        for i in range(n):
            acc |= int(flat[i, j]) << (LIMB_BITS * i)
        out[j] = acc
    return out.reshape(host.shape[1:])


def to_int(limb_arr) -> int:
    """(n,) limbs -> single python int."""
    return int(to_ints(limb_arr).item())


def const_limbs(x: int, n: int = NLIMBS) -> jnp.ndarray:
    """Compile-time constant -> (n,) uint32 limb vector."""
    return jnp.array(to_limbs(x, n), dtype=U32)


def bcast(c: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a (n,) constant limb vector against (n, *batch)."""
    return c.reshape(c.shape + (1,) * (like.ndim - 1))


# ---------------------------------------------------------------------------
# Carry / borrow propagation (scans over the limb axis)
# ---------------------------------------------------------------------------


def carry(cols: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Propagate carries over uint32 columns (< 2^26) -> out_len 16-bit limbs.

    cols: (K, *batch). If out_len > K the final carry is appended (it is
    guaranteed < 2^16 for our column bounds); if out_len <= K, higher
    limbs are dropped (caller asserts they are zero-by-construction).
    """
    k = cols.shape[0]
    zero = jnp.zeros(cols.shape[1:], U32)

    def step(c, col):
        t = col + c
        return t >> LIMB_BITS, t & MASK16

    carry_out, limbs = jax.lax.scan(step, zero, cols)
    if out_len > k:
        pads = [carry_out[None]]
        if out_len > k + 1:
            pads.append(jnp.zeros((out_len - k - 1,) + cols.shape[1:], U32))
        limbs = jnp.concatenate([limbs] + pads, axis=0)
    return limbs[:out_len]


def carry_signed(cols: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Carry propagation for int32 columns that may be negative (|col| < 2^30).

    Used for fused add/sub where per-limb values can dip below zero; the
    arithmetic right shift propagates negative carries correctly. The total
    value must be non-negative.
    """
    k = cols.shape[0]
    zero = jnp.zeros(cols.shape[1:], jnp.int32)

    def step(c, col):
        t = col + c
        return t >> LIMB_BITS, (t & jnp.int32(LIMB_MASK)).astype(U32)

    carry_out, limbs = jax.lax.scan(step, zero, cols.astype(jnp.int32))
    if out_len > k:
        pads = [carry_out.astype(U32)[None]]
        if out_len > k + 1:
            pads.append(jnp.zeros((out_len - k - 1,) + cols.shape[1:], U32))
        limbs = jnp.concatenate([limbs] + pads, axis=0)
    return limbs[:out_len]


def cond_sub(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """v - m if v >= m else v (limb vectors; m is a (n,) constant)."""
    n = v.shape[0]
    mb = bcast(m, v) * jnp.ones_like(v)  # broadcast to full shape for scan

    def step(borrow, pair):
        vk, mk = pair
        t = vk + jnp.uint32(1 << LIMB_BITS) - mk - borrow
        return jnp.uint32(1) - (t >> LIMB_BITS), t & MASK16

    borrow_out, diff = jax.lax.scan(
        step, jnp.zeros(v.shape[1:], U32), (v, mb)
    )
    keep = (borrow_out != 0)[None]  # True -> v < m -> keep v
    return jnp.where(keep, v, diff)


# ---------------------------------------------------------------------------
# Schoolbook multiplication columns
# ---------------------------------------------------------------------------


def mul_cols(a: jnp.ndarray, b: jnp.ndarray, ncols: int) -> jnp.ndarray:
    """Column sums of the product a*b without carry propagation.

    a: (n, *batch), b: (m, *batch) -> (ncols, *batch) uint32 columns,
    each < 2^21 (32 16-bit terms max). Truncated products (ncols < n+m)
    skip the work for unused columns.
    """
    n, m = a.shape[0], b.shape[0]
    prod = a[:, None] * b[None, :]  # (n, m, *batch) uint32, exact
    lo = prod & MASK16
    hi = prod >> LIMB_BITS
    cols = jnp.zeros((ncols,) + jnp.broadcast_shapes(a.shape[1:], b.shape[1:]), U32)
    for i in range(n):
        w = min(m, ncols - i)
        if w > 0:
            cols = cols.at[i : i + w].add(lo[i, :w])
        w2 = min(m, ncols - i - 1)
        if w2 > 0:
            cols = cols.at[i + 1 : i + 1 + w2].add(hi[i, :w2])
    return cols


# ---------------------------------------------------------------------------
# Montgomery multiplication mod p (radix 2^256)
# ---------------------------------------------------------------------------

P_LIMBS = const_limbs(P)
P2_LIMBS = const_limbs(2 * P)
P2_LIMBS_17 = const_limbs(2 * P, NLIMBS + 1)
PINV_LIMBS = const_limbs(MONT_NEG_P_INV)  # -p^{-1} mod 2^256
R_MOD_P_LIMBS = const_limbs(MONT_R_MOD_P)  # Montgomery one
R2_LIMBS = const_limbs(MONT_R2_MOD_P)
ONE_LIMBS = const_limbs(1)
ZERO_LIMBS = const_limbs(0)


def mont_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product REDC(a*b): inputs <= 2p (16 limbs), output <= 2p.

    Separated operand scanning: full 512-bit product T, then
    m = (T mod R) * (-p^-1) mod R, result = (T + m*p) / R. With
    a, b <= 2p: T <= 4p^2 < R*p, so (T + m*p)/R < 2p — no final subtract,
    the <= 2p invariant is closed under multiplication.
    """
    # NB: the product of two 16-limb values spans 32 columns — lo parts land
    # at i+j (max 30), hi parts at i+j+1 (max 31).
    t = carry(mul_cols(a, b, 2 * NLIMBS), 2 * NLIMBS)
    m = carry(mul_cols(t[:NLIMBS], bcast(PINV_LIMBS, a), NLIMBS), NLIMBS)
    mp = mul_cols(m, bcast(P_LIMBS, a), 2 * NLIMBS)
    # T + m*p: t is 32 exact limbs (< 2^16), mp is 32 columns (< 2^21)
    total = carry(t + mp, 2 * NLIMBS)
    return total[NLIMBS:]


def mont_sqr(a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(a, a)


# ---------------------------------------------------------------------------
# Modular add/sub/neg in the <= 2p domain
# ---------------------------------------------------------------------------


def add_mod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) with one conditional subtract of 2p: inputs <= 2p, output <= 2p."""
    s = carry(a + b, NLIMBS + 1)  # limb sums < 2^17: carry-safe
    s = cond_sub(s, P2_LIMBS_17)
    return s[:NLIMBS]


def sub_mod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b + 2p) with one conditional subtract of 2p: output <= 2p."""
    cols = (
        a.astype(jnp.int32)
        + bcast(P2_LIMBS, a).astype(jnp.int32)
        - b.astype(jnp.int32)
    )
    s = carry_signed(cols, NLIMBS + 1)
    s = cond_sub(s, P2_LIMBS_17)
    return s[:NLIMBS]


def neg_mod(a: jnp.ndarray) -> jnp.ndarray:
    """2p - a (output <= 2p; maps 0 -> 2p which canonicalises to 0)."""
    cols = bcast(P2_LIMBS, a).astype(jnp.int32) - a.astype(jnp.int32)
    return carry_signed(cols, NLIMBS)


def double_mod(a: jnp.ndarray) -> jnp.ndarray:
    return add_mod(a, a)


# ---------------------------------------------------------------------------
# Canonicalisation, comparison, selection
# ---------------------------------------------------------------------------


def canon(a: jnp.ndarray) -> jnp.ndarray:
    """Reduce a value <= 2p to the canonical representative < p."""
    return cond_sub(cond_sub(a, P_LIMBS), P_LIMBS)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Canonical equality (batch-shaped bool)."""
    return jnp.all(canon(a) == canon(b), axis=0)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(canon(a) == 0, axis=0)


def select(mask: jnp.ndarray, if_true: jnp.ndarray, if_false: jnp.ndarray) -> jnp.ndarray:
    """Branch-free limb select; mask is batch-shaped bool."""
    return jnp.where(mask[None], if_true, if_false)


# ---------------------------------------------------------------------------
# Montgomery domain conversion and fixed-exponent powers
# ---------------------------------------------------------------------------


def to_mont(x: jnp.ndarray) -> jnp.ndarray:
    """Canonical x < p -> Montgomery form xR mod p."""
    return mont_mul(x, bcast(R2_LIMBS, x) * jnp.ones_like(x))


def from_mont(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> canonical value < p (REDC by 1 then canon)."""
    one = bcast(ONE_LIMBS, a) * jnp.ones_like(a)
    return canon(mont_mul(a, one))


def mont_one(batch_shape=()) -> jnp.ndarray:
    return jnp.broadcast_to(
        R_MOD_P_LIMBS.reshape((NLIMBS,) + (1,) * len(batch_shape)),
        (NLIMBS,) + tuple(batch_shape),
    )


def mont_zero(batch_shape=()) -> jnp.ndarray:
    return jnp.zeros((NLIMBS,) + tuple(batch_shape), U32)


def pow_fixed(a: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """a^exponent (Montgomery domain) for a compile-time constant exponent.

    Left-to-right square-and-multiply as a `lax.scan` over the exponent's
    bits so the traced graph holds a single squaring + multiply body.
    """
    if exponent == 0:
        return mont_one(a.shape[1:]) * jnp.ones_like(a)
    bits = [int(c) for c in bin(exponent)[2:]]
    bits_arr = jnp.array(bits[1:], dtype=jnp.uint32)  # MSB consumed by init

    def step(res, bit):
        res = mont_sqr(res)
        res = select(bit != 0, mont_mul(res, a), res)
        return res, None

    result, _ = jax.lax.scan(step, a, bits_arr)
    return result


def inv_mod(a: jnp.ndarray) -> jnp.ndarray:
    """a^{-1} in the Montgomery domain (Fermat: a^(p-2))."""
    return pow_fixed(a, P - 2)


def sqrt_candidate(a: jnp.ndarray) -> jnp.ndarray:
    """a^((p+1)/4) — the square root if a is a QR (p ≡ 3 mod 4)."""
    return pow_fixed(a, (P + 1) // 4)
