"""Pallas TPU kernel: batched CIOS Montgomery multiplication.

The XLA `lax.scan` formulation in fields/limbs.py re-reads its (19, N)
carry accumulator and the (18, N) operands from HBM on every one of the
18 CIOS steps — at large batch that is ~50x the algorithmically-required
traffic and the multiply becomes HBM-bound. This kernel runs the whole
interleaved CIOS recurrence on VMEM-resident blocks: one HBM read per
operand, one write of the product, all 18 steps unrolled straight-line
on (18, BLK) tiles (Mosaic handles ~250-op bodies comfortably).

Numerics are IDENTICAL to limbs.mont_mul's scan: 15-bit limbs in uint32
lanes, per-step lazy lo/hi column accumulation (columns < 2^22), one
final unrolled carry chain, no conditional subtraction. Bound contract:
inputs limb-normalised (< 2^16 after the caller's norm), values such
that a.vmax*b.vmax + R*p < 2^538 — asserted by the caller (limbs.El
static bound tracking).

Used automatically by limbs.mont_mul on the TPU backend for flat batches
>= _MIN_LANES; the scan path remains for CPU tests and small shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import LIMB_BITS, LIMB_MASK, NLIMBS, P, to_limbs

U32 = jnp.uint32
MASK = np.uint32(LIMB_MASK)
PINV0 = np.uint32((-pow(P, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS))
_P_LIMBS = np.array(to_limbs(P, NLIMBS), dtype=np.uint32)

# lane block per grid step; 512 lanes x (18 sublane-padded rows) x 4 B
# keeps the working set (a, b, t, out + temporaries) well under VMEM.
BLOCK = 512
_MIN_LANES = 256  # below this the scan path wins (kernel launch overhead)


def _montmul_kernel(a_ref, b_ref, p_ref, o_ref):
    """Mosaic-friendly CIOS: no scatter ops — row shifts are concatenations,
    the accumulator is a (19, BLK) value rebuilt functionally each step."""
    a = a_ref[:]  # (18, BLK) uint32
    b = b_ref[:]
    p_col = p_ref[:, 0:1]  # (18, 1) modulus limbs (pallas forbids captures)

    blk = a.shape[1]
    t = jnp.zeros((NLIMBS + 1, blk), U32)
    zrow = jnp.zeros((1, blk), U32)
    for i in range(NLIMBS):
        prod = a[i : i + 1] * b  # exact in uint32 (limbs < 2^16)
        t = (
            t
            + jnp.concatenate([prod & MASK, zrow], axis=0)
            + jnp.concatenate([zrow, prod >> LIMB_BITS], axis=0)
        )
        m_i = (t[0:1] * PINV0) & MASK  # (1, BLK)
        prod2 = m_i * p_col  # (18, BLK)
        t = (
            t
            + jnp.concatenate([prod2 & MASK, zrow], axis=0)
            + jnp.concatenate([zrow, prod2 >> LIMB_BITS], axis=0)
        )
        carry0 = t[0:1] >> LIMB_BITS  # t[0] & MASK == 0 by construction
        t = jnp.concatenate([t[1:2] + carry0, t[2:], zrow], axis=0)

    # final carry normalisation (unrolled; columns < 2^26)
    limbs = []
    c = zrow
    for i in range(NLIMBS):
        v = t[i : i + 1] + c
        limbs.append(v & MASK)
        c = v >> LIMB_BITS
    o_ref[:] = jnp.concatenate(limbs, axis=0)


@functools.partial(jax.jit, static_argnames=("n_padded", "interpret"))
def _montmul_flat(a2, b2, n_padded, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = n_padded // BLOCK
    p_in = jnp.broadcast_to(
        jnp.asarray(_P_LIMBS).reshape(NLIMBS, 1), (NLIMBS, 128)
    )
    return pl.pallas_call(
        _montmul_kernel,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, n_padded), U32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (NLIMBS, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (NLIMBS, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (NLIMBS, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (NLIMBS, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(a2, b2, p_in)


def montmul_batched(
    a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """REDC(a*b) for (18, *batch) uint32 limb tensors, limbs < 2^16.

    Broadcasts operands to a common batch shape, flattens, pads the lane
    count to a BLOCK multiple, and runs the VMEM-resident kernel.
    `interpret=True` runs the Pallas interpreter (CPU test coverage of
    the exact kernel body).
    """
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    batch = shape[1:]
    n = int(np.prod(batch)) if batch else 1
    a2 = a.reshape(NLIMBS, n)
    b2 = b.reshape(NLIMBS, n)
    n_padded = -(-n // BLOCK) * BLOCK
    if n_padded != n:
        pad = [(0, 0), (0, n_padded - n)]
        a2 = jnp.pad(a2, pad)
        b2 = jnp.pad(b2, pad)
    out = _montmul_flat(a2, b2, n_padded, interpret=interpret)
    return out[:, :n].reshape(shape)


def use_pallas(batch_shape, cfg=None) -> bool:
    """Kernel eligibility: TPU backend and enough lanes to amortise.

    Driven by config.Config (use_pallas force-on/off, min-lanes); the
    BN254_DISABLE_PALLAS env var is honoured via Config.from_env.
    """
    from .. import config as C

    cfg = cfg or C.DEFAULT
    if cfg.use_pallas is not None:
        return cfg.use_pallas
    n = 1
    for d in batch_shape:
        n *= int(d)
    if n < cfg.pallas_min_lanes:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
