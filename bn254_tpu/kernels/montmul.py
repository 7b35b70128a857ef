"""Pallas TPU kernel: batched CIOS Montgomery multiplication.

The XLA `lax.scan` formulation in fields/limbs.py re-reads its (19, N)
carry accumulator and the (18, N) operands from HBM on every one of the
18 CIOS steps — at large batch that is ~50x the algorithmically-required
traffic and the multiply becomes HBM-bound. This kernel runs the whole
interleaved CIOS recurrence on VMEM-resident blocks: one HBM read per
operand, one write of the product, all 18 steps unrolled straight-line.

Layout (decided by measurement — tools/bench_micro.py, PERF.md): limbs
live on the UNTILED leading axis of (NLIMBS, 8, 128) blocks, one (8, 128)
vreg-shaped tile per limb. The per-step "shift T down one limb" is then
pure register renaming (a Python-list rotation at trace time), there are
zero sublane shuffles, and no 18->24 sublane padding waste. On a v5e this
measures 2.44x the throughput of the same recurrence on (18, BLK) blocks
with limbs on sublanes (462 vs 189 M Fq-muls/s, both ~VPU-bound).

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

# batch elements per grid step: one (8, 128) tile per limb
BLOCK = 1024
_TILE = (8, 128)
_MIN_LANES = 256  # below this the scan path wins (kernel launch overhead)


def _montmul_kernel(a_ref, b_ref, o_ref):
    """CIOS with limbs as separate (8, 128) tiles (leading dim untiled).

    The accumulator is a Python list of 19 tiles; the per-step one-limb
    shift is a list rotation (register renaming, no data movement). The
    modulus limbs are baked in as scalar immediates.
    """
    a = [a_ref[i] for i in range(NLIMBS)]
    b = [b_ref[i] for i in range(NLIMBS)]
    zero = jnp.zeros(_TILE, U32)
    t = [zero] * (NLIMBS + 1)
    for i in range(NLIMBS):
        ai = a[i]
        for j in range(NLIMBS):
            prod = ai * b[j]  # exact in uint32 (limbs < 2^16)
            t[j] = t[j] + (prod & MASK)
            t[j + 1] = t[j + 1] + (prod >> LIMB_BITS)
        m_i = (t[0] * PINV0) & MASK
        for j in range(NLIMBS):
            prod2 = m_i * np.uint32(_P_LIMBS[j])
            t[j] = t[j] + (prod2 & MASK)
            t[j + 1] = t[j + 1] + (prod2 >> LIMB_BITS)
        carry0 = t[0] >> LIMB_BITS  # t[0] & MASK == 0 by construction
        t = t[1:] + [zero]  # shift down one limb: register renaming
        t[0] = t[0] + carry0

    # final carry normalisation (unrolled; columns < 2^26)
    c = zero
    for i in range(NLIMBS):
        v = t[i] + c
        o_ref[i] = v & MASK
        c = v >> LIMB_BITS


@functools.partial(jax.jit, static_argnames=("n_padded", "interpret"))
def _montmul_flat(a2, b2, n_padded, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = n_padded // BLOCK
    nrows = n_padded // 128
    a3 = a2.reshape(NLIMBS, nrows, 128)
    b3 = b2.reshape(NLIMBS, nrows, 128)
    spec = pl.BlockSpec(
        (NLIMBS,) + _TILE, lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _montmul_kernel,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, nrows, 128), U32),
        grid=(grid,),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(a3, b3)
    return out.reshape(NLIMBS, n_padded)


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
