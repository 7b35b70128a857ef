#!/usr/bin/env python
"""Microbenchmarks for the Montgomery-mul kernel layout decision (PERF.md).

Measures, on the real chip:
  1. VPU uint32 mul+add peak (pallas, VMEM-resident dependent chain)
  2. f32 fma peak (same harness)
  3. MXU bf16 / int8 matmul peak (XLA dot)
  4. current CIOS kernel ((18, 512) blocks, limbs on sublanes)
  5. prototype CIOS kernel ((18, 8, 128) blocks, limb-per-register:
     limbs on the UNTILED leading dim so per-step limb shifts are
     Python-level register renaming, zero sublane shuffles, and no
     18->24 sublane padding waste)

SURVEY.md §7 step 1 called for this measurement; VERDICT round-1 item 2a
requires the decision be justified by numbers.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bn254_tpu.utils.jcache import enable as _enable_jax_cache
_enable_jax_cache()

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bn254_tpu.constants import LIMB_BITS, LIMB_MASK, NLIMBS, P, to_limbs

U32 = jnp.uint32
MASK = np.uint32(LIMB_MASK)
PINV0 = np.uint32((-pow(P, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS))
_P_LIMBS = np.array(to_limbs(P, NLIMBS), dtype=np.uint32)


from tools.timing import measure


def timeit(name, fn, *args, reps=8):
    out = fn(*args)
    dt = measure(fn, *args, reps=reps)
    print(f"{name:44s} {dt*1e3:9.3f} ms", flush=True)
    return dt, out


# ---------------------------------------------------------------------------
# 1-2: VPU ALU peaks
# ---------------------------------------------------------------------------

ITERS = 512
VSHAPE = (256, 512)  # 128K lanes, 512 vregs of ILP


def _vpu_u32_kernel(x_ref, y_ref, o_ref):
    x = x_ref[:]
    y = y_ref[:]

    def body(i, x):
        return x * y + U32(3)

    o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x)


def _vpu_f32_kernel(x_ref, y_ref, o_ref):
    x = x_ref[:]
    y = y_ref[:]

    def body(i, x):
        return x * y + jnp.float32(1.5)

    o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x)


@jax.jit
def vpu_u32(x, y):
    return pl.pallas_call(
        _vpu_u32_kernel,
        out_shape=jax.ShapeDtypeStruct(VSHAPE, U32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, y)


@jax.jit
def vpu_f32(x, y):
    return pl.pallas_call(
        _vpu_f32_kernel,
        out_shape=jax.ShapeDtypeStruct(VSHAPE, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, y)


# ---------------------------------------------------------------------------
# 4: OLD sublane-layout CIOS kernel ((18, BLK) blocks, limbs on sublanes)
#    — kept here as the A/B baseline; the library kernel switched to the
#    limb-per-register layout after this microbenchmark decided it.
# ---------------------------------------------------------------------------

SUB_BLK = 512


def _montmul_sublane_kernel(a_ref, b_ref, p_ref, o_ref):
    a = a_ref[:]  # (18, BLK) uint32
    b = b_ref[:]
    p_col = p_ref[:, 0:1]
    blk = a.shape[1]
    t = jnp.zeros((NLIMBS + 1, blk), U32)
    zrow = jnp.zeros((1, blk), U32)
    for i in range(NLIMBS):
        prod = a[i : i + 1] * b
        t = (
            t
            + jnp.concatenate([prod & MASK, zrow], axis=0)
            + jnp.concatenate([zrow, prod >> LIMB_BITS], axis=0)
        )
        m_i = (t[0:1] * PINV0) & MASK
        prod2 = m_i * p_col
        t = (
            t
            + jnp.concatenate([prod2 & MASK, zrow], axis=0)
            + jnp.concatenate([zrow, prod2 >> LIMB_BITS], axis=0)
        )
        carry0 = t[0:1] >> LIMB_BITS
        t = jnp.concatenate([t[1:2] + carry0, t[2:], zrow], axis=0)
    limbs = []
    c = zrow
    for i in range(NLIMBS):
        v = t[i : i + 1] + c
        limbs.append(v & MASK)
        c = v >> LIMB_BITS
    o_ref[:] = jnp.concatenate(limbs, axis=0)


@functools.partial(jax.jit, static_argnames=("n",))
def montmul_sublane(a2, b2, n):
    p_in = jnp.broadcast_to(
        jnp.asarray(_P_LIMBS).reshape(NLIMBS, 1), (NLIMBS, 128)
    )
    spec = pl.BlockSpec(
        (NLIMBS, SUB_BLK), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _montmul_sublane_kernel,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, n), U32),
        grid=(n // SUB_BLK,),
        in_specs=[
            spec,
            spec,
            pl.BlockSpec(
                (NLIMBS, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=spec,
    )(a2, b2, p_in)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)
    key = jax.random.PRNGKey(0)

    # --- VPU peaks ---
    x = jax.random.randint(key, VSHAPE, 0, 1 << 15).astype(U32)
    y = jax.random.randint(key, VSHAPE, 0, 1 << 15).astype(U32)
    dt, _ = timeit("vpu u32 (mul+add chain)", vpu_u32, x, y)
    ops = 2 * ITERS * VSHAPE[0] * VSHAPE[1]
    u32_rate = ops / dt
    print(f"  -> {u32_rate/1e12:.2f} T u32-ops/s")

    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    dt, _ = timeit("vpu f32 (fma chain)", vpu_f32, xf, yf)
    f32_rate = ops / dt
    print(f"  -> {f32_rate/1e12:.2f} T f32-flops/s")

    # --- MXU peaks ---
    M = 8192
    ab = jax.random.normal(key, (M, M), jnp.bfloat16)
    bb = jax.random.normal(key, (M, M), jnp.bfloat16)
    mm = jax.jit(
        lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    )
    dt, _ = timeit("mxu bf16 matmul 8192^3", mm, ab, bb)
    print(f"  -> {2*M**3/dt/1e12:.1f} T bf16-flops/s")

    ai = jax.random.randint(key, (M, M), -127, 127).astype(jnp.int8)
    bi = jax.random.randint(key, (M, M), -127, 127).astype(jnp.int8)
    mmi = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    )
    try:
        dt, _ = timeit("mxu int8 matmul 8192^3", mmi, ai, bi)
        print(f"  -> {2*M**3/dt/1e12:.1f} T int8-ops/s")
    except Exception as e:
        print(f"int8 matmul unsupported: {e}")

    # --- CIOS kernels ---
    from bn254_tpu.kernels import montmul as MK

    N = 1 << 17  # 131072 field muls
    import secrets

    rng = np.random.RandomState(7)
    a_host = np.zeros((NLIMBS, N), np.uint32)
    b_host = np.zeros((NLIMBS, N), np.uint32)
    for i in range(NLIMBS):
        a_host[i] = rng.randint(0, 1 << 15, N)
        b_host[i] = rng.randint(0, 1 << 15, N)
    a2 = jnp.asarray(a_host)
    b2 = jnp.asarray(b_host)

    dt, out_sub = timeit(
        f"sublane-layout CIOS (18,{SUB_BLK})  N={N}",
        lambda a, b: montmul_sublane(a, b, N),
        a2,
        b2,
    )
    sub_rate = N / dt
    print(f"  -> {sub_rate/1e6:.1f} M Fq-muls/s")
    # op-count model: 2*18*18 muls + ~6*18*18 aux per element
    per_mul_ops = 2 * NLIMBS * NLIMBS * 4  # rough: mul+mask+shift+add x2
    print(f"  -> ALU utilisation ~ {sub_rate*per_mul_ops/u32_rate*100:.0f}% "
          f"(model {per_mul_ops} u32-ops/mul)")

    dt, out_reg = timeit(
        f"library reg-layout CIOS (18,8,128) N={N}",
        lambda a, b: MK._montmul_flat(a, b, N),
        a2,
        b2,
    )
    reg_rate = N / dt
    print(f"  -> {reg_rate/1e6:.1f} M Fq-muls/s "
          f"({reg_rate/sub_rate:.2f}x sublane layout; includes the "
          f"2D->3D relayout at the kernel boundary)")

    # bit-exactness cross-check
    got = np.asarray(out_reg)
    want = np.asarray(out_sub)
    assert np.array_equal(got, want), "layout kernels disagree!"
    print("reg-layout kernel bit-identical to sublane layout: OK")


if __name__ == "__main__":
    main()
