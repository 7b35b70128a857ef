#!/usr/bin/env python
"""Stage-level timing: miller vs final-exp vs fq12-mul rate at a given batch."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/bn254_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256

from bn254_tpu import PrivateKey
from bn254_tpu.dist import batch_verify as BV
from bn254_tpu.hash.tai import hash_to_g1
from bn254_tpu.host import curve as HC
from bn254_tpu.utils import convert as CV
from bn254_tpu.pairing import final_exp as FE
from bn254_tpu.pairing.pairing import _miller_jit, _is_one_jit
from bn254_tpu.fields import tower as T


def t(name, fn, *a):
    t0 = time.time()
    out = jax.block_until_ready(fn(*a))
    c = time.time() - t0
    t0 = time.time()
    out = jax.block_until_ready(fn(*a))
    t0b = time.time() - t0
    t0 = time.time()
    out = jax.block_until_ready(fn(*a))
    run = min(t0b, time.time() - t0)
    print(f"{name:32s} compile+1st={c:7.1f}s  steady={run*1e3:9.1f} ms")
    return out


msgs = [b"prof-%06d" % i for i in range(B)]
sks = [PrivateKey(0x1234567 + 977 * i) for i in range(B)]
hpts = [hash_to_g1(m) for m in msgs]
sigs = [HC.g1_mul(h, k.scalar) for h, k in zip(hpts, sks)]
pks = [HC.g2_mul(HC.G2_ONE, k.scalar) for k in sks]
hx, hy = CV.g1_batch_to_device_affine(hpts)
sx, sy = CV.g1_batch_to_device_affine(sigs)
pqx, pqy = CV.g2_batch_to_device_affine(pks)

px, py, qx, qy = BV._independent_pairs_jit(hx, hy, sx, sy, pqx, pqy)
jax.block_until_ready(px.arr)

f = t(f"miller[2x{B}]", _miller_jit, px, py, qx, qy)

# combine pair axis: f has batch (2, B); product over axis 0
from bn254_tpu.pairing import pairing as DP
comb = jax.jit(lambda f: T.fq12_retag(DP.fq12_reduce_mul(f, axis=0)))
g = t(f"pair-combine[{B}]", comb, f)

fe_parts = []
t0 = time.time()
out = FE.final_exp_staged(g)
jax.block_until_ready(out.c0.c0.c0.arr)
print(f"{'final_exp_staged[%d]'%B:32s} compile+1st={time.time()-t0:7.1f}s", end="")
t0 = time.time()
out = FE.final_exp_staged(g)
jax.block_until_ready(out.c0.c0.c0.arr)
print(f"  steady={ (time.time()-t0)*1e3:9.1f} ms")

t(f"is_one[{B}]", _is_one_jit, out)

# raw fq12 mul rate at this batch
mul2 = jax.jit(lambda a, b: T.fq12_retag(T.fq12_mul(a, b)))
h = t(f"fq12_mul[{B}]", mul2, g, g)
