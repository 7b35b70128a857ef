#!/usr/bin/env python
"""Stage-level timing of the FUSED (config-4) pipeline at a batch.

Breaks the 497 ms/B=8192 round-4 measurement into: device hash, GLV
weight ladders (+ sig tree-sum + affinization), single-pair Miller over
the batch, Fq12 batch product, the e(S,-G2) pair, and the shared final
exponentiation. Reuses the exact production stage jits so the warm
compile cache from a bench run applies.

Usage: python tools/profile_fused.py [batch]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192

from bn254_tpu import PrivateKey
from bn254_tpu.curve import glv as GLV
from bn254_tpu.dist import batch_verify as BV
from bn254_tpu.hash import tai_batch as TB
from bn254_tpu.hash.tai import hash_to_g1
from bn254_tpu.host import curve as HC
from bn254_tpu.pairing import final_exp as FE
from bn254_tpu.pairing.pairing import _is_one_jit, _miller_jit
from bn254_tpu.utils import convert as CV
from tools.timing import measure, measure_compile_and_first

stages = {}


def t(name, fn, *a, reps=4):
    cold, out = measure_compile_and_first(fn, *a)
    dt = measure(fn, *a, reps=reps)
    stages[name] = dt
    print(f"{name:34s} cold={cold:7.1f}s  steady={dt*1e3:9.2f} ms",
          flush=True)
    return out


msgs = [b"bench-msg-%06d" % i for i in range(B)]
sks = [PrivateKey(0x1234567 + 977 * i) for i in range(B)]
hpts = [hash_to_g1(m) for m in msgs]
sigs = [HC.g1_mul(h, k.scalar) for h, k in zip(hpts, sks)]
pks = [HC.g2_mul(HC.G2_ONE, k.scalar) for k in sks]
hx, hy = CV.g1_batch_to_device_affine(hpts)
sx, sy = CV.g1_batch_to_device_affine(sigs)
pqx, pqy = CV.g2_batch_to_device_affine(pks)

blocks_np, cw, cs = TB.prepare_blocks_host(msgs)
blocks = jnp.asarray(blocks_np)
hash_jit = jax.jit(
    lambda b: TB.hash_to_g1_batch(b, cw, cs, k_candidates=8)[:2]
)
t(f"hash_to_g1[{B}] (K=8)", hash_jit, blocks)

w = GLV.random_glv_weights(B, bits=128)
wjit = functools.partial(
    jax.jit(BV._weight_and_sum, static_argnames=("nbits",)),
    nbits=w.half_bits,
)
whx, why, ssx, ssy = t(f"glv_weight+sum+affine[{B}]", wjit,
                       hx, hy, sx, sy, w)

f = t(f"miller 1-pair[{B}]", _miller_jit, whx, why, pqx, pqy)

ngx, ngy = BV._neg_g2_one(())
f_sig = t("miller e(S,-G2)[1]", _miller_jit, ssx, ssy, ngx, ngy)

from bn254_tpu.fields import tower as T
from bn254_tpu.pairing.pairing import fq12_reduce_mul

_combine = jax.jit(
    lambda f, f_sig: T.fq12_retag(
        T.fq12_mul(fq12_reduce_mul(f, axis=0), f_sig)
    )
)
total = t(f"fq12 batch-product[{B}]", _combine, f, f_sig)

out = t("final_exp[1] (plain scalar)", FE.final_exp_staged, total)
t("final_exp[1] (wide trick)", FE.final_exp_staged_wide, total)
t("is_one[1]", _is_one_jit, out)

# the new production stages (S row folded into the Miller batch)
pts = t(f"fused_points[{B}+1]",
        functools.partial(
            jax.jit(BV._fused_points, static_argnames=("nbits",)),
            nbits=w.half_bits,
        ),
        hx, hy, sx, sy, pqx, pqy, w)
t(f"miller_reduce[{B}+1]", BV._miller_reduce_jit, *pts)

tot = sum(stages.values())
print(f"\n--- fused (config-4) step breakdown (B={B}) ---")
for k, v in stages.items():
    print(f"{k:34s} {v*1e3:9.2f} ms  {v/tot*100:5.1f}%")
print(f"{'TOTAL':34s} {tot*1e3:9.2f} ms  -> {B/tot:.1f} verifies/s")
