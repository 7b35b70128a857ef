#!/usr/bin/env python
"""Stage-level timing: hash vs miller vs final-exp vs fq12-mul at a batch.

Uses tools/timing.measure (readback-synchronised) — block_until_ready does
not block on this environment's TPU tunnel. Prints a percentage breakdown
of the independent-verify (config 3) step.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bn254_tpu.utils.jcache import enable as _enable_jax_cache
_enable_jax_cache()

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256

from bn254_tpu import PrivateKey
from bn254_tpu.dist import batch_verify as BV
from bn254_tpu.hash import tai_batch as TB
from bn254_tpu.hash.tai import hash_to_g1
from bn254_tpu.host import curve as HC
from bn254_tpu.utils import convert as CV
from bn254_tpu.pairing import final_exp as FE
from bn254_tpu.pairing.pairing import _miller_jit, _is_one_jit
from bn254_tpu.fields import tower as T
from tools.timing import measure, measure_compile_and_first

stages = {}


def t(name, fn, *a, reps=4):
    cold, out = measure_compile_and_first(fn, *a)
    dt = measure(fn, *a, reps=reps)
    stages[name] = dt
    print(f"{name:32s} cold={cold:7.1f}s  steady={dt*1e3:9.2f} ms", flush=True)
    return out


msgs = [b"prof-%06d" % i for i in range(B)]
sks = [PrivateKey(0x1234567 + 977 * i) for i in range(B)]
hpts = [hash_to_g1(m) for m in msgs]
sigs = [HC.g1_mul(h, k.scalar) for h, k in zip(hpts, sks)]
pks = [HC.g2_mul(HC.G2_ONE, k.scalar) for k in sks]
hx, hy = CV.g1_batch_to_device_affine(hpts)
sx, sy = CV.g1_batch_to_device_affine(sigs)
pqx, pqy = CV.g2_batch_to_device_affine(pks)

# device hash-to-G1 (config-3 includes it)
blocks_np, cw, cs = TB.prepare_blocks_host(msgs)
blocks = jnp.asarray(blocks_np)
hash_jit = jax.jit(
    lambda b: TB.hash_to_g1_batch(b, cw, cs, k_candidates=8)[:2]
)
t(f"hash_to_g1[{B}] (K=8)", hash_jit, blocks)

px, py, qx, qy = BV._independent_pairs_jit(hx, hy, sx, sy, pqx, pqy)
np.asarray(px.arr[:1])

f = t(f"miller[2x{B}]", _miller_jit, px, py, qx, qy)

# combine pair axis: f has batch (2, B); product over axis 0
from bn254_tpu.pairing import pairing as DP

comb = jax.jit(lambda f: T.fq12_retag(DP.fq12_reduce_mul(f, axis=0)))
g = t(f"pair-combine[{B}]", comb, f)

out = t(f"final_exp[{B}]", FE.final_exp_staged, g)
t(f"is_one[{B}]", _is_one_jit, out)

# raw fq12 mul rate at this batch
mul2 = jax.jit(lambda a, b: T.fq12_retag(T.fq12_mul(a, b)))
t(f"fq12_mul[{B}]", mul2, g, g)

# --- round-4 alternative stages (excluded from the config-3 total) ---

# pair2: shared-squaring constant-Q 2-pair Miller (replaces miller+combine)
from bn254_tpu.pairing.pairing import _miller2_jit

t(f"alt:pair2_miller[{B}]",
  lambda a, b, c, d, e2, f2: _miller2_jit(a, b, c, d, e2, f2),
  hx, hy, pqx, pqy, sx, sy)

# fused-tier weighting stage: GLV (64-step Shamir) vs plain 128-step ladder
from bn254_tpu.curve import glv as GLV
import functools

w_glv = GLV.random_glv_weights(B, bits=128)
wjit = jax.jit(BV._weight_and_sum, static_argnames=("nbits",))
t(f"alt:glv_weight[{B}]",
  functools.partial(wjit, nbits=64), hx, hy, sx, sy, w_glv)
w_plain = CV.scalars_to_device(BV.random_weights_plain(B, 128))
t(f"alt:plain_weight[{B}]",
  functools.partial(wjit, nbits=128), hx, hy, sx, sy, w_plain)

total = sum(
    v for k, v in stages.items()
    if not (k.startswith("fq12_mul") or k.startswith("alt:"))
)
print(f"\n--- config-3 step breakdown (B={B}) ---")
for k, v in stages.items():
    if k.startswith("fq12_mul") or k.startswith("alt:"):
        continue
    print(f"{k:32s} {v*1e3:9.2f} ms  {v/total*100:5.1f}%")
print(f"{'TOTAL':32s} {total*1e3:9.2f} ms  -> {B/total:.1f} verifies/s")
print("\n--- alternative-stage timings (not part of the config-3 sum) ---")
for k, v in stages.items():
    if k.startswith("alt:"):
        print(f"{k:32s} {v*1e3:9.2f} ms")
