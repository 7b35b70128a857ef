#!/usr/bin/env python
"""Batch scaling of miller + exp_u steady times."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np, secrets
from bn254_tpu.utils.jcache import enable as _enable_jax_cache
_enable_jax_cache()

from bn254_tpu.constants import MONT_R, P
from bn254_tpu.fields import limbs as L
from bn254_tpu.fields import tower as T
from bn254_tpu.pairing import final_exp as FE
from bn254_tpu.pairing.pairing import _miller_jit

def sync(x):
    jax.block_until_ready(jax.tree_util.tree_leaves(x))
    return x

for B in [int(x) for x in sys.argv[1:]] or [1024, 4096]:
    def rnd_el(n):
        return L.from_ints([secrets.randbelow(P) * MONT_R % P for _ in range(n)], vmax=P)
    def rnd2(n):
        return T.Fq2(rnd_el(n), rnd_el(n))
    # miller on (2, B) pair-stacked batch
    def rs(e, shape):
        return L.El(e.arr.reshape((18,) + shape), e.vmax, e.lmax)
    px = rs(rnd_el(2 * B), (2, B)); py = rs(rnd_el(2 * B), (2, B))
    qx = T.Fq2(rs(rnd_el(2*B),(2,B)), rs(rnd_el(2*B),(2,B)))
    qy = T.Fq2(rs(rnd_el(2*B),(2,B)), rs(rnd_el(2*B),(2,B)))
    f12 = T.fq12_retag(T.Fq12(*[T.Fq6(*[T.Fq2(rnd_el(B), rnd_el(B)) for _ in range(3)]) for _ in range(2)]))

    t0 = time.time(); sync(_miller_jit(px, py, qx, qy)); c1 = time.time()-t0
    ts=[]
    for _ in range(2):
        t0=time.time(); sync(_miller_jit(px, py, qx, qy)); ts.append(time.time()-t0)
    mt = min(ts)
    t0 = time.time(); sync(FE._exp_u_jit(f12)); c2 = time.time()-t0
    ts=[]
    for _ in range(2):
        t0=time.time(); sync(FE._exp_u_jit(f12)); ts.append(time.time()-t0)
    et = min(ts)
    print(f"B={B:6d}  miller: compile={c1:6.1f}s steady={mt*1e3:8.1f}ms ({2*B/mt:9.0f} pairs/s)"
          f"  exp_u: compile={c2:6.1f}s steady={et*1e3:8.1f}ms", flush=True)
