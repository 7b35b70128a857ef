#!/usr/bin/env python
"""Instrument the exact staged bench path at a given batch."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np
from bn254_tpu.utils.jcache import enable as _enable_jax_cache
_enable_jax_cache()

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256

from bn254_tpu import PrivateKey
from bn254_tpu.dist import batch_verify as BV
from bn254_tpu.hash.tai import hash_to_g1
from bn254_tpu.host import curve as HC
from bn254_tpu.utils import convert as CV
from bn254_tpu.pairing import final_exp as FE
from bn254_tpu.pairing.pairing import _miller_jit, _reduce_jit, _is_one_jit
from bn254_tpu.fields import tower as T

msgs = [b"prof-%06d" % i for i in range(B)]
sks = [PrivateKey(0x1234567 + 977 * i) for i in range(B)]
hpts = [hash_to_g1(m) for m in msgs]
sigs = [HC.g1_mul(h, k.scalar) for h, k in zip(hpts, sks)]
pks = [HC.g2_mul(HC.G2_ONE, k.scalar) for k in sks]
hx, hy = CV.g1_batch_to_device_affine(hpts)
sx, sy = CV.g1_batch_to_device_affine(sigs)
pqx, pqy = CV.g2_batch_to_device_affine(pks)


def sync(x):
    jax.block_until_ready(jax.tree_util.tree_leaves(x))
    return x

def run(tag):
    tt = time.time()
    t0 = time.time()
    pairs = sync(BV._independent_pairs_jit(hx, hy, sx, sy, pqx, pqy))
    print(f"[{tag}] pairs   {time.time()-t0:7.3f}s", flush=True)
    t0 = time.time()
    f = sync(_miller_jit(*pairs))
    print(f"[{tag}] miller  {time.time()-t0:7.3f}s", flush=True)
    t0 = time.time()
    red = sync(_reduce_jit(f))
    print(f"[{tag}] reduce  {time.time()-t0:7.3f}s", flush=True)
    t0 = time.time()
    e = sync(FE._easy_jit(T.fq12_retag(red)))
    print(f"[{tag}] easy    {time.time()-t0:7.3f}s", flush=True)
    e = T.fq12_retag(e)
    t0 = time.time()
    f1 = sync(FE._exp_u_jit(e))
    print(f"[{tag}] exp_u1  {time.time()-t0:7.3f}s", flush=True)
    t0 = time.time()
    f2 = sync(FE._exp_u_jit(f1))
    print(f"[{tag}] exp_u2  {time.time()-t0:7.3f}s", flush=True)
    t0 = time.time()
    f3 = sync(FE._exp_u_jit(f2))
    print(f"[{tag}] exp_u3  {time.time()-t0:7.3f}s", flush=True)
    t0 = time.time()
    h = sync(FE._hard_jit(e, f1, f2, f3))
    print(f"[{tag}] hard    {time.time()-t0:7.3f}s", flush=True)
    t0 = time.time()
    ok = sync(_is_one_jit(h))
    print(f"[{tag}] is_one  {time.time()-t0:7.3f}s  total={time.time()-tt:7.3f}s", flush=True)
    return ok

run("warm")
ok = run("steady")
print("all ok:", bool(np.asarray(ok).all()))
