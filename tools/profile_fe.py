#!/usr/bin/env python
"""Sub-stage timing for final exp at a given batch."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np
from bn254_tpu.utils.jcache import enable as _enable_jax_cache
_enable_jax_cache()

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
import secrets
from bn254_tpu.constants import MONT_R, P
from bn254_tpu.fields import limbs as L
from bn254_tpu.fields import tower as T
from bn254_tpu.pairing import final_exp as FE

def rnd_el():
    return L.from_ints([secrets.randbelow(P) * MONT_R % P for _ in range(B)], vmax=P)

def rnd12():
    return T.Fq12(*[T.Fq6(*[T.Fq2(rnd_el(), rnd_el()) for _ in range(3)]) for _ in range(2)])

f = T.fq12_retag(rnd12())

def t(name, fn, *a):
    t0 = time.time()
    out = fn(*a)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    c = time.time() - t0
    ts = []
    for _ in range(2):
        t0 = time.time()
        out = fn(*a)
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        ts.append(time.time() - t0)
    print(f"{name:28s} compile+1st={c:7.1f}s  steady={min(ts)*1e3:9.1f} ms", flush=True)
    return out

g = t("easy", FE._easy_jit, f)
g = T.fq12_retag(g)
t1 = t("exp_u #1", FE._exp_u_jit, g)
t2 = t("exp_u #2", FE._exp_u_jit, t1)
t3 = t("exp_u #3", FE._exp_u_jit, t2)
t("hard", FE._hard_jit, g, t1, t2, t3)

inv_jit = jax.jit(T.fq12_inv)
t("fq12_inv", inv_jit, f)
sq_jit = jax.jit(lambda a: T.fq12_retag(T.fq12_sq(a)))
t("fq12_sq", sq_jit, f)
el = rnd_el()
t("fq_inv(pow 253)", jax.jit(L.inv_mod), el)
t("mont_mul[B]", jax.jit(L.mont_mul), el, el)
