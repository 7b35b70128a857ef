#!/usr/bin/env python
"""A/B on real TPU: fused Pallas tower kernels vs the XLA op path.

For each dispatched op (fq12_mul, fq12_sq, fq12_cyc_sq, fq12_mul_line,
g2 dbl/add Miller steps) this checks bit-exactness of canonical outputs
between the fused kernel and the pure-XLA path, then reports steady-state
timing for both (tools/timing.py protocol). Usage:

    python tools/ab_fused.py [batch ...]
"""
import os
import secrets
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bn254_tpu.utils.jcache import enable as _enable_jax_cache
_enable_jax_cache()

from bn254_tpu import config as C
from bn254_tpu.constants import MONT_R, P
from bn254_tpu.fields import limbs as L
from bn254_tpu.fields import tower as T
from bn254_tpu.pairing import miller as M
from tools.timing import measure


def rnd_el(B):
    return L.from_ints(
        [secrets.randbelow(P) * MONT_R % P for _ in range(B)], vmax=P
    )


def rnd2(B):
    return T.Fq2(rnd_el(B), rnd_el(B))


def rnd12(B):
    return T.Fq12(
        *[T.Fq6(*[rnd2(B) for _ in range(3)]) for _ in range(2)]
    )


def canon12(x):
    return np.stack([np.asarray(L.canon(e).arr) for e in T._fq12_els(x)])


def canon_proj(p):
    els = [p.x.c0, p.x.c1, p.y.c0, p.y.c1, p.z.c0, p.z.c1]
    return np.stack([np.asarray(L.canon(e).arr) for e in els])


def run(B):
    a, b = rnd12(B), rnd12(B)
    ln = (rnd2(B), rnd2(B), rnd2(B))
    t = M.ProjG2(rnd2(B), rnd2(B), rnd2(B))
    q = (rnd2(B), rnd2(B))
    xp, yp = rnd_el(B), rnd_el(B)

    cases = [
        ("fq12_mul", lambda: T.fq12_retag(T.fq12_mul(a, b)), canon12),
        ("fq12_sq", lambda: T.fq12_retag(T.fq12_sq(a)), canon12),
        ("fq12_cyc_sq", lambda: T.fq12_retag(T.fq12_cyc_sq(a)), canon12),
        (
            "fq12_mul_line",
            lambda: T.fq12_retag(M.fq12_mul_line(a, *ln)),
            canon12,
        ),
        (
            "g2_dbl_step",
            lambda: M._retag_proj(M._dbl_step(t, xp, yp)[0]),
            canon_proj,
        ),
        (
            "g2_add_step",
            lambda: M._retag_proj(M._add_step(t, *q, xp, yp)[0]),
            canon_proj,
        ),
    ]

    # whole-stage thunks: what actually matters for the verify step
    from bn254_tpu.pairing import final_exp as FE
    from bn254_tpu.pairing import miller as ML

    cases += [
        (
            "exp_u",
            lambda: T.fq12_retag(FE.exp_u(a)),
            canon12,
        ),
        (
            "miller_loop",
            lambda: T.fq12_retag(ML.miller_loop(xp, yp, q[0], q[1])),
            canon12,
        ),
    ]

    MODES = [
        ("fused", dict(use_pallas=None, fuse_tower_ops=True)),
        ("leaf", dict(use_pallas=None, fuse_tower_ops=False)),
        ("xla", dict(use_pallas=False, fuse_tower_ops=False)),
    ]
    base = C.DEFAULT
    for name, thunk, canon in cases:
        outs, times = {}, {}
        for mode, kw in MODES:
            C.DEFAULT = base.replace(**kw)
            f = jax.jit(thunk)
            outs[mode] = canon(f())
            times[mode] = measure(f, reps=4)
        C.DEFAULT = base
        ok = all(
            np.array_equal(outs["fused"], outs[m]) for m, _ in MODES[1:]
        )
        print(
            f"B={B:5d} {name:14s} bit-exact={ok}  "
            + "  ".join(
                f"{m}={times[m]*1e6:9.1f}us" for m, _ in MODES
            ),
            flush=True,
        )
        if not ok:
            sys.exit(1)


if __name__ == "__main__":
    for B in [int(x) for x in sys.argv[1:]] or [4096]:
        run(B)
