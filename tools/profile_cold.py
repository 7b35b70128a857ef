#!/usr/bin/env python
"""Break down the config-3 cold-compile cost (VERDICT r2 weak #5).

Times each staged program's compile separately at a given batch, in ONE
process, with the persistent cache enabled — so comparing two successive
runs of this script distinguishes:
  * Python trace time (paid every process, cache or not),
  * XLA+Mosaic compile time (first process only IF the persistent cache
    key is stable; paid again every process if it is not).

Usage: python tools/profile_cold.py [batch]
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
jax.config.update("jax_explain_cache_misses", True)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096


def tick(name, t0):
    dt = time.time() - t0
    print(f"{name}: {dt:.1f}s", flush=True)
    return time.time()


def main():
    t = time.time()
    from bn254_tpu.constants import P, MONT_R
    from bn254_tpu.fields import limbs as L
    from bn254_tpu.fields import tower as T
    from bn254_tpu.hash import tai_batch as TB
    from bn254_tpu.kernels import fused as FK
    from bn254_tpu.pairing import final_exp as FE
    from bn254_tpu.pairing import miller as M
    from bn254_tpu.pairing.pairing import _miller_jit, _reduce_jit, _is_one_jit
    from bn254_tpu.dist import batch_verify as BV
    from bn254_tpu.host import curve as HC
    from bn254_tpu.utils import convert as CV
    t = tick("imports", t)

    print(f"backend: {jax.default_backend()} B={B}", file=sys.stderr)

    import secrets

    def rnd_el(shape=(B,)):
        n = int(np.prod(shape))
        e = L.from_ints(
            np.array([secrets.randbelow(P) * MONT_R % P for _ in range(n)])
            .reshape(shape).tolist(), vmax=P)
        return e

    # one fused kernel alone (the unrolled Miller loop's per-digit body)
    xp, yp = rnd_el(), rnd_el()
    qx = T.Fq2(rnd_el(), rnd_el())
    qy = T.Fq2(rnd_el(), rnd_el())
    jax.block_until_ready(xp.arr)
    t = tick("fixture", t)

    if T._use_fused(xp):
        f0 = M._pin_fq12(T.fq12_one((B,)))
        t0 = M._pin_proj(M.ProjG2(qx, qy, T.fq2_one((B,))))
        xpp, ypp = M._pin_el(xp), M._pin_el(yp)
        out = FK.fused_op(M._dbl_body_impl, "miller_dbl_body",
                          f0, t0, xpp, ypp)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0].arr)
        t = tick("single dbl_body kernel (compile+run)", t)
        out2 = FK.fused_op(M._dbl_body_impl, "miller_dbl_body",
                           f0, t0, xpp, ypp)
        jax.block_until_ready(jax.tree_util.tree_leaves(out2)[0].arr)
        t = tick("single dbl_body kernel (again, same process)", t)

    # full miller stage
    f = _miller_jit(xp, yp, qx, qy)
    jax.block_until_ready(jax.tree_util.tree_leaves(f)[0].arr)
    t = tick("_miller_jit (65-digit unrolled stage)", t)

    # trace-only cost of the same stage (no compile): eval_shape
    jax.eval_shape(M.miller_loop, xp, yp, qx, qy)
    t = tick("_miller trace only (eval_shape)", t)

    red = _reduce_jit(T.fq12_retag(f))
    jax.block_until_ready(jax.tree_util.tree_leaves(red)[0].arr)
    t = tick("_reduce_jit", t)

    fe = FE.final_exp_staged(red)
    jax.block_until_ready(jax.tree_util.tree_leaves(fe)[0].arr)
    t = tick("final_exp_staged (easy + 3x exp_u + hard)", t)

    ok = _is_one_jit(fe)
    jax.block_until_ready(ok)
    t = tick("_is_one_jit", t)

    # hash stage
    msgs = [b"prof-%06d" % i for i in range(B)]
    blocks, w, s = TB.prepare_blocks_host(msgs)
    from functools import partial
    hj = jax.jit(partial(TB.hash_to_g1_batch, k_candidates=8))
    hx, hy, found, _ = hj(jnp.asarray(blocks), w, s)
    jax.block_until_ready(found)
    t = tick("hash stage (SHA256 K=8 + sqrt search)", t)


if __name__ == "__main__":
    main()
