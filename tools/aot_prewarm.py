#!/usr/bin/env python
"""Parallel AOT pre-compilation of the staged pipeline (VERDICT r4 #6).

Cold first-contact on a fresh machine costs ~22-46 min because the
staged pipeline's programs compile SEQUENTIALLY at first call (each
first call blocks on the remote compile service). The stages are
INDEPENDENT programs, so this tool lowers each one against abstract
(ShapeDtypeStruct) inputs — tracing is seconds — and then compiles them
CONCURRENTLY on a thread pool. Every finished executable lands in the
persistent compilation cache (utils/jcache.py), so the subsequent real
run is a string of cache hits: cold wall-clock drops toward
max(per-stage compile) instead of sum(per-stage compile).

Whether the wall actually drops depends on the compile service
parallelizing — tools/probe_parallel_compile.py measures that with two
small disjoint programs; run it first on a new toolchain.

Usage: python tools/aot_prewarm.py [batch] [--mode adaptive|independent]
Prints one JSON line with per-stage and total compile seconds.
"""

import argparse
import functools
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bn254_tpu.utils.jcache import enable as _enable_jax_cache

_enable_jax_cache()

from bn254_tpu.constants import NLIMBS
from bn254_tpu.dist import batch_verify as BV
from bn254_tpu.fields import limbs as L
from bn254_tpu.fields import tower as T
from bn254_tpu.hash import tai_batch as TB
from bn254_tpu.pairing import final_exp as FE
from bn254_tpu.pairing import pairing as DP

U32 = jnp.uint32


def _abs_el(batch, vmax=None, lmax=None):
    """Abstract El with the canonical post-stage bounds."""
    vmax = vmax if vmax is not None else L.STD_BOUND
    lmax = lmax if lmax is not None else (1 << 16)
    return L.El(
        jax.ShapeDtypeStruct((NLIMBS,) + tuple(batch), U32), vmax, lmax
    )


def lower_stages(B: int, k_candidates: int, rlc_bits: int):
    """(name, lowered) for every program of the adaptive/fused staged
    pipeline at batch B. Inputs are abstract; stage-to-stage signatures
    are propagated with jax.eval_shape, so no device work happens here.
    """
    from bn254_tpu.curve import glv as GLV

    stages = []

    # 1. device hash (blocks are (B, words) u32; shapes from the codec)
    blocks, cw, cs = TB.prepare_blocks_host([b"prewarm-%d" % i
                                             for i in range(B)])
    hash_fn = jax.jit(functools.partial(
        TB.hash_to_g1_batch, k_candidates=k_candidates))
    a_blocks = jax.ShapeDtypeStruct(blocks.shape, blocks.dtype)
    stages.append(("hash", hash_fn.lower(a_blocks, cw, cs)))
    hx_s, hy_s, _, _ = jax.eval_shape(hash_fn, a_blocks, cw, cs)

    # hash outputs are El pytrees already (eval_shape keeps aux bounds)
    el = _abs_el((B,), vmax=L.P_INT + 1)  # canonical device points
    fq2 = T.Fq2(el, el)
    half = rlc_bits // 2
    w = GLV.GlvWeights(
        _abs_el((B,), vmax=1 << half, lmax=1 << 15),
        _abs_el((B,), vmax=1 << half, lmax=1 << 15),
        rlc_bits,
    )

    # 2. fused points (GLV ladders + signature sum + affinize)
    pts_fn = functools.partial(BV._fused_points_jit, nbits=half)
    stages.append(
        ("fused_points",
         BV._fused_points_jit.lower(hx_s, hy_s, el, el, fq2, fq2, w,
                                    nbits=half))
    )
    pts_s = jax.eval_shape(pts_fn, hx_s, hy_s, el, el, fq2, fq2, w)

    # 3. batched Miller + reduce
    stages.append(("miller_reduce", BV._miller_reduce_jit.lower(*pts_s)))
    f_s = jax.eval_shape(BV._miller_reduce_jit, *pts_s)

    # 4. final-exp stages on the widened scalar
    fw_s = jax.eval_shape(FE._widen_jit, f_s)
    stages.append(("fe_widen", FE._widen_jit.lower(f_s)))
    fe_in = jax.eval_shape(lambda f: T.fq12_retag(f), fw_s)
    stages.append(("fe_easy", FE._easy_jit.lower(fe_in)))
    e_s = jax.eval_shape(FE._easy_jit, fe_in)
    stages.append(("fe_exp_u", FE._exp_u_jit.lower(e_s)))
    u_s = jax.eval_shape(FE._exp_u_jit, e_s)
    stages.append(("fe_hard", FE._hard_jit.lower(e_s, u_s, u_s, u_s)))
    h_s = jax.eval_shape(FE._hard_jit, e_s, u_s, u_s, u_s)
    stages.append(("fe_narrow", FE._narrow_jit.lower(h_s)))
    n_s = jax.eval_shape(FE._narrow_jit, h_s)
    stages.append(("is_one", DP._is_one_jit.lower(n_s)))

    return stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batch", nargs="?", type=int, default=8192)
    ap.add_argument("--workers", type=int, default=6)
    ap.add_argument("--k-candidates", type=int, default=8)
    args = ap.parse_args()

    from bn254_tpu import config as C

    t0 = time.time()
    stages = lower_stages(args.batch, args.k_candidates,
                          C.DEFAULT.rlc_bits)
    t_lower = time.time() - t0
    print(f"lowered {len(stages)} stages in {t_lower:.1f}s",
          file=sys.stderr, flush=True)

    times = {}

    def compile_one(item):
        name, lowered = item
        t = time.time()
        lowered.compile()
        times[name] = round(time.time() - t, 1)
        print(f"  compiled {name}: {times[name]}s",
              file=sys.stderr, flush=True)

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=args.workers) as ex:
        list(ex.map(compile_one, stages))
    wall = time.time() - t0
    print(json.dumps({
        "metric": "aot_prewarm_wall_s",
        "value": round(wall, 1),
        "unit": "s",
        "vs_baseline": 0.0,
        "batch": args.batch,
        "lower_s": round(t_lower, 1),
        "stage_compile_s": times,
        "sum_stage_s": round(sum(times.values()), 1),
    }), flush=True)


if __name__ == "__main__":
    main()
