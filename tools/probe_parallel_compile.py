#!/usr/bin/env python
"""Does the compile service parallelize? (VERDICT r4 #6 evidence probe)

Compiles four SMALL disjoint fq12-chain programs (distinct batch sizes,
so distinct cache keys), two sequentially and two concurrently on a
thread pool, against a THROWAWAY cache dir so every compile is cold.
If wall(parallel pair) ~= max(t3, t4) the service parallelizes and
tools/aot_prewarm.py will cut cold first-contact to ~max(stage);
if wall ~= t3 + t4 it serializes, and the prewarm cannot help
(documented either way). Prints one JSON line.
"""

import json
import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["BN254_CACHE_DIR"] = tempfile.mkdtemp(prefix="probe_cache_")

import jax

from bn254_tpu.utils.jcache import enable as _enable_jax_cache

_enable_jax_cache()

from bn254_tpu.constants import NLIMBS
from bn254_tpu.fields import limbs as L
from bn254_tpu.fields import tower as T

U32 = __import__("jax.numpy", fromlist=["uint32"]).uint32
CHAIN = 4


def lowered_chain(batch: int):
    def el():
        return L.El(
            jax.ShapeDtypeStruct((NLIMBS, batch), U32), L.STD_BOUND,
            1 << 16,
        )

    def fq12():
        return T.Fq12(*[T.Fq6(*[T.Fq2(el(), el()) for _ in range(3)])
                        for _ in range(2)])

    @jax.jit
    def chain(a, b):
        for _ in range(CHAIN):
            a = T.fq12_retag(T.fq12_mul(a, b))
        return a

    return chain.lower(fq12(), fq12())


def compile_timed(lowered):
    t0 = time.time()
    lowered.compile()
    return time.time() - t0


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)
    # sequential baseline: two distinct shapes
    t1 = compile_timed(lowered_chain(512))
    t2 = compile_timed(lowered_chain(640))
    print(f"sequential: {t1:.1f}s + {t2:.1f}s", file=sys.stderr, flush=True)
    # parallel pair: two MORE distinct shapes (cold)
    l3, l4 = lowered_chain(768), lowered_chain(896)
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=2) as ex:
        f3 = ex.submit(compile_timed, l3)
        f4 = ex.submit(compile_timed, l4)
        t3, t4 = f3.result(), f4.result()
    wall = time.time() - t0
    seq_est = t1 + t2
    speedup = (t3 + t4) / wall if wall else 0.0
    print(json.dumps({
        "metric": "parallel_compile_speedup",
        "value": round(speedup, 2),
        "unit": "sum(pair)/wall (2 threads)",
        "vs_baseline": 0.0,
        "sequential_s": [round(t1, 1), round(t2, 1)],
        "parallel_each_s": [round(t3, 1), round(t4, 1)],
        "parallel_wall_s": round(wall, 1),
        "verdict": (
            "parallelizes" if wall < 0.75 * (t3 + t4) else "serializes"
        ),
        "note": f"seq baseline {seq_est:.1f}s for two similar programs",
    }), flush=True)


if __name__ == "__main__":
    main()
