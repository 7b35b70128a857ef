#!/usr/bin/env python
"""Parallel AOT pre-compilation of the staged pipeline (VERDICT r4 #6).

Thin CLI over bn254_tpu/dist/precompile.py: derives every stage
program's input avals abstractly, lowers them, and compiles them
CONCURRENTLY on a thread pool so cold first-contact drops toward
max(per-stage compile) instead of sum(per-stage compile). Executables
land in the persistent cache; the subsequent real run is a string of
cache hits.

Whether the wall actually drops depends on the compile service
parallelizing — tools/probe_parallel_compile.py measures that with
small disjoint programs; run it first on a new toolchain.

Usage: python tools/aot_prewarm.py [batch] [--workers N] [--validate]
Prints one JSON line with per-stage and total compile seconds.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bn254_tpu.utils.jcache import enable as _enable_jax_cache

_enable_jax_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batch", nargs="?", type=int, default=8192)
    ap.add_argument("--workers", type=int, default=6)
    ap.add_argument("--k-candidates", type=int, default=8)
    ap.add_argument("--validate", action="store_true",
                    help="also cross-check the abstract stage inputs "
                    "against a real tiny fixture (raises on mismatch)")
    args = ap.parse_args()

    from bn254_tpu.dist import precompile as PC

    if args.validate:
        t0 = time.time()
        PC.validate(4, k_candidates=args.k_candidates)
        log(f"validate(4): OK ({time.time() - t0:.1f}s)")

    t0 = time.time()
    lowered, _meta = PC.lower_adaptive(args.batch, args.k_candidates,
                                       log=log)
    t_lower = time.time() - t0
    log(f"lowered {len(lowered)} stages in {t_lower:.1f}s")

    t0 = time.time()
    _compiled, times = PC.compile_parallel(lowered, workers=args.workers,
                                           log=log)
    wall = time.time() - t0
    print(json.dumps({
        "metric": "aot_prewarm_wall_s",
        "value": round(t_lower + wall, 1),
        "unit": "s",
        "vs_baseline": 0.0,
        "batch": args.batch,
        "workers": args.workers,
        "lower_s": round(t_lower, 1),
        "compile_wall_s": round(wall, 1),
        "stage_compile_s": times,
        "sum_stage_s": round(sum(times.values()), 1),
    }), flush=True)


if __name__ == "__main__":
    main()
