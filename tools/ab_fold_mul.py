#!/usr/bin/env python
"""A/B: CIOS Pallas kernel vs MXU fold-matmul multiply (PERF §5 spike).

Measures M Fq-muls/s for both implementations on dependent chains (the
realistic dataflow — tower ops chain muls) and independent pairs, across
batch sizes. Prints one JSON line per config.

Run on the TPU: python tools/ab_fold_mul.py [chain_len]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bn254_tpu.utils.jcache import enable as _enable_jax_cache
_enable_jax_cache()

import secrets

from bn254_tpu.constants import NLIMBS, P
from bn254_tpu.fields import limbs as L
from bn254_tpu.kernels import fold_mul as FM
from bn254_tpu.kernels import montmul as MK
from tools.timing import measure

CHAIN = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def rnd_arr(n):
    vals = [secrets.randbelow(P) for _ in range(n)]
    return L.from_ints(vals, vmax=P).arr


def bench(name, fn, a, b, chain):
    f = jax.jit(fn)
    dt = measure(f, a, b, reps=4, inner=chain)
    n = a.shape[1]
    rate = n / dt / 1e6
    print(json.dumps({
        "impl": name, "batch": n, "chain": chain,
        "M_fq_muls_per_s": round(rate, 1),
    }), flush=True)
    return rate


def main():
    print(f"backend: {jax.default_backend()} "
          f"{jax.devices()[0].device_kind}", file=sys.stderr)
    for batch in (4096, 16384, 65536):
        a, b = rnd_arr(batch), rnd_arr(batch)

        def cios_chain(a, b):
            x = a
            for _ in range(CHAIN):
                x = MK.montmul_batched(x, b)
            return x

        def fold_chain(a, b):
            x = a
            for _ in range(CHAIN):
                x, _ = FM.fold_mul_arrays(x, b, 1 << 15, 1 << 15)
            return x

        def fold_sqr_chain(a, b):
            x = a
            for _ in range(CHAIN):
                x, _ = FM.fold_sqr_arrays(x, 1 << 15)
            return x

        def cios_sqr_chain(a, b):
            x = a
            for _ in range(CHAIN):
                x = MK.montmul_batched(x, x)
            return x

        r_cios = bench("cios_pallas", cios_chain, a, b, CHAIN)
        r_fold = bench("fold_matmul", fold_chain, a, b, CHAIN)
        bench("cios_sqr", cios_sqr_chain, a, b, CHAIN)
        bench("fold_sqr", fold_sqr_chain, a, b, CHAIN)
        print(json.dumps({
            "batch": batch, "speedup_fold_vs_cios": round(r_fold / r_cios, 3)
        }), flush=True)


if __name__ == "__main__":
    main()
