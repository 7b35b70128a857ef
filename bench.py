#!/usr/bin/env python
"""Benchmark harness: BLS aggregate-signature throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric: batched independent verifications/sec/chip (driver
config 3: vmapped hash-to-G1 + Miller loops + final exps). vs_baseline
is the speedup over the single-threaded host (pure-Python-int) oracle
doing the same verifications — the closest stand-in for the reference's
single-core Rust path, since the reference publishes no numbers
(BASELINE.md).

Extra detail lines go to stderr; pass --json-only to suppress them.
Flags: --smoke (tiny sizes for CI), --batch N, --mode {independent,fused}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_fp12_mul(args):
    """Fp12 muls/sec/chip (BASELINE.md metric 2): time a jitted chain of
    dependent fq12_muls over a large batch."""
    import secrets
    import jax
    import numpy as np

    from bn254_tpu.constants import MONT_R, P
    from bn254_tpu.fields import limbs as L
    from bn254_tpu.fields import tower as T

    B = args.batch or (128 if args.smoke else 8192)
    CHAIN = 4 if args.smoke else 16

    def rnd_el():
        return L.from_ints(
            [secrets.randbelow(P) * MONT_R % P for _ in range(B)], vmax=P
        )

    def rnd12():
        return T.Fq12(*[T.Fq6(*[T.Fq2(rnd_el(), rnd_el()) for _ in range(3)])
                        for _ in range(2)])

    a, b = rnd12(), rnd12()

    @jax.jit
    def chain(a, b):
        for _ in range(CHAIN):
            a = T.fq12_retag(T.fq12_mul(a, b))
        return a

    t0 = time.time()
    jax.block_until_ready(chain(a, b))
    log(f"fp12 chain compile+first: {time.time()-t0:.1f}s")
    reps = 1 if args.smoke else 3
    times = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(chain(a, b))
        times.append(time.time() - t0)
    dt = min(times)
    rate = B * CHAIN / dt
    log(f"fp12_mul: {dt*1e3:.1f} ms for {B}x{CHAIN} muls")
    print(json.dumps({
        "metric": "fp12_muls_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "muls/s",
        "vs_baseline": 1.0,
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--mode", default="independent",
                    choices=["independent", "fused", "fp12"])
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/bn254_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.mode == "fp12":
        return bench_fp12_mul(args)

    import numpy as np

    from bn254_tpu import ECDSA, PrivateKey, PublicKey
    from bn254_tpu.dist import batch_verify as BV
    from bn254_tpu.hash.tai import hash_to_g1
    from bn254_tpu.host import curve as HC
    from bn254_tpu.utils import convert as CV

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    B = args.batch or (8 if args.smoke else 4096)

    # ---- build a valid batch (host-side fixtures) ----
    t0 = time.time()
    msgs = [b"bench-msg-%06d" % i for i in range(B)]
    sks = [PrivateKey(0x1234567 + 977 * i) for i in range(B)]
    hpts = [hash_to_g1(m) for m in msgs]
    sigs = [HC.g1_mul(h, k.scalar) for h, k in zip(hpts, sks)]
    pks = [HC.g2_mul(HC.G2_ONE, k.scalar) for k in sks]
    log(f"fixture build: {time.time()-t0:.1f}s for B={B}")

    t0 = time.time()
    hx, hy = CV.g1_batch_to_device_affine(hpts)
    sx, sy = CV.g1_batch_to_device_affine(sigs)
    pqx, pqy = CV.g2_batch_to_device_affine(pks)
    log(f"host->device conversion: {time.time()-t0:.1f}s")

    # ---- device benchmark ----
    if args.mode == "independent":
        fn = BV.verify_batch_independent_staged
        bench_args = (hx, hy, sx, sy, pqx, pqy)
    else:
        fn = BV.verify_batch_fused_staged
        w = CV.scalars_to_device(BV.random_weights(B))
        bench_args = (hx, hy, sx, sy, pqx, pqy, w)

    t0 = time.time()
    out = None
    for attempt in range(3):
        try:
            out = jax.block_until_ready(fn(*bench_args))
            break
        except Exception as e:  # transient remote-compile flakes
            if attempt == 2 or "INTERNAL" not in str(e):
                raise
            log(f"compile attempt {attempt + 1} failed ({e}); retrying")
    compile_and_first = time.time() - t0
    log(f"compile+first run: {compile_and_first:.1f}s")
    ok = np.asarray(out)
    assert ok.all(), "benchmark batch failed verification!"

    reps = 1 if args.smoke else 3
    times = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*bench_args))
        times.append(time.time() - t0)
    dev_time = min(times)
    dev_rate = B / dev_time
    log(f"device: {dev_time*1e3:.1f} ms for {B} verifies "
        f"-> {dev_rate:.1f} verifications/s/chip")

    # ---- host-oracle baseline (sample a few) ----
    nb = min(3, B)
    t0 = time.time()
    for i in range(nb):
        pk = PublicKey(pks[i])
        from bn254_tpu.protocol.types import Signature

        ECDSA.verify(msgs[i], Signature(sigs[i]), pk)
    host_rate = nb / (time.time() - t0)
    log(f"host oracle: {host_rate:.2f} verifications/s (single-threaded)")

    result = {
        "metric": f"bls_verifications_per_sec_per_chip[{args.mode}]",
        "value": round(dev_rate, 2),
        "unit": "verifications/s",
        "vs_baseline": round(dev_rate / host_rate, 2),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
