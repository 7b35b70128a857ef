"""Worker process for the multi-process distributed test (not a pytest file).

Launched N times by tests/test_multiprocess.py with
  python mp_worker.py <process_id> <num_processes> <port>
Each process contributes one CPU device to a process-spanning mesh and
runs the FULL sharded fused verification pipeline (weight ladders, Miller
loops, cross-PROCESS Fq12-product all-reduce over gloo, G1 sum
all-reduce, shared final exponentiation) on a valid batch and a tampered
batch. Prints MP-RESULT lines the parent asserts on.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # exactly one local CPU device

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
from bn254_tpu.utils.jcache import enable as _enable_jax_cache
_enable_jax_cache()


def main():
    proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from bn254_tpu.config import Config
    from bn254_tpu.dist import mesh as MESH

    started = MESH.initialize(
        Config.from_env(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc,
            process_id=proc_id,
        )
    )
    assert started, "distributed init returned False"
    pid, pcount = MESH.process_info()
    assert (pid, pcount) == (proc_id, nproc)
    n_dev = len(jax.devices())
    assert n_dev == nproc, f"expected {nproc} global devices, got {n_dev}"
    print(f"MP-INIT proc={proc_id} global_devices={n_dev}", flush=True)

    from bn254_tpu.dist import batch_verify as BV
    from bn254_tpu.hash.tai import hash_to_g1
    from bn254_tpu.host import curve as HC
    from bn254_tpu.protocol.types import PrivateKey
    from bn254_tpu.utils import convert as CV

    mesh = MESH.make_mesh(axis_name="batch")

    # fixtures must be IDENTICAL on every process (SPMD input contract)
    B = 2 * nproc  # two tuples per shard
    msgs = [b"mp-%d" % i for i in range(B)]
    sks = [PrivateKey(424243 + 13 * i) for i in range(B)]
    hpts = [hash_to_g1(m) for m in msgs]
    sigs = [HC.g1_mul(h, k.scalar) for h, k in zip(hpts, sks)]
    pks = [HC.g2_mul(HC.G2_ONE, k.scalar) for k in sks]
    weights = [1] + [0x9E3779B97F4A7C15 + 2 * i for i in range(B - 1)]

    hx, hy = CV.g1_batch_to_device_affine(hpts)
    sx, sy = CV.g1_batch_to_device_affine(sigs)
    pqx, pqy = CV.g2_batch_to_device_affine(pks)

    run = BV.make_sharded_verifier(mesh, "batch")
    ok = bool(jax.device_get(run(hx, hy, sx, sy, pqx, pqy, weights)))
    print(f"MP-RESULT proc={proc_id} valid={ok}", flush=True)

    # tampered batch (signature 3 signed with the wrong key) must reject
    sigs_bad = list(sigs)
    sigs_bad[3] = HC.g1_mul(hpts[3], sks[2].scalar)
    sxb, syb = CV.g1_batch_to_device_affine(sigs_bad)
    bad = bool(jax.device_get(run(hx, hy, sxb, syb, pqx, pqy, weights)))
    print(f"MP-RESULT proc={proc_id} tampered={bad}", flush=True)

    assert ok and not bad
    print(f"MP-DONE proc={proc_id}", flush=True)


if __name__ == "__main__":
    main()
