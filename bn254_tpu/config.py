"""Framework configuration (SURVEY.md §5.6).

One frozen dataclass for every tunable the framework exposes — mesh
shape, batch size, hash-search width, Pallas kernel toggle, RLC weight
width, staging — replacing scattered env vars and kwargs. Env vars are
still honoured as *defaults* (`Config.from_env`) so ops overrides work
without code changes, but all call sites consume a Config.

The reference's only config surface is a cargo feature flag
(reference Cargo.toml:15-17); everything here is new-build territory.
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass(frozen=True)
class Config:
    """Knobs for the batched/sharded verification pipeline."""

    # hash-to-G1: device candidate-counters per message (SURVEY §3.5);
    # miss probability ~2^-K with host fallback for the remainder.
    k_candidates: int = 8

    # random-linear-combination weight width (bits) for fused batch
    # verification; forgery slips through with probability ~2^-bits.
    rlc_bits: int = 128

    # draw RLC weights in GLV form w = a + λb (curve/glv.py): same
    # ~2^-rlc_bits soundness, HALF the weight-ladder steps (a joint
    # Shamir ladder over {P, φP, P+φP}). Mirrors BN254_DISABLE_GLV.
    glv_weights: bool = True

    # Pallas CIOS kernel: None = auto (TPU backend + enough lanes),
    # True/False = force. Mirrors the BN254_DISABLE_PALLAS env var.
    use_pallas: bool | None = None

    # Fused tower-op Pallas kernels (kernels/fused.py): whole Fq12-level
    # ops as single kernels. False falls back to leaf CIOS kernels with
    # XLA glue. Mirrors BN254_DISABLE_FUSED.
    fuse_tower_ops: bool = True

    # Unroll the Miller loop / exp_u at trace time over their STATIC
    # schedules (one fused step-body kernel per digit, no scan/cond/
    # select glue, add work only on nonzero digits). Requires
    # fuse_tower_ops. Mirrors BN254_DISABLE_UNROLL.
    unroll_static_loops: bool = True

    # minimum flat batch for the Pallas kernel to beat the scan path.
    pallas_min_lanes: int = 256

    # shared-squaring 2-pair Miller loop with host-precomputed constant
    # -G2::one lines for the independent verification tier (pairing/
    # precompute.py): one fq12_sq per digit per TUPLE instead of per
    # pair, no device G2 arithmetic for the constant pair. Requires
    # unroll_static_loops + the fused TPU path. Mirrors BN254_PAIR2 /
    # BN254_DISABLE_PAIR2.
    # Default ON since round 4: measured 36,761 verifies/s/chip vs
    # 30,645 stacked-pair (B=4096, BENCH_SUITE indep_pair2_B4096; the
    # bench's ok.all() assert is the device correctness gate).
    pair2_miller: bool = True

    # scoped-VMEM budget (MiB) for the fused tower-op kernels; None =
    # derive from the device generation (128 MiB VMEM parts get 100,
    # 16 MiB parts disable fusion). Mirrors BN254_VMEM_LIMIT_MB.
    vmem_limit_mb: int | None = None

    # staged pipelines (several small jitted programs) vs one monolithic
    # program; staging compiles ~10x faster on this toolchain.
    staged: bool = True

    # mesh axis name used by the sharded verifier and collectives.
    axis_name: str = "batch"

    # multi-host (jax.distributed) settings; None = single-process.
    coordinator_address: str | None = None
    num_processes: int = 1
    process_id: int = 0

    @classmethod
    def from_env(cls, **overrides) -> "Config":
        """Defaults from the environment, then explicit overrides."""
        env = {}
        if os.environ.get("BN254_DISABLE_PALLAS"):
            env["use_pallas"] = False
        if os.environ.get("BN254_DISABLE_FUSED"):
            env["fuse_tower_ops"] = False
        if os.environ.get("BN254_DISABLE_UNROLL"):
            env["unroll_static_loops"] = False
        if os.environ.get("BN254_PAIR2"):
            env["pair2_miller"] = True
        if os.environ.get("BN254_DISABLE_PAIR2"):
            env["pair2_miller"] = False
        if os.environ.get("BN254_K_CANDIDATES"):
            env["k_candidates"] = int(os.environ["BN254_K_CANDIDATES"])
        if os.environ.get("BN254_VMEM_LIMIT_MB"):
            env["vmem_limit_mb"] = int(os.environ["BN254_VMEM_LIMIT_MB"])
        if os.environ.get("BN254_RLC_BITS"):
            env["rlc_bits"] = int(os.environ["BN254_RLC_BITS"])
        if os.environ.get("BN254_DISABLE_GLV"):
            env["glv_weights"] = False
        if os.environ.get("BN254_COORDINATOR"):
            env["coordinator_address"] = os.environ["BN254_COORDINATOR"]
            env["num_processes"] = int(os.environ.get("BN254_NUM_PROCESSES", "1"))
            env["process_id"] = int(os.environ.get("BN254_PROCESS_ID", "0"))
        env.update(overrides)
        return cls(**env)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


DEFAULT = Config.from_env()
