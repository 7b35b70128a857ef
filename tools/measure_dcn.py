#!/usr/bin/env python
"""Measure the REAL cross-process Fq12-product all-reduce (VERDICT r4 #8).

Spawns the same 2-process jax.distributed gloo cluster over TCP that
tests/test_multiprocess.py uses, with MP_BENCH_COLLECTIVE=1 so each
worker times the collective in isolation (tests/mp_worker.py
`_bench_collective`), and prints ONE JSON line with the measured
per-round cost. Feed the result to tools/scaling_report.py via
`--dcn-round-us` so SCALING.md's DCN term is measured, not literature.

Caveat (documented in SCALING.md): loopback TCP measures the full
jax.distributed + gloo SOFTWARE stack per round; a real DCN adds wire
latency (~10 us/hop) on top, so scaling_report uses
max(measured, literature-alpha + payload/beta) per round.
"""

import json
import os
import re
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def main():
    nproc = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one CPU device per process
    env["JAX_PLATFORMS"] = "cpu"
    env["MP_BENCH_COLLECTIVE"] = "1"
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), str(nproc), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1800)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            tail = "\n".join(out.splitlines()[-30:])
            raise SystemExit(f"proc {i} failed rc={p.returncode}:\n{tail}")
    m = re.search(
        r"MP-COLL nproc=(\d+) t_coll_us=([\d.]+) t_base_us=([\d.]+) "
        r"t_round_us=([\d.]+)",
        "\n".join(outs),
    )
    if not m:
        raise SystemExit("no MP-COLL line in worker output")
    print(json.dumps({
        "metric": "dcn_fq12_allreduce_round_us",
        "value": float(m.group(4)),
        "unit": "us/round (2-process gloo over loopback TCP)",
        "vs_baseline": 0.0,
        "nproc": int(m.group(1)),
        "t_coll_us": float(m.group(2)),
        "t_base_us": float(m.group(3)),
    }), flush=True)


if __name__ == "__main__":
    main()
