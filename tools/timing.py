"""Trustworthy wall-clock timing for tunneled/async JAX backends.

On this environment's TPU tunnel ("axon" platform), `jax.block_until_ready`
returns before the device has executed anything — naive timing measures
dispatch latency (~30 us), inflating throughput by orders of magnitude
(measured: an 8192^3 bf16 matmul "took" 0.08 ms = 14 Pflop/s on a chip
whose peak is ~0.2 Pflop/s). The only reliable synchronisation point is a
device->host readback.

Protocol used here:
  1. warm up (compile + one run, readback).
  2. measure the fixed readback/tunnel overhead with a trivial op.
  3. enqueue `reps` dependent or independent executions, then read back a
     scalar derived from the last output; total wall time minus overhead,
     divided by reps, is the per-execution time.

`reps` should be large enough that reps * t_op >> overhead (~30-60 ms).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _readback(out) -> None:
    """Force a real device->host sync on the first array leaf of `out`."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1] if leaf.ndim else leaf))


_overhead_cache: dict[str, float] = {}


def readback_overhead() -> float:
    """Median fixed cost of a dispatch + scalar readback round trip."""
    key = jax.default_backend()
    if key in _overhead_cache:
        return _overhead_cache[key]
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((), jnp.float32)
    _readback(f(x))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        _readback(f(x))
        ts.append(time.perf_counter() - t0)
    oh = float(np.median(ts))
    _overhead_cache[key] = oh
    return oh


def measure(fn, *args, reps: int = 8, inner: int = 1) -> float:
    """Per-execution seconds of `fn(*args)`, overhead-corrected.

    Enqueues executions back-to-back (the device pipeline stays busy;
    dispatch is async) and syncs once at the end via readback. `inner`
    is a divisor for fns that already iterate internally.

    The readback overhead (~30 ms on the tunnel) is noisy, so the rep
    count auto-scales until the measured window is >= 16x the overhead
    (`reps` is the floor) — without this, sub-millisecond ops measure
    garbage.
    """
    out = fn(*args)
    _readback(out)  # compile + first run
    oh = readback_overhead()

    def window(k: int) -> float:
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        _readback(out)
        return time.perf_counter() - t0

    # pilot to estimate per-execution time, then scale reps
    pilot = window(reps)
    t_est = max((pilot - oh) / reps, 20e-6)  # floor: ~dispatch cost
    target = max(reps, int(16 * oh / t_est) + 1)
    target = min(target, max(reps, int(5.0 / t_est)), 20000)  # ~5 s cap
    # keep the pilot window as a candidate (it is a valid measurement at
    # k=reps); overhead is subtracted per-window below, scaled by its k
    best = (pilot - oh) / reps
    for _ in range(2):
        best = min(best, (window(target) - oh) / target)
    return max(best, 1e-12) / inner


def measure_compile_and_first(fn, *args) -> tuple[float, object]:
    """Wall seconds for compile + first execution (cold), with readback."""
    t0 = time.perf_counter()
    out = fn(*args)
    _readback(out)
    return time.perf_counter() - t0, out
