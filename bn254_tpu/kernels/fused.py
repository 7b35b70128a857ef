"""Fused tower-op Pallas kernels: one launch per Fq12-level operation.

Measured motivation (PERF.md): an fq12_mul at batch 1024 spends ~0.14 ms
in the CIOS mul kernel and ~0.25 ms in the ~100 XLA ops around it
(Karatsuba pre-sums, carry chains, stack/unstack) — per-op fixed costs,
not bandwidth. Fusing a whole tower op into ONE Pallas kernel removes
that glue: all 54 leaf multiplications, pre-sums, xi-multiplications and
carry chains run straight-line on VMEM-resident (8, 128) tiles in the
limb-per-register layout of kernels/montmul.py.

Implementation: the kernels REUSE the existing tower formulas. The
kernel body re-wraps its refs as `limbs.El` values (with the callers'
exact static bounds) and calls the ordinary `fields.tower` function
under `limbs._KERNEL_MODE`, which switches `mont_mul` to straight-line
register CIOS and every carry chain to its unrolled form. Bit-exactness
with the XLA path is therefore by construction (same formula graph, same
op sequence per leaf) and is asserted by interpret-mode tests.

Dispatch happens in fields/tower.py (`_use_fused`): TPU backend, batch
>= config threshold, not already inside a kernel. CPU and small batches
keep the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import NLIMBS
from ..fields import limbs as L
from .montmul import _TILE

U32 = jnp.uint32
BLOCK = 1024  # batch elements per grid step (one (8,128) tile per limb)

# fused fq12 bodies need ~this much scoped VMEM for their live tiles;
# devices with less fall back to leaf kernels (fused_supported()).
_MIN_VMEM_BYTES = 64 * 1024 * 1024


def _vmem_limit_bytes() -> int:
    """Scoped-VMEM budget for the fused kernels.

    Config override first (BN254_VMEM_LIMIT_MB); otherwise derived from
    the device generation: v4/v5/v6 parts carry 128 MiB of VMEM (budget
    100 MiB, headroom for Mosaic's own scratch), v2/v3 only 16 MiB —
    too small for the straight-line fq12 bodies, so `fused_supported`
    reports False and dispatch keeps the leaf-kernel path.
    """
    from .. import config as C

    if C.DEFAULT.vmem_limit_mb is not None:
        return C.DEFAULT.vmem_limit_mb * 1024 * 1024
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return _MIN_VMEM_BYTES
    if "v2" in kind or "v3" in kind:
        return 16 * 1024 * 1024
    return 100 * 1024 * 1024


def fused_supported() -> bool:
    """True when the device's VMEM budget fits the fused fq12 bodies."""
    return _vmem_limit_bytes() >= _MIN_VMEM_BYTES


def _flatten_els(tree):
    """Pytree -> (El leaves, treedef) treating El as a leaf."""
    return jax.tree_util.tree_flatten(
        tree, is_leaf=lambda x: isinstance(x, L.El)
    )


class _KernelMode:
    def __enter__(self):
        self._old = L._KERNEL_MODE
        L._KERNEL_MODE = True

    def __exit__(self, *exc):
        L._KERNEL_MODE = self._old


@functools.lru_cache(maxsize=None)
def _out_struct(fn, treedef, bounds_in):
    """Abstract-eval fn under kernel mode on (18, 8, 128) blocks to learn
    the output pytree and the static El bounds (shape-independent)."""
    meta = {}

    def shaped(arrs):
        els = [
            L.El(a, vmax, lmax) for a, (vmax, lmax) in zip(arrs, bounds_in)
        ]
        with _KernelMode():
            out = fn(*jax.tree_util.tree_unflatten(treedef, els))
        leaves, otd = _flatten_els(out)
        meta["bounds"] = tuple((x.vmax, x.lmax) for x in leaves)
        meta["treedef"] = otd
        return [x.arr for x in leaves]

    abstract = [
        jax.ShapeDtypeStruct((NLIMBS,) + _TILE, U32) for _ in bounds_in
    ]
    shapes = jax.eval_shape(shaped, abstract)
    return len(shapes), meta["bounds"], meta["treedef"]


@functools.lru_cache(maxsize=None)
def _build(fn_key, fn, treedef, bounds_in, n_out, bounds_out, interpret):
    """Compile-cached pallas_call builder for one (op, signature)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_in = len(bounds_in)

    def kernel(*refs):
        in_refs, out_refs = refs[:n_in], refs[n_in:]
        els = [
            L.El(r[:], vmax, lmax)
            for r, (vmax, lmax) in zip(in_refs, bounds_in)
        ]
        with _KernelMode():
            out = fn(*jax.tree_util.tree_unflatten(treedef, els))
        leaves, _ = _flatten_els(out)
        assert len(leaves) == n_out
        for r, e, (vmax, lmax) in zip(out_refs, leaves, bounds_out):
            assert e.vmax <= vmax and e.lmax <= lmax
            r[:] = e.arr

    spec = pl.BlockSpec(
        (NLIMBS,) + _TILE, lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )

    @functools.partial(jax.jit, static_argnames=("n_padded",))
    def call(arrs, n_padded):
        nrows = n_padded // 128
        grid = n_padded // BLOCK
        arrs3 = [a.reshape(NLIMBS, nrows, 128) for a in arrs]
        outs = pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((NLIMBS, nrows, 128), U32)
            ] * n_out,
            grid=(grid,),
            in_specs=[spec] * n_in,
            out_specs=[spec] * n_out,
            interpret=interpret,
            # The straight-line fq12 bodies (54 leaf muls + carry chains
            # on 12x(18,8,128) operands) need more scoped-VMEM stack than
            # Mosaic's 16 MiB default; budget derived from the device
            # (see _vmem_limit_bytes / config.vmem_limit_mb).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_vmem_limit_bytes()
            ),
        )(*arrs3)
        return [o.reshape(NLIMBS, n_padded) for o in outs]

    return call


def fused_op(fn, fn_key: str, *args, interpret: bool = False):
    """Run `fn(*args)` (a fields.tower function over El pytrees) as ONE
    Pallas kernel, blocked over the common batch. Returns fn's pytree
    with (18, *batch) El leaves."""
    in_els, treedef = _flatten_els(args)
    batch = jnp.broadcast_shapes(*[e.arr.shape[1:] for e in in_els])
    n = 1
    for d in batch:
        n *= int(d)
    n_padded = -(-max(n, 1) // BLOCK) * BLOCK

    arrs = []
    for e in in_els:
        # append singleton batch dims (the limbs._bc convention) so an
        # unbatched (18,) constant broadcasts against (18, *batch);
        # jnp.broadcast_to's trailing-dim alignment alone would pair the
        # limb axis with a batch axis and fail
        a = e.arr.reshape(
            e.arr.shape + (1,) * (1 + len(batch) - e.arr.ndim)
        )
        a = jnp.broadcast_to(a, (NLIMBS,) + batch).reshape(NLIMBS, n)
        if n_padded != n:
            a = jnp.pad(a, [(0, 0), (0, n_padded - n)])
        arrs.append(a)

    bounds_in = tuple((e.vmax, e.lmax) for e in in_els)
    n_out, bounds_out, out_treedef = _out_struct(fn, treedef, bounds_in)
    call = _build(
        fn_key,
        fn,
        treedef,
        bounds_in,
        n_out,
        bounds_out,
        interpret,
    )
    outs = call(arrs, n_padded)
    leaves = [
        L.El(o[:, :n].reshape((NLIMBS,) + batch), vmax, lmax)
        for o, (vmax, lmax) in zip(outs, bounds_out)
    ]
    return jax.tree_util.tree_unflatten(out_treedef, leaves)
