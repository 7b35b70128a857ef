"""MXU-offloaded Montgomery multiplication via matmul folding (spike).

PERF.md §2 concluded the CIOS kernel is VPU-compute-saturated: further
leaf-multiply gains need either fewer VPU ops or a different unit. This
module is the SURVEY §7 / PERF §5 "MXU offload" experiment, restructured
so the whole Montgomery reduction — not just the m·p half — becomes a
matmul against compile-time constants:

    a·b·R⁻¹  =  Σ_k C[k] · 2^(15k) · 2^(-270)        (mod p)
             ≡  Σ_k C[k] · (2^(15k-270) mod p)       (mod p)

where C[k] are the 36 lazy schoolbook product columns. Every column is
folded through a PRECOMPUTED modular constant, so the entire reduction is
one (18, 108) @ (108, N) matmul on the MXU (108 = 36 columns x 3
seven-bit digit slices; two matmuls because the constant limbs split into
8+7-bit bf16-exact halves). The VPU keeps only:

  * the 324 limb products, group-of-4 lazily accumulated (exact in u32),
  * digit slicing of the 36 columns (bf16-exact 7-bit digits),
  * one carry chain + a short fold tail that crushes the value bound
    from ~2^267.7 down to < 2^257 (digit- then bit-granular folds of the
    top limb; see _fold_tail).

Exactness argument for the bf16 matmul: lhs constant entries <= 255 and
rhs digits <= 127 are both exactly representable in bf16; each product
<= 2^15 and the f32 accumulator holds sums < 2^22 over the 108-term
contraction — all integers < 2^24, hence exact.

Semantics and bound contract match `limbs.mont_mul` (REDC with R =
2^270): inputs value-lazy limb tensors, output limbs < 2^15 and value
< 2^257 (vs CIOS's ~a.vmax*b.vmax/R + p). Bit-exactness is pinned
against the Python-int oracle in tests/test_fold_mul.py; throughput A/B
against kernels/montmul.py lives in tools/ab_fold_mul.py.

Reference parity note: this replaces the same `zeropool-bn` Montgomery
core surveyed at SURVEY.md §2.3 (arith::U256 / Fq) — the algorithm
choice (fold-by-constant matmul vs CIOS) is TPU-architecture-driven.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import LIMB_BITS, LIMB_MASK, NLIMBS, P

U32 = jnp.uint32
BF16 = jnp.bfloat16
F32 = jnp.float32
MASK = np.uint32(LIMB_MASK)
R_BITS = LIMB_BITS * NLIMBS  # 270
NCOLS = 2 * NLIMBS  # 36 product columns
DIGIT_BITS = 7
# digit count is picked at TRACE time from the exact static column
# bounds: 3 for limb-normalised inputs (columns < 2^21), 4 for
# limb-lazy ones (columns < 2^28). Both matrices are cached.


def _limbs_of(v: int, n: int = NLIMBS) -> list[int]:
    return [(v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)]


@functools.lru_cache(maxsize=4)
def _fold_matrices(ndigits: int):
    """(GLO, GHI): (NLIMBS, NCOLS*ndigits) uint8-valued bf16 halves of
    the limb decomposition of 2^(7a + 15k - 270) mod p, row = a*NCOLS+k."""
    nrows = NCOLS * ndigits
    glo = np.zeros((NLIMBS, nrows), np.float32)
    ghi = np.zeros((NLIMBS, nrows), np.float32)
    r_inv = pow(1 << R_BITS, -1, P)
    for a in range(ndigits):
        for k in range(NCOLS):
            v = (1 << (DIGIT_BITS * a + LIMB_BITS * k)) * r_inv % P
            for i, limb in enumerate(_limbs_of(v)):
                glo[i, a * NCOLS + k] = limb & 0xFF
                ghi[i, a * NCOLS + k] = limb >> 8
    # NumPy (ml_dtypes bf16) constants, NOT jnp arrays: a jnp array built
    # inside a jit trace is a tracer, and lru_cache would leak it into
    # later traces (the BENCH_SUITE indep_fold failure).
    return glo.astype(BF16), ghi.astype(BF16)


def _product_columns(a_l, b_l, lmax_a: int, lmax_b: int):
    """Lazy schoolbook columns C[0..35], each < 2^21.

    Products are accumulated in groups whose exact u32 bound is checked
    at trace time from the static limb bounds (group of 4 for 15-bit
    limbs); each group splits 15/17 into (lo -> col k, hi -> col k+1).
    """
    prod_max = (lmax_a - 1) * (lmax_b - 1)
    group = max(1, (1 << 32) // max(prod_max, 1))
    group = min(group, 8)
    cols = [None] * (NCOLS + 1)
    col_bound = [0] * (NCOLS + 1)

    def add(k, x, bound):
        cols[k] = x if cols[k] is None else cols[k] + x
        col_bound[k] += bound

    for k in range(2 * NLIMBS - 1):
        pairs = [
            (i, k - i)
            for i in range(max(0, k - NLIMBS + 1), min(k + 1, NLIMBS))
        ]
        for g in range(0, len(pairs), group):
            chunk = pairs[g : g + group]
            s = None
            for i, j in chunk:
                prod = a_l[i] * b_l[j]
                s = prod if s is None else s + prod
            assert len(chunk) * prod_max < (1 << 32)
            add(k, s & MASK, 1 << LIMB_BITS)
            add(k + 1, s >> LIMB_BITS, len(chunk) * prod_max >> LIMB_BITS)
    for k in range(NCOLS):
        assert cols[k] is not None
    assert cols[NCOLS] is None or col_bound[NCOLS] == 0
    return cols[:NCOLS], col_bound[:NCOLS]


# fold constants for the tail: limb decompositions of 2^(255+j) mod p
_TAIL_BASE = LIMB_BITS * (NLIMBS - 1)  # 255


@functools.lru_cache(maxsize=8)
def _tail_consts(shift: int) -> np.ndarray:
    return np.array(
        _limbs_of((1 << (_TAIL_BASE + shift)) % P), dtype=np.uint32
    )


def _carry(cols, n: int):
    c = None
    out = []
    for i in range(n):
        v = cols[i] if c is None else cols[i] + c
        out.append(v & MASK)
        c = v >> LIMB_BITS
    return out, c


def _fold_tail(limbs, value_bound: int):
    """Crush value below ~2^257: the top limb (bits 255..270) is folded
    through 5-bit digit constants, then its residual through bit masks.

    Returns (limbs, value_bound) with limbs < 2^15.
    """
    # round 1: top limb (< 2^15) as 5-bit digits
    top = limbs[NLIMBS - 1]
    top_max = (value_bound - 1) >> _TAIL_BASE
    assert top_max < 1 << LIMB_BITS
    cols = list(limbs[: NLIMBS - 1]) + [jnp.zeros_like(top)]
    bound = 1 << _TAIL_BASE
    j = 0
    while top_max >> j:
        width = 5
        d = (top >> j) & np.uint32((1 << width) - 1)
        d_max = min(top_max >> j, (1 << width) - 1)
        consts = _tail_consts(j)
        for i in range(NLIMBS):
            cols[i] = cols[i] + d * consts[i]
        bound += d_max * ((1 << (_TAIL_BASE + j)) % P) + 1
        j += width
    limbs, c = _carry(cols, NLIMBS)
    assert bound < (1 << R_BITS)  # no carry out of the top limb

    # round 2: residual top limb is tiny; fold bit-by-bit (mask & add)
    top_max = (bound - 1) >> _TAIL_BASE
    if top_max:
        top = limbs[NLIMBS - 1]
        cols = list(limbs[: NLIMBS - 1]) + [jnp.zeros_like(top)]
        bound = 1 << _TAIL_BASE
        j = 0
        while top_max >> j:
            consts = _tail_consts(j)
            m = jnp.where(
                ((top >> j) & 1) != 0, np.uint32(0xFFFFFFFF), np.uint32(0)
            )
            for i in range(NLIMBS):
                cols[i] = cols[i] + (consts[i] & m)
            bound += (1 << (_TAIL_BASE + j)) % P + 1
            j += 1
        limbs, _ = _carry(cols, NLIMBS)
        assert bound < (1 << R_BITS)
    return limbs, bound


def fold_mul_arrays(aa: jnp.ndarray, bb: jnp.ndarray,
                    lmax_a: int, lmax_b: int):
    """(18, *batch) u32 limbs -> (REDC(a*b) limbs, value_bound).

    Pure-jnp implementation (XLA handles fusion + MXU dispatch); no
    Pallas. Returns limbs < 2^15 and the exact static value bound.
    """
    shape = jnp.broadcast_shapes(aa.shape, bb.shape)
    aa = jnp.broadcast_to(aa, shape).reshape(NLIMBS, -1)
    bb = jnp.broadcast_to(bb, shape).reshape(NLIMBS, -1)
    a_l = [aa[i] for i in range(NLIMBS)]
    b_l = [bb[i] for i in range(NLIMBS)]
    cols, col_bound = _product_columns(a_l, b_l, lmax_a, lmax_b)
    return _fold_columns(cols, col_bound, shape)


def _square_columns(a_l, lmax: int):
    """Lazy squaring columns: 171 products instead of 324.

    C[k] = sum_{i<j, i+j=k} 2*a_i*a_j + (k even ? a_{k/2}^2 : 0); the
    doubling rides a shift on the 30-bit product (exact in u32 for
    normalised limbs), and pairs of doubled products still group.
    """
    prod_max = (lmax - 1) ** 2
    assert 2 * prod_max < (1 << 32)
    group = max(1, (1 << 32) // max(2 * prod_max, 1))
    group = min(group, 8)
    cols = [None] * (NCOLS + 1)
    col_bound = [0] * (NCOLS + 1)

    def add(k, x, bound):
        cols[k] = x if cols[k] is None else cols[k] + x
        col_bound[k] += bound

    for k in range(2 * NLIMBS - 1):
        terms = []  # (i, j, doubled)
        for i in range(max(0, k - NLIMBS + 1), min(k + 1, NLIMBS)):
            j = k - i
            if i < j:
                terms.append((i, j, True))
            elif i == j:
                terms.append((i, j, False))
        for g in range(0, len(terms), group):
            chunk = terms[g : g + group]
            s = None
            hi_bound = 0
            for i, j, dbl in chunk:
                prod = a_l[i] * a_l[j]
                if dbl:
                    prod = prod << 1
                    hi_bound += 2 * prod_max
                else:
                    hi_bound += prod_max
                s = prod if s is None else s + prod
            assert hi_bound < (1 << 32)
            add(k, s & MASK, 1 << LIMB_BITS)
            add(k + 1, s >> LIMB_BITS, (hi_bound >> LIMB_BITS) + 1)
    for k in range(NCOLS):
        if cols[k] is None:
            cols[k] = jnp.zeros_like(a_l[0])
            col_bound[k] = 1
    assert cols[NCOLS] is None or col_bound[NCOLS] == 0
    return cols[:NCOLS], col_bound[:NCOLS]


def _fold_columns(cols, col_bound, shape):
    """Shared tail of fold_mul/fold_sqr: digit-slice, matmul, carry,
    bound-crush. Returns ((18, *shape) limbs, exact value bound)."""
    max_col = max(col_bound)
    ndigits = -(-max(max_col - 1, 1).bit_length() // DIGIT_BITS)

    digit_mask = np.uint32((1 << DIGIT_BITS) - 1)
    rows = []
    for a in range(ndigits):
        for k in range(NCOLS):
            rows.append(((cols[k] >> (DIGIT_BITS * a)) & digit_mask))
    x = jnp.stack(rows, axis=0).astype(BF16)

    glo, ghi = _fold_matrices(ndigits)
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=F32,
    )
    out_lo = dot(glo, x)
    out_hi = dot(ghi, x)
    assert NCOLS * ndigits * 127 * 255 < 1 << 24  # f32-exact accumulation
    pre = out_lo.astype(U32) + (out_hi.astype(U32) << 8)

    fold_bound = sum(
        min(127 * ndigits, cb - 1) * (P - 1) for cb in col_bound
    ) + 1
    assert fold_bound < (1 << R_BITS)

    limbs, c = _carry([pre[i] for i in range(NLIMBS)], NLIMBS)
    limbs, bound = _fold_tail(limbs, fold_bound)
    return jnp.stack(limbs, axis=0).reshape(shape), bound


def fold_sqr_arrays(aa: jnp.ndarray, lmax: int):
    """(18, *batch) u32 limbs -> (REDC(a*a) limbs, value_bound)."""
    shape = aa.shape
    aa2 = aa.reshape(NLIMBS, -1)
    a_l = [aa2[i] for i in range(NLIMBS)]
    cols, col_bound = _square_columns(a_l, lmax)
    return _fold_columns(cols, col_bound, shape)


def fold_sqr(a):
    """El-level squaring via the fold-matmul pipeline."""
    from ..fields import limbs as L

    a = L.norm_limbs(a) if a.lmax > (1 << LIMB_BITS) else a
    assert a.vmax * a.vmax < (1 << (2 * R_BITS))
    arr, bound = fold_sqr_arrays(a.arr, a.lmax)
    return L.El(arr, bound, 1 << LIMB_BITS)


def fold_mul(a, b):
    """El-level entry: REDC(a*b) with the fold-matmul pipeline.

    Drop-in for limbs.mont_mul (same residue, limbs < 2^15); output
    value bound is the fold pipeline's static ~2^257 instead of CIOS's
    input-dependent a.vmax*b.vmax/R + p.
    """
    from ..fields import limbs as L

    a = L.norm_limbs(a) if a.lmax > (1 << (LIMB_BITS + 1)) else a
    b = L.norm_limbs(b) if b.lmax > (1 << (LIMB_BITS + 1)) else b
    assert a.vmax * b.vmax < (1 << (2 * R_BITS))
    arr, bound = fold_mul_arrays(a.arr, b.arr, a.lmax, b.lmax)
    return L.El(arr, bound, 1 << LIMB_BITS)
