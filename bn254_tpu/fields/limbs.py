"""Lane-packed 256-bit lazy Montgomery limb engine for TPU (v2).

TPU-native replacement for the reference dependency's `arith::U256` /
Montgomery field core (SURVEY.md §2.3). Field elements are little-endian
**15-bit limbs in uint32 tensors of shape (18, *batch)** with Montgomery
radix R = 2^270.

Why this layout (v2 design notes — the v1 16x16 engine compiled and ran
correctly but drowned XLA in per-add carry scans):

* **Redundancy buys laziness.** 15-bit limbs in 32-bit lanes leave one
  bit of limb headroom and ~14 bits of value headroom (values stay below
  ~2^258, capacity is 2^270). Consequences:
    - **Addition is ONE vector op** (limb-wise add, no carry, no
      conditional subtract).
    - **Subtraction is one signed carry chain** plus a static
      multiple-of-p offset — no conditional subtracts.
    - **REDC needs no final conditional subtract**, and no value
      reduction appears anywhere in the hot path; canonicalisation
      happens only at codec/compare boundaries.
* **Exact static bound tracking.** Every element (`El`) carries its
  exact value bound and limb bound as *static* pytree metadata; overflow
  is a Python assertion at trace time, costing nothing at runtime.
  `mont_mul` auto-normalises limb-lazy inputs with a single unrolled
  carry chain over the stacked operand.
* **All carry chains are unrolled straight-line code** (18-36 steps of
  elementwise uint32/int32 ops). No `lax.scan`/`while` in field ops —
  XLA fuses flat elementwise chains and compiles orders of magnitude
  faster than thousands of tiny loop subcomputations.
* **Limbs lead, batch trails**: the trailing batch dim maps to the
  128-wide VPU lanes, limbs to sublanes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    LIMB_BITS,
    LIMB_MASK,
    MONT_NEG_P_INV,
    MONT_R,
    MONT_R2_MOD_P,
    MONT_R_MOD_P,
    NLIMBS,
    P,
    from_limbs,
    to_limbs,
)

U32 = jnp.uint32
I32 = jnp.int32
MASK = np.uint32(LIMB_MASK)
CAPACITY = 1 << (LIMB_BITS * NLIMBS)  # 2^270
_PROD_LIMIT = 1 << 32  # a_i * b_j must stay below this (uint32 exact)
_COL_LIMIT = 1 << 26  # column values entering a carry chain
# T = a*b + m*p must fit 2*NLIMBS limbs (2^540) with margin
_T_LIMIT = 1 << 538

# standard carrier bound used to stabilise scan carriers (see retag):
# tower-op outputs on STD-bound inputs stay below ~2^263.5 (the worst
# chain is mul-out -> xi-mul (x9 + sub offset) -> adds), so 2^264 is a
# stable fixed point.
STD_BOUND = 1 << 262


# ---------------------------------------------------------------------------
# Element type: array + static exact bounds
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class El:
    """A (batched) bigint in limb form with static bounds.

    arr: (NLIMBS, *batch) uint32 limbs, little-endian, radix 2^15.
    vmax: exclusive upper bound on the represented value (exact int).
    lmax: exclusive upper bound on every limb (exact int).
    """

    arr: jnp.ndarray
    vmax: int
    lmax: int

    def tree_flatten(self):
        return (self.arr,), (self.vmax, self.lmax)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    @property
    def batch_shape(self):
        return self.arr.shape[1:]


def retag(a: El, vmax: int, lmax: int | None = None) -> El:
    """Coerce bounds UP (for scan-carrier stability). Asserts validity."""
    lm = lmax if lmax is not None else a.lmax
    assert a.vmax <= vmax and a.lmax <= lm, (a.vmax, vmax, a.lmax, lm)
    return El(a.arr, vmax, lm)


# ---------------------------------------------------------------------------
# Host <-> device conversion
# ---------------------------------------------------------------------------


def from_ints(values, vmax: int | None = None) -> El:
    """Python ints (scalar or nested lists) -> normalised El."""
    arr = np.array(values, dtype=object)
    out = np.zeros((NLIMBS,) + arr.shape, dtype=np.uint32)
    flat = arr.reshape(-1)
    oflat = out.reshape(NLIMBS, -1)
    mx = 0
    for j in range(flat.shape[0]):
        v = int(flat[j])
        mx = max(mx, v)
        for i in range(NLIMBS):
            oflat[i, j] = (v >> (LIMB_BITS * i)) & LIMB_MASK
    bound = vmax if vmax is not None else mx + 1
    assert bound <= CAPACITY
    return El(jnp.asarray(out), bound, 1 << LIMB_BITS)


def to_ints(a) -> np.ndarray:
    """El or raw (NLIMBS, *batch) limbs -> object ndarray of ints."""
    host = np.asarray(a.arr if isinstance(a, El) else a).astype(object)
    weights = np.array([1 << (LIMB_BITS * i) for i in range(host.shape[0])],
                       dtype=object)
    return np.tensordot(weights, host, axes=(0, 0))


def to_int(a) -> int:
    return int(to_ints(a).reshape(-1)[0])


def const_el(x: int) -> El:
    """Compile-time constant -> (NLIMBS,) El (canonical limbs).

    The array is a NumPy ndarray, not a device array: Python-level limb
    indexing then yields scalar immediates, which is what the kernel-mode
    paths need (Pallas kernels may not capture array constants) and lets
    XLA fold them everywhere else."""
    return El(np.array(to_limbs(x, NLIMBS), dtype=np.uint32), x + 1,
              1 << LIMB_BITS)


def _bc(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Append singleton batch dims so (18, ...) broadcasts against rank ndim."""
    if x.ndim < ndim:
        return x.reshape(x.shape + (1,) * (ndim - x.ndim))
    return x


def _bc2(a: jnp.ndarray, b: jnp.ndarray):
    nd = max(a.ndim, b.ndim)
    return _bc(a, nd), _bc(b, nd)


# ---------------------------------------------------------------------------
# Carry chains (lax.scan over the limb axis — tiny traced programs; the
# XLA-for-TPU toolchain's compile time is superlinear in program size, so
# every repeated limb chain is expressed as a loop, not unrolled code)
# ---------------------------------------------------------------------------


def _pad_cols(cols: jnp.ndarray, out_len: int) -> jnp.ndarray:
    k = cols.shape[0]
    if out_len > k:
        pad = jnp.zeros((out_len - k,) + cols.shape[1:], cols.dtype)
        cols = jnp.concatenate([cols, pad], axis=0)
    return cols[:out_len]


def _carry_u_step(c, col):
    t = col + c
    return t >> LIMB_BITS, t & MASK


def _carry_s_step(c, col):
    t = col + c
    return t >> LIMB_BITS, (t & I32(LIMB_MASK)).astype(U32)


# Module-level jits so EAGER calls (stage boundaries, codecs) hit one
# cached executable per shape instead of re-tracing + re-XLA-compiling a
# fresh scan closure on every call (~0.4s/call through the remote
# compiler — this was the dominant cost of the staged pipeline).
@jax.jit
def _carry_u_scan(cols: jnp.ndarray) -> jnp.ndarray:
    _, limbs = jax.lax.scan(
        _carry_u_step, jnp.zeros(cols.shape[1:], U32), cols
    )
    return limbs


@jax.jit
def _carry_s_scan(cols: jnp.ndarray) -> jnp.ndarray:
    _, limbs = jax.lax.scan(
        _carry_s_step, jnp.zeros(cols.shape[1:], I32), cols
    )
    return limbs


# True while tracing INSIDE a Pallas kernel body (kernels/fused.py): all
# limb ops must then be straight-line register code — unrolled carries,
# list-form CIOS, no nested pallas_call dispatch.
_KERNEL_MODE = False


def _unroll_carries() -> bool:
    """Carry chains: straight-line unrolled code on TPU, lax.scan on CPU.

    Measured (tools A/B on v5e, PERF.md): an 18-iteration XLA while-loop
    costs ~26 us regardless of batch size — pure loop overhead — and a
    separate Pallas carry kernel pays ~20 us launch + relayout, no
    better. An unrolled chain fuses with the surrounding elementwise ops
    (column construction, neighbours) at zero overhead. The scan form is
    kept for CPU where the test suite's compile time dominates.
    """
    if _KERNEL_MODE:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _carry_u(cols: jnp.ndarray, out_len: int, col_max: int) -> jnp.ndarray:
    """Unsigned carry propagation: (K, *b) columns -> (out_len, *b) limbs."""
    assert col_max < 1 << 31
    cols = _pad_cols(cols, out_len)
    if _unroll_carries():
        c = jnp.zeros(cols.shape[1:], U32)
        limbs = []
        for i in range(out_len):
            v = cols[i] + c
            limbs.append(v & MASK)
            c = v >> LIMB_BITS
        return jnp.stack(limbs, axis=0)
    return _carry_u_scan(cols)


def _carry_s(cols: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Signed carry propagation for int32 columns (arithmetic shifts
    propagate negative carries); total value must be non-negative."""
    cols = _pad_cols(cols.astype(I32), out_len)
    if _unroll_carries():
        c = jnp.zeros(cols.shape[1:], I32)
        limbs = []
        for i in range(out_len):
            v = cols[i] + c
            limbs.append((v & I32(LIMB_MASK)).astype(U32))
            c = v >> LIMB_BITS
        return jnp.stack(limbs, axis=0)
    return _carry_s_scan(cols)


def norm_limbs(a: El) -> El:
    """Carry-normalise limbs to < 2^15 (value unchanged; must fit capacity)."""
    if a.lmax <= (1 << LIMB_BITS):
        return a
    assert a.vmax <= CAPACITY and a.lmax <= _COL_LIMIT
    return El(_carry_u(a.arr, NLIMBS, a.lmax), a.vmax, 1 << LIMB_BITS)


# ---------------------------------------------------------------------------
# Lazy add / offset sub / small-constant mul
# ---------------------------------------------------------------------------


def add_mod(a: El, b: El) -> El:
    """Lazy modular add: one vector op. Limbs and value bounds sum."""
    aa, ba = _bc2(a.arr, b.arr)
    out = El(aa + ba, a.vmax + b.vmax, a.lmax + b.lmax)
    assert out.lmax <= _COL_LIMIT and out.vmax <= CAPACITY
    return out


def double_mod(a: El) -> El:
    return add_mod(a, a)


def _sub_offset(bound: int) -> tuple[int, El]:
    """Smallest multiple of p >= bound (static, exact — overshoot < p)."""
    k = -(-bound // P)
    c = k * P
    return c, const_el(c)


def _sub_cols_inline(a_l, b_l, c_limbs, batch) -> jnp.ndarray:
    """Kernel-mode fused column build + signed carry: per-limb scalar
    offsets (no captured constant arrays), fully unrolled."""
    carry = jnp.zeros(batch, I32)
    limbs = []
    for i in range(NLIMBS):
        col = np.int32(c_limbs[i]) + carry
        if a_l is not None:
            col = col + a_l[i].astype(I32)
        if b_l is not None:
            col = col - b_l[i].astype(I32)
        limbs.append(
            jnp.broadcast_to((col & I32(LIMB_MASK)).astype(U32), batch)
        )
        carry = col >> LIMB_BITS
    return jnp.stack(limbs, axis=0)


def sub_mod(a: El, b: El) -> El:
    """a - b + 2^j p (signed carry chain; output limb-normalised)."""
    c_val, c_el = _sub_offset(b.vmax)
    assert a.lmax + (1 << LIMB_BITS) + b.lmax < (1 << 31)
    aa, ba = _bc2(a.arr, b.arr)
    out_v = a.vmax + c_val
    assert out_v <= CAPACITY
    if _KERNEL_MODE:
        batch = jnp.broadcast_shapes(aa.shape, ba.shape)[1:]
        arr = _sub_cols_inline(
            _limb_slices(aa), _limb_slices(ba), to_limbs(c_val, NLIMBS), batch
        )
        return El(arr, out_v, 1 << LIMB_BITS)
    ca = _bc(c_el.arr, max(aa.ndim, ba.ndim))
    cols = aa.astype(I32) + ca.astype(I32) - ba.astype(I32)
    return El(_carry_s(cols, NLIMBS), out_v, 1 << LIMB_BITS)


def neg_mod(a: El) -> El:
    """(2^j p) - a."""
    c_val, c_el = _sub_offset(a.vmax)
    if _KERNEL_MODE:
        arr = _sub_cols_inline(
            None, _limb_slices(a.arr), to_limbs(c_val, NLIMBS),
            a.arr.shape[1:],
        )
        return El(arr, c_val + 1, 1 << LIMB_BITS)
    ca = _bc(c_el.arr, a.arr.ndim)
    cols = ca.astype(I32) - a.arr.astype(I32)
    return El(_carry_s(cols, NLIMBS), c_val + 1, 1 << LIMB_BITS)


def mul_small(a: El, k: int) -> El:
    """a * k for a small positive constant (carry-normalised output)."""
    assert 0 < k and a.lmax * k < _COL_LIMIT
    out_v = a.vmax * k
    assert out_v <= CAPACITY
    return El(_carry_u(a.arr * U32(k), NLIMBS, a.lmax * k), out_v, 1 << LIMB_BITS)


# ---------------------------------------------------------------------------
# Montgomery multiplication (radix 2^270)
# ---------------------------------------------------------------------------

P_EL = const_el(P)
PINV_EL = const_el(MONT_NEG_P_INV)
R_MOD_P_EL = const_el(MONT_R_MOD_P)
R2_EL = const_el(MONT_R2_MOD_P)
ONE_EL = const_el(1)


def _skew_sum(mat: jnp.ndarray, ncols: int, offset: int) -> jnp.ndarray:
    """sum_i shift(mat[i], by i+offset) -> (ncols, *batch) columns.

    The skew trick: pad each row to width W = ncols+1, flatten, and re-view
    as width-ncols rows — flat index W*i + j + offset lands at (row i,
    col i+j+offset), realising the per-row diagonal shift with a single
    pad + reshape + slice + reshape + sum (5 ops total instead of one
    padded add per row). Terms with i+j+offset >= ncols are masked out
    up front (they would alias into the next row's view).
    """
    n, m = mat.shape[0], mat.shape[1]
    batch = mat.shape[2:]
    w = ncols + 1
    if n - 1 + m - 1 + offset >= ncols:
        keep = np.zeros((n, m), dtype=np.uint32)
        for i in range(n):
            for j in range(m):
                keep[i, j] = 1 if i + j + offset < ncols else 0
        mat = mat * jnp.asarray(keep).reshape((n, m) + (1,) * len(batch))
    assert m + offset <= w
    padded = jnp.pad(
        mat, [(0, 0), (offset, w - m - offset)] + [(0, 0)] * len(batch)
    )
    flat = padded.reshape((n * w,) + batch)
    rows = flat[: n * ncols].reshape((n, ncols) + batch)
    return jnp.sum(rows, axis=0)


def _mul_cols(a: jnp.ndarray, b: jnp.ndarray, ncols: int) -> jnp.ndarray:
    """Column sums of a*b (no carries): (n,*ba) x (m,*bb) -> (ncols, *b)."""
    aa, ba = _bc2(a, b)
    prod = aa[:, None] * ba[None, :]  # (n, m, *batch) uint32, exact
    lo = prod & MASK
    hi = prod >> LIMB_BITS
    return _skew_sum(lo, ncols, 0) + _skew_sum(hi, ncols, 1)


# -p^{-1} mod 2^15 for the per-limb CIOS reduction digit
PINV0 = np.uint32((-pow(P, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS))

_P_LIMBS_NP = [np.uint32(x) for x in to_limbs(P, NLIMBS)]


def _limb_slices(x):
    """Per-limb slices of a (NLIMBS, *batch) operand for kernel-mode code.

    NumPy-backed constants (const_el, broadcast-reshaped) reduce to
    SCALAR immediates so Pallas kernel bodies never capture array
    constants; traced operands slice normally."""
    if isinstance(x, np.ndarray):
        flat = x.reshape(NLIMBS, -1)
        assert flat.shape[1] == 1 or all(
            np.all(flat[j] == flat[j, 0]) for j in range(NLIMBS)
        ), "non-uniform NumPy operand in kernel mode"
        return [flat[j, 0] for j in range(NLIMBS)]
    return [x[j] for j in range(NLIMBS)]


def _mont_mul_inline(aa, bb, out_v: int) -> El:
    """Straight-line CIOS on limb tensors (kernel mode).

    Identical op sequence to kernels/montmul.py's Pallas body: the limb
    axis is handled as a Python list of slices so the per-step shift is
    register renaming, every carry is unrolled. Used when tracing INSIDE
    a fused Pallas kernel (kernels/fused.py), where dispatching a nested
    pallas_call is impossible and scans are hostile.

    Operands are sliced per limb BEFORE any jnp op so that NumPy-backed
    constants (const_el) stay scalar immediates — Pallas kernels may not
    capture array constants.
    """
    shape = jnp.broadcast_shapes(aa.shape, bb.shape)
    batch = shape[1:]
    b_l = _limb_slices(bb)
    a_l = _limb_slices(aa)
    zero = jnp.zeros(batch, U32)
    t = [zero] * (NLIMBS + 1)
    for i in range(NLIMBS):
        ai = a_l[i]
        for j in range(NLIMBS):
            prod = ai * b_l[j]  # exact in uint32 (limbs < 2^16)
            t[j] = t[j] + (prod & MASK)
            t[j + 1] = t[j + 1] + (prod >> LIMB_BITS)
        m_i = (t[0] * PINV0) & MASK
        for j in range(NLIMBS):
            prod2 = m_i * _P_LIMBS_NP[j]
            t[j] = t[j] + (prod2 & MASK)
            t[j + 1] = t[j + 1] + (prod2 >> LIMB_BITS)
        carry0 = t[0] >> LIMB_BITS  # t[0] & MASK == 0 by construction
        t = t[1:] + [zero]
        t[0] = t[0] + carry0
    c = zero
    limbs_out = []
    for i in range(NLIMBS):
        v = t[i] + c
        limbs_out.append(jnp.broadcast_to(v & MASK, batch))
        c = v >> LIMB_BITS
    return El(jnp.stack(limbs_out, axis=0), out_v, 1 << LIMB_BITS)


def mont_mul(a: El, b: El) -> El:
    """REDC(a*b) with R = 2^270, interleaved CIOS as a scan over a's limbs.

    Per scan step: T += a_i * b; m_i = -T[0]/p mod 2^15; T += m_i * p;
    T >>= one limb. After 18 steps T = (a*b + m*p) / R. Column values
    stay below 2^22 (lazy accumulation, no per-step carries); one final
    carry chain normalises the limbs. No conditional subtraction.

    Inputs may be limb-lazy (limbs < 2^16 used directly; lazier inputs
    are carry-normalised first) and value-lazy (values < ~2^262).
    Output: limbs < 2^15, value < a.vmax*b.vmax/R + p — in practice
    < 2^258 for all closed-loop uses.
    """
    if a.lmax * b.lmax > _PROD_LIMIT:
        a = norm_limbs(a)
        if a.lmax * b.lmax > _PROD_LIMIT:
            b = norm_limbs(b)
    assert a.lmax * b.lmax <= _PROD_LIMIT
    assert a.vmax * b.vmax + MONT_R * P <= _T_LIMIT

    out_v = a.vmax * b.vmax // MONT_R + P + 1
    assert out_v <= CAPACITY

    aa, bb = _bc2(a.arr, b.arr)

    # Inside a fused Pallas kernel: straight-line CIOS on registers.
    if _KERNEL_MODE:
        return _mont_mul_inline(aa, bb, out_v)

    # Pallas fast path: VMEM-resident CIOS kernel (TPU, large batches) —
    # bit-identical to the scan below (see kernels/montmul.py).
    from ..kernels import montmul as MK

    if MK.use_pallas(jnp.broadcast_shapes(aa.shape, bb.shape)[1:]):
        return El(MK.montmul_batched(aa, bb), out_v, 1 << LIMB_BITS)

    return El(_mont_mul_scan(aa, bb), out_v, 1 << LIMB_BITS)


# Module-level jit for the same reason as _carry_u_scan: EAGER mont_mul
# calls (stage boundaries, codecs, tests, host-side tooling) would
# otherwise re-trace + re-XLA-compile a fresh scan closure per call —
# each eager call paid a full compile, making eager field code ~100x
# slower than the math itself.
@jax.jit
def _mont_mul_scan(aa: jnp.ndarray, bb: jnp.ndarray) -> jnp.ndarray:
    shape = jnp.broadcast_shapes(aa.shape, bb.shape)
    batch = shape[1:]
    aa = jnp.broadcast_to(aa, shape)
    bb = jnp.broadcast_to(bb, shape)
    p_arr = _bc(P_EL.arr, 1 + len(batch))

    t0 = jnp.zeros((NLIMBS + 1,) + batch, U32)
    zrow = jnp.zeros((1,) + batch, U32)

    def step(t, a_i):
        prod = a_i[None] * bb  # (18, *batch), exact in uint32
        t = t.at[:NLIMBS].add(prod & MASK)
        t = t.at[1 : NLIMBS + 1].add(prod >> LIMB_BITS)
        m_i = (t[0] * PINV0) & MASK  # (*batch,)
        prod2 = m_i[None] * p_arr
        t = t.at[:NLIMBS].add(prod2 & MASK)
        t = t.at[1 : NLIMBS + 1].add(prod2 >> LIMB_BITS)
        carry0 = t[0] >> LIMB_BITS  # t[0] & MASK == 0 by construction
        t = jnp.concatenate([t[1:], zrow], axis=0)
        t = t.at[0].add(carry0)
        return t, None

    t, _ = jax.lax.scan(step, t0, aa)
    return _carry_u(t, NLIMBS, _COL_LIMIT)


def mont_sqr(a: El) -> El:
    return mont_mul(a, a)


# threshold above which tower ops squeeze values back down (see vreduce)
VREDUCE_THRESHOLD = 1 << 261


def vreduce(a: El) -> El:
    """Crush the value bound to ~p without changing the residue.

    mont_mul by the plain constant (R mod p) maps stored value s to
    s * (R mod p) / R ≡ s (mod p), with output bound vmax*p/R + p ≈ p.
    One leaf multiplication; tower ops apply it only when static bounds
    exceed VREDUCE_THRESHOLD (the xi-multiplication inflation points), so
    it costs nothing on the common path.
    """
    return mont_mul(a, R_MOD_P_EL)


def maybe_vreduce(a: El, threshold: int = VREDUCE_THRESHOLD) -> El:
    return vreduce(a) if a.vmax > threshold else a


# ---------------------------------------------------------------------------
# Canonicalisation, comparison, selection
# ---------------------------------------------------------------------------


def cond_sub(a: El, m: int, m_el: El | None = None) -> El:
    """a - m if a >= m else a (m a static int). Requires normalised limbs."""
    a = norm_limbs(a)
    me = m_el if m_el is not None else const_el(m)
    out_v = min(a.vmax, max(m, a.vmax - m))

    if _unroll_carries():
        m_limbs = to_limbs(m, NLIMBS)
        borrow = jnp.zeros(a.arr.shape[1:], U32)
        diffs = []
        for i in range(NLIMBS):
            t = a.arr[i] + U32((1 << LIMB_BITS) + 0) - U32(m_limbs[i]) - borrow
            diffs.append(t & MASK)
            borrow = U32(1) - (t >> LIMB_BITS)
        diff = jnp.stack(diffs, axis=0)
        keep = (borrow != 0)[None]
        return El(jnp.where(keep, a.arr, diff), out_v, 1 << LIMB_BITS)

    ma = jnp.broadcast_to(_bc(me.arr, a.arr.ndim), a.arr.shape)
    return El(_cond_sub_scan(a.arr, ma), out_v, 1 << LIMB_BITS)


@jax.jit  # module-level: eager calls (canon ladders) hit one executable
def _cond_sub_scan(arr: jnp.ndarray, ma: jnp.ndarray) -> jnp.ndarray:
    def step(borrow, pair):
        av, mv = pair
        t = av + U32(1 << LIMB_BITS) - mv - borrow
        return U32(1) - (t >> LIMB_BITS), t & MASK

    borrow, diff = jax.lax.scan(
        step, jnp.zeros(arr.shape[1:], U32), (arr, ma)
    )
    keep = (borrow != 0)[None]  # borrow -> a < m -> keep a
    return jnp.where(keep, arr, diff)


def canon(a: El) -> El:
    """Full reduction to the canonical representative < p.

    Binary conditional-subtract ladder: ceil(log2(vmax/p)) rounds, each
    halving the bound. Boundary-only cost (codecs, comparisons)."""
    a = norm_limbs(a)
    j = 0
    while (P << j) < a.vmax:
        j += 1
    for jj in range(j - 1, -1, -1):
        a = cond_sub(a, P << jj)
    return El(a.arr, P, a.lmax)


def lt_const(a: El, m: int) -> jnp.ndarray:
    """a < m (batch bool)."""
    a = norm_limbs(a)

    if _unroll_carries():
        m_limbs = to_limbs(m, NLIMBS)
        borrow = jnp.zeros(a.arr.shape[1:], U32)
        for i in range(NLIMBS):
            t = a.arr[i] + U32(1 << LIMB_BITS) - U32(m_limbs[i]) - borrow
            borrow = U32(1) - (t >> LIMB_BITS)
        return borrow != 0

    me = jnp.broadcast_to(_bc(const_el(m).arr, a.arr.ndim), a.arr.shape)
    return _lt_scan(a.arr, me)


@jax.jit  # module-level: eager calls hit one cached executable per shape
def _lt_scan(arr: jnp.ndarray, me: jnp.ndarray) -> jnp.ndarray:
    def step(borrow, pair):
        av, mv = pair
        t = av + U32(1 << LIMB_BITS) - mv - borrow
        return U32(1) - (t >> LIMB_BITS), None

    borrow, _ = jax.lax.scan(
        step, jnp.zeros(arr.shape[1:], U32), (arr, me)
    )
    return borrow != 0


def eq(a: El, b: El) -> jnp.ndarray:
    ca, cb = canon(a).arr, canon(b).arr
    ca, cb = _bc2(ca, cb)
    return jnp.all(ca == cb, axis=0)


def is_zero(a: El) -> jnp.ndarray:
    return jnp.all(canon(a).arr == 0, axis=0)


def select(mask: jnp.ndarray, t: El, f: El) -> El:
    ta, fa = _bc2(t.arr, f.arr)
    return El(jnp.where(mask[None], ta, fa), max(t.vmax, f.vmax),
              max(t.lmax, f.lmax))


# ---------------------------------------------------------------------------
# Montgomery domain conversion, powers
# ---------------------------------------------------------------------------


def to_mont(x: El) -> El:
    """Canonical x -> Montgomery form xR mod p (+ small multiple of p)."""
    return mont_mul(x, R2_EL)


def from_mont(a: El) -> El:
    """Montgomery form -> canonical value < p."""
    return canon(mont_mul(a, ONE_EL))


def mont_one(batch_shape=()) -> El:
    if _KERNEL_MODE:
        # Pallas kernel bodies may not capture ARRAY constants; build the
        # constant from per-limb scalar immediates instead.
        arr = jnp.stack(
            [
                jnp.full(tuple(batch_shape), np.uint32(limb), U32)
                for limb in to_limbs(MONT_R_MOD_P, NLIMBS)
            ],
            axis=0,
        )
        return El(arr, MONT_R_MOD_P + 1, 1 << LIMB_BITS)
    arr = jnp.broadcast_to(
        _bc(R_MOD_P_EL.arr, 1 + len(batch_shape)),
        (NLIMBS,) + tuple(batch_shape),
    )
    return El(arr, MONT_R_MOD_P + 1, 1 << LIMB_BITS)


def mont_zero(batch_shape=()) -> El:
    return El(jnp.zeros((NLIMBS,) + tuple(batch_shape), U32), 1, 1 << LIMB_BITS)


def bcast_to(a: El, batch_shape) -> El:
    arr = jnp.broadcast_to(
        _bc(a.arr, 1 + len(batch_shape)), (NLIMBS,) + tuple(batch_shape)
    )
    return El(arr, a.vmax, a.lmax)


def stack(els, axis: int = 1) -> El:
    """Stack elements along a new batch axis (default: first batch dim)."""
    shapes = jnp.broadcast_shapes(*[e.arr.shape for e in els])
    arrs = [jnp.broadcast_to(e.arr, shapes) for e in els]
    return El(
        jnp.stack(arrs, axis=axis),
        max(e.vmax for e in els),
        max(e.lmax for e in els),
    )


def unstack(a: El, n: int, axis: int = 1):
    idx = [slice(None)] * a.arr.ndim
    outs = []
    for i in range(n):
        idx[axis] = i
        outs.append(El(a.arr[tuple(idx)], a.vmax, a.lmax))
    return outs


def elmap(fn, a: El, vmax: int | None = None, lmax: int | None = None) -> El:
    """Apply an array-level transform (reshape/index/broadcast) to an El."""
    return El(fn(a.arr), vmax or a.vmax, lmax or a.lmax)


def pow_fixed(a: El, exponent: int) -> El:
    """a^exponent (Montgomery domain), compile-time exponent.

    TPU fused path: the square-and-multiply chain unrolls into a few
    BIG straight-line Pallas kernels (`_pow_fixed_fused`) — zero-bit
    steps skip their multiply entirely and there is no per-step launch
    or scan overhead. Elsewhere: a `lax.scan` over the exponent's bits
    with a masked multiply (508 leaf muls for a 254-bit exponent vs the
    fused path's ~380).
    """
    if exponent == 0:
        return mont_one(a.batch_shape)
    base = retag(norm_limbs(a), STD_BOUND)
    bits = [int(c) for c in bin(exponent)[2:]]

    if not _KERNEL_MODE and _pow_use_fused(base):
        return _pow_fixed_fused(base, tuple(bits[1:]))

    bits_arr = jnp.array(bits[1:], dtype=jnp.uint32)

    def step(res, bit):
        res = mont_sqr(res)
        res = select(bit != 0, mont_mul(res, base), res)
        return retag(res, STD_BOUND), None

    result, _ = jax.lax.scan(step, base, bits_arr)
    return result


def _pow_use_fused(a: El) -> bool:
    from .. import config as C

    if not (C.DEFAULT.fuse_tower_ops and C.DEFAULT.unroll_static_loops):
        return False
    from ..kernels.fused import fused_supported
    from ..kernels.montmul import use_pallas

    return fused_supported() and use_pallas(a.arr.shape[1:])


# window width for the fused pow chain: 3 bits per launch keeps the two
# SHARED step-kernel bodies tiny (3-4 inline CIOS muls each — traced and
# compiled once, reused by every exponent) while cutting launches ~3x
# and skipping the scan form's masked multiply on zero windows.
_POW_WINDOW = 3


def _pin_std(e: El) -> El:
    return retag(norm_limbs(e), STD_BOUND, 1 << 16)


def _pow_step_mul(acc: El, m: El) -> El:
    """acc^(2^w) * m — one nonzero-window step (straight-line kernel)."""
    for _ in range(_POW_WINDOW):
        acc = mont_sqr(acc)
    return _pin_std(mont_mul(acc, m))


def _pow_step_sq(acc: El) -> El:
    """acc^(2^w) — a zero-window step (straight-line kernel)."""
    for _ in range(_POW_WINDOW):
        acc = mont_sqr(acc)
    return _pin_std(acc)


def _pow_fixed_fused(base: El, bits: tuple) -> El:
    """Windowed square-and-multiply over fused Pallas step kernels.

    The static exponent means the {base^1..base^(2^w-1)} table entry for
    each window is selected in PYTHON — nonzero windows fold their table
    multiply into the same launch as the squarings, zero windows run a
    pure squaring kernel, and both bodies are shared across all
    exponents and call sites (p-2 inversion, (p+1)/4 sqrt).
    """
    from ..kernels import fused as FK

    bits = (1,) + tuple(bits)  # restore the consumed MSB
    w = _POW_WINDOW
    # MSB-first windows; the first (possibly short) window seeds acc.
    lead = len(bits) % w or w
    head = int("".join(map(str, bits[:lead])), 2)
    rest = [
        int("".join(map(str, bits[i : i + w])), 2)
        for i in range(lead, len(bits), w)
    ]

    # table base^k, k = 1..2^w-1 (eager-ish ops inside the outer trace;
    # a handful of leaf muls, amortised over the whole chain)
    table = {1: _pin_std(base)}
    for k in range(2, 1 << w):
        prev = table.get(k - 1)
        if k % 2 == 0:
            table[k] = _pin_std(mont_sqr(table[k // 2]))
        else:
            table[k] = _pin_std(mont_mul(prev, table[1]))

    acc = table[head] if head else mont_one(base.batch_shape)
    for win in rest:
        if win:
            acc = FK.fused_op(_pow_step_mul, "el_pow_step_mul", acc,
                              table[win])
        else:
            acc = FK.fused_op(_pow_step_sq, "el_pow_step_sq", acc)
    return acc


def inv_mod(a: El) -> El:
    """a^{-1} in the Montgomery domain (Fermat)."""
    return pow_fixed(a, P - 2)


def sqrt_candidate(a: El) -> El:
    """a^((p+1)/4) — the square root if a is a QR (p ≡ 3 mod 4)."""
    return pow_fixed(a, (P + 1) // 4)
