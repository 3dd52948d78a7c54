"""Ozaki-style integer-sliced f64 contractions on the int8 MXU.

TPU has no native float64: XLA emulates it in software, and on this library's
Gram-sized contractions the emulation is both slow (~100x the f32 MXU rate)
and, for value-correlated operands, inaccurate (see utils/mm.py).  This
module reaches full f64 *accuracy* at int8-MXU *speed* using the Ozaki
splitting scheme (Ozaki et al., Numer. Algorithms 59, 2012 — the same idea
behind int8/FP16 tensor-core DGEMM): each f64 operand is decomposed into a
short sum of 6-bit integer slices on a per-row (lhs) / per-column (rhs)
power-of-two grid,

    x[m, k] = 2^{e_m} * sum_i  q_i[m, k] * 2^{-6(i+1)},   q_i integer, |q_i| <= 64,

so every slice-pair product q_i @ q_j is a plain int8 x int8 -> int32
matmul whose accumulation is EXACT: |q_i q_j| <= 2^12 and int32 holds sums
of up to 2^18 such terms without rounding (guarded below).  The f64 result
is then the exactly-representable weighted sum of the int32 slice products.
Accuracy is limited only by truncating each operand to ``6 * n_slices``
mantissa bits (54 > the 53 bits of f64 at the default 9 slices); there is no
rounding inside the contraction at all, for any operand correlation.

Slice extraction never touches f64 arithmetic in the hot path: the operand
is split into its exact f32 hi/lo parts and the 6-bit slices are peeled off
with exact f32 multiplies/subtracts (all quantities stay on the common
power-of-two grid, so every step is representable).

Reference mapping: this replaces the dgemm calls of diaglib.f90 (Gram
matrices, Ritz rotations, orthogonalization projections — e.g.
diaglib.f90:1691, 1717-1729, 3543-3544) for float64 on TPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["sliced_mm", "sliced_mmT", "sliced_mTm", "slice_operand",
           "slice_scaled", "combine_weights", "SplitF64", "split_f64"]

_BITS = 6
_SLICES = 9  # 54 bits >= f64's 53-bit mantissa


def _pow2(e):
    """2^e for integer-valued f64 ``e``, EXACT.

    Assembled from the exponent bits: XLA's ``exp2`` is not exact for
    integer arguments on every backend (observed 2^41 * (1 - 2^-49) from
    the CPU lowering), which silently put the "power-of-two" grids off
    grid — harmless for the self-consistent float peel, fatal for the
    integer digit extraction that decodes the grid exponent from the
    scale's bit pattern.

    RANGE LIMIT: the exponent is clamped to the normal-f64 range
    [-1022, 1023], so grids for operands with magnitudes near 2^1022 (or
    pow2_grid's bump-once doubling past 2^1023) saturate at 2^1023
    instead of overflowing to inf; slices of such operands lose the bits
    the clamp cut off.  Operand magnitudes must stay below ~2^1022 for
    the exactness claims to hold (any physical eigenproblem is ~700
    orders of magnitude below this; pow2_grid asserts nothing to keep
    the hot path branch-free).
    """
    ei = jnp.clip(e, -1022.0, 1023.0).astype(jnp.int64)
    return jax.lax.bitcast_convert_type((ei + 1023) << 52, jnp.float64)


def pow2_grid(m):
    """Power-of-two scale s >= m elementwise (0 -> 1), exact grid values.

    Guards the log2 rounding edge: if m still exceeds 2^ceil(log2(m)),
    bump once.  Shared by the operand slicers here and slice_bsr's
    per-column grids (ops/bsr_sliced.py).
    """
    e = jnp.ceil(jnp.log2(jnp.where(m > 0.0, m, 1.0)))
    s = _pow2(e)
    # saturate the bump at the largest f64 power of two instead of
    # overflowing to inf (see the _pow2 range-limit note)
    s = jnp.where((m > s) & (s < 2.0 ** 1023), 2.0 * s, s)
    return jnp.where(m > 0.0, s, 1.0)


def _row_scale(x, axis):
    """Per-row power-of-two scale sigma with |x| / sigma <= 1 (0 -> 1)."""
    return pow2_grid(jnp.max(jnp.abs(x), axis=axis, keepdims=True))


class SplitF64(NamedTuple):
    """Exact (hi, mid, lo) float32 decomposition of a float64 array.

    ``x == hi + mid + lo`` bit-exactly (hi keeps the top 24 mantissa bits,
    mid the next 24, lo the last <= 5 — every difference has <= 29
    significant bits so the casts are exact) while the RESIDUALS stay in
    normal-f32 range, i.e. for 2^-78 <~ |x| < 2^128 (an element's mid/lo
    sit 24/48 bits below it; XLA flushes f32 subnormals to zero).
    Elements below 2^-78 keep only their bits above ~2^-126 ABSOLUTE —
    invisible to the sliced contractions (which truncate 54 bits below
    each line's max: any line with max ~2^-8 or larger cuts at 2^-63,
    far above the loss) and <= 2^-101 absolute for reconstruction.

    Why it exists: on TPU float64 is software-emulated, and the hi/mid/lo
    split is the dominant cost of EVERY sliced f64 contraction (~0.9 ms at
    (176, 65536) on v5e, vs ~0.1 ms for the int8 MXU dot it feeds).
    Solvers split their expansion space ONCE per iteration and pass the
    SplitF64 through mm/mmT/mTm (utils/mm.py), which route it into the
    sliced kernels without ever re-touching emulated f64.  The components
    are UNSCALED; consumers apply their per-line power-of-two grids to the
    components directly (exact f32 multiplies), which preserves the peel
    invariants: after scaling, |mid| <= |t|*2^-24 and |lo| <= |t|*2^-48,
    so the staged peel activation in slice_scaled/_make_peel_kernel holds
    for element-relative splits exactly as for grid-relative ones.
    """

    hi: jax.Array
    mid: jax.Array
    lo: jax.Array

    @property
    def shape(self):
        return self.hi.shape

    @property
    def ndim(self):
        return self.hi.ndim

    @property
    def dtype(self):
        return jnp.dtype(jnp.float64)  # semantic dtype of the represented x

    @property
    def value(self):
        """Reconstruct the float64 array (exact within the range above)."""
        return (self.hi.astype(jnp.float64) + self.mid.astype(jnp.float64)
                + self.lo.astype(jnp.float64))

    def scaled(self, inv):
        """Components multiplied by an exact power-of-two factor ``inv``
        (f64 array broadcastable to shape; cast to f32 per component)."""
        inv32 = jnp.asarray(inv).astype(jnp.float32)
        return self.hi * inv32, self.mid * inv32, self.lo * inv32

    def mask_rows(self, mask):
        """Zero masked rows in every component (exact)."""
        m = mask[:, None]
        return SplitF64(jnp.where(m, self.hi, 0.0),
                        jnp.where(m, self.mid, 0.0),
                        jnp.where(m, self.lo, 0.0))


def split_f64(x) -> SplitF64:
    """Exact float32 triple of float64 ``x`` (see :class:`SplitF64`)."""
    x = jnp.asarray(x, jnp.float64)
    hi = x.astype(jnp.float32)
    d = x - hi.astype(jnp.float64)
    mid = d.astype(jnp.float32)
    lo = (d - mid.astype(jnp.float64)).astype(jnp.float32)
    return SplitF64(hi, mid, lo)


def slice_operand(x, axis, n_slices: int = _SLICES, bits: int = _BITS):
    """Split f64 ``x`` into int8 slices on a per-line power-of-two grid.

    ``axis`` is the contraction axis (alignment runs along it).  Returns
    ``(slices, scale)`` with ``slices: (n_slices,) + x.shape`` int8 and
    ``scale`` shaped like ``x`` with the contraction axis reduced (keepdims),
    such that  x ~= scale * sum_i slices[i] * 2^{-bits*(i+1)}  with error
    below ``2^{-bits*n_slices}`` relative to the per-line max.

    All slice values satisfy |q| <= 2^bits (top slice) / 2^{bits-1} + 1
    (the rest), so int8 storage at bits <= 6 is exact.

    On TPU, 2-D row-aligned operands (``axis=-1``, lane dim a multiple of
    the peel tile) run the peel chain as a one-pass Pallas kernel — the
    XLA expression materializes every intermediate remainder and costs
    more than the MXU dot it feeds (measured 2.5 ms at (165, 65536)).
    """
    import jax
    import os

    if isinstance(x, SplitF64):
        # pre-split operand: the scale comes from |hi| (within one ulp of
        # max|x|, which at worst costs the top digit one unit of headroom
        # — round(2^{bits-1}*(1+2^-24)) == 2^{bits-1}, still int8-exact)
        # and the grid is applied to the components directly (exact
        # power-of-two f32 multiplies) — no emulated-f64 pass anywhere.
        scale = pow2_grid(jnp.max(jnp.abs(x.hi), axis=axis,
                                  keepdims=True).astype(jnp.float64))
        if bits >= 7:
            scale = 2.0 * scale
        comps = x.scaled(1.0 / scale)
        ax = axis % x.ndim
        if (x.ndim == 2 and ax == 1 and jax.default_backend() == "tpu"
                and os.environ.get("DIAGLIB_TPU_PEEL", "auto") != "never"
                and _peel_tile_for(x.shape[0], x.shape[1], n_slices)):
            return _peel_rows_pallas(comps, n_slices, bits), scale
        return (slice_scaled_components(*comps, n_slices=n_slices,
                                        bits=bits), scale)

    x = jnp.asarray(x)
    scale = _row_scale(x, axis)
    if bits >= 7:
        # half grid: |t| <= 0.5 keeps the top slice at |q| <= 2^{bits-1},
        # inside int8 even at bits=7 (a full grid would hit q = 2^7 = 128
        # exactly when a line max is a power of two)
        scale = 2.0 * scale
    t = x / scale  # exact: power-of-two division
    ax = axis % x.ndim
    if (x.ndim == 2 and ax == 1 and jax.default_backend() == "tpu"
            and os.environ.get("DIAGLIB_TPU_PEEL", "auto") != "never"
            and _peel_tile_for(x.shape[0], x.shape[1], n_slices)):
        return _peel_rows_pallas(t, n_slices, bits), scale
    return slice_scaled(t, n_slices=n_slices, bits=bits), scale


_PEEL_TILE = 2048


def _peel_tile_for(k: int, n: int, n_slices: int):
    """Largest lane tile (<= _PEEL_TILE, divides n) whose double-buffered
    peel working set fits the default 16 MB scoped VMEM; None if none."""
    for tile in (2048, 1024, 512, 256):
        if n % tile:
            continue
        # out tile int8 + 3 f32 inputs, double-buffered
        if 2 * tile * k * (n_slices + 12) <= 12 * 1024 * 1024:
            return tile
    return None


def _peel_rows_pallas(t, n_slices: int, bits: int, interpret: bool = False):
    """(n_slices, k, n) int8 slices of pre-scaled 2-D ``t`` via one Pallas
    pass (bit-identical to :func:`slice_scaled`).  ``t`` may be a
    (hi, mid, lo) f32 component tuple (already scaled), skipping the
    emulated-f64 split entirely."""
    from jax.experimental import pallas as pl

    if isinstance(t, tuple):
        hi, mid, lo = t
        k, n = hi.shape
    else:
        k, n = t.shape
        hi = t.astype(jnp.float32)
        if t.dtype == jnp.float64:
            # emulated-f64 passes dominate — compute the second difference
            # from the first, not from t twice
            d = t - hi.astype(jnp.float64)
            mid = d.astype(jnp.float32)
            lo = (d - mid.astype(jnp.float64)).astype(jnp.float32)
        else:
            mid = jnp.zeros_like(hi)
            lo = jnp.zeros_like(hi)
    tile = _peel_tile_for(k, n, n_slices) or _PEEL_TILE
    out = pl.pallas_call(
        _make_peel_kernel(n_slices, k, bits),
        grid=(n // tile,),
        in_specs=[pl.BlockSpec((k, tile),
                               lambda i: (i * 0, i))] * 3,
        out_specs=pl.BlockSpec((n_slices * k, tile),
                               lambda i: (i * 0, i)),
        out_shape=jax.ShapeDtypeStruct((n_slices * k, n), jnp.int8),
        interpret=interpret,
    )(hi, mid, lo)
    return out.reshape(n_slices, k, n)


def _make_peel_kernel(nx: int, k: int, bits: int):
    """Kernel: the slice_scaled peel chain on (hi, mid, lo) f32 components,
    entirely in registers (see slice_scaled for the split thresholds)."""
    import numpy as np

    def kern(hi_ref, mid_ref, lo_ref, o_ref):
        rem_hi = hi_ref[:, :]
        rem_mid = mid_ref[:, :]
        rem_lo = lo_ref[:, :]
        for i in range(nx):
            w = np.float32(2.0 ** (-bits * (i + 1)))
            inv = np.float32(2.0 ** (bits * (i + 1)))
            q = jnp.round(rem_hi * inv)
            rem_hi = rem_hi - q * w
            if bits * (i + 1) >= 24:
                q2 = jnp.round(rem_mid * inv)
                rem_mid = rem_mid - q2 * w
                q = q + q2
            if bits * (i + 1) >= 48:
                q3 = jnp.round(rem_lo * inv)
                rem_lo = rem_lo - q3 * w
                q = q + q3
            o_ref[i * k:(i + 1) * k, :] = q.astype(jnp.int8)

    return kern


def slice_scaled(t, n_slices: int = _SLICES, bits: int = _BITS):
    """int8 slices of pre-scaled ``t`` with |t| <= 1 (see slice_operand)."""
    # exact three-way f32 split of the 53-bit mantissa: hi keeps the top 24
    # bits, mid the next 24, lo the last 5 (each difference below has <= 29
    # significant bits, so the f64 subtractions and f32 casts are exact)
    hi = t.astype(jnp.float32)
    if t.dtype == jnp.float64:
        mid = (t - hi.astype(jnp.float64)).astype(jnp.float32)
        lo = (t - hi.astype(jnp.float64) - mid.astype(jnp.float64)).astype(
            jnp.float32)
    else:
        mid = jnp.zeros_like(hi)
        lo = jnp.zeros_like(hi)
    return slice_scaled_components(hi, mid, lo, n_slices=n_slices, bits=bits)


def slice_scaled_components(hi, mid, lo, n_slices: int = _SLICES,
                            bits: int = _BITS):
    """The peel chain of :func:`slice_scaled` on pre-split f32 components
    (the XLA twin of the Pallas kernel's component path).  The staged
    activation below is valid for element-relative splits too: scaled
    components of a :class:`SplitF64` satisfy |mid| <= |t|*2^-24 and
    |lo| <= |t|*2^-48 with |t| <= 1."""

    def peel(rem, level):
        # rem sits on the power-of-two grid; the scale and round are exact
        # f32 ops and the remainder is exact by Sterbenz subtraction
        # (|q*w| is within 2x of rem whenever q != 0)
        w = jnp.float32(2.0 ** (-bits * (level + 1)))
        q = jnp.round(rem * (1.0 / w))
        return rem - q * w, q

    slices = []
    rem_hi, rem_mid, rem_lo = hi, mid, lo
    for i in range(n_slices):
        rem_hi, q = peel(rem_hi, i)
        # |mid| <= 2^-24 rounds to zero while the slice weight w satisfies
        # |mid| < w/2, i.e. while bits*(i+1) < 23 — peel from there on
        # (bits=6: slice 3; bits=7: slice 3); same for |lo| <= 2^-48
        if bits * (i + 1) >= 24:
            rem_mid, q2 = peel(rem_mid, i)
            q = q + q2
        if bits * (i + 1) >= 48:
            rem_lo, q3 = peel(rem_lo, i)
            q = q + q3
        slices.append(q.astype(jnp.int8))
    return jnp.stack(slices)


def combine_weights(n_levels: int, bits: int = _BITS, dtype=jnp.float64):
    """(n_levels,) weights 2^{-bits*(L+2)} for level-summed slice products."""
    return jnp.asarray(
        [2.0 ** (-bits * (lev + 2)) for lev in range(n_levels)], dtype)


def _slice_pair_products(xs, as_):
    """All-pairs int32 products: (ns1*M, K) x (K, ns2*N) in one MXU dot.

    xs: (ns1, M, K) int8;  as_: (ns2, K, N) int8.
    Returns (ns1, M, ns2, N) int32.
    """
    ns1, mdim, k = xs.shape
    ns2, k2, ndim = as_.shape
    assert k == k2
    lhs = xs.reshape(ns1 * mdim, k)
    out = jax.lax.dot_general(
        lhs, as_,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (ns1*M, ns2, N)
    return out.reshape(ns1, mdim, ns2, ndim)


def _combine(prods, sx, sa, bits: int, k: int):
    """f64 result from int32 slice products.

    prods: (ns1, M, ns2, N) int32; sx: (M, 1) scales; sa: (1, N) scales;
    k: contraction length (bounds each pair product for the int32 headroom
    check below).  int32 -> f64 conversion is exact and the weights are
    powers of two, so the only rounding is the final f64 summation ordered
    from the smallest diagonal up (~couple of ulps).
    """
    ns1 = prods.shape[0]
    ns2 = prods.shape[2]
    headroom = 31 - ((2 * bits + 2) + max(1, k).bit_length())

    # fold same-level pair products first: int32 when the level sum provably
    # fits (few f64 ops on wide outputs — the f64 work drops from ns1*ns2 to
    # ns1+ns2 axpys), f64 otherwise (still exact: int32 -> f64 is exact and
    # f64 addition of values < 2^53 cannot round here)
    def level_sum(pairs, exact_i32):
        acc = None
        for p in pairs:
            p = p if exact_i32 else p.astype(jnp.float64)
            acc = p if acc is None else acc + p
        return acc.astype(jnp.float64) if exact_i32 else acc

    total = jnp.zeros(prods.shape[1:2] + prods.shape[3:], jnp.float64)
    # deepest diagonals first so small terms accumulate before large ones
    for lev in range(ns1 + ns2 - 2, -1, -1):
        pairs = [prods[i, :, lev - i, :]
                 for i in range(ns1) if 0 <= lev - i < ns2]
        exact_i32 = headroom >= (len(pairs) - 1).bit_length()
        w = 2.0 ** (-bits * (lev + 2))
        total = total + level_sum(pairs, exact_i32) * w
    return total * sx * sa


def fits_exact(k: int, bits: int = _BITS) -> bool:
    """True iff a length-k contraction of ``bits``-bit slice products
    accumulates exactly in int32 (products < 2^{2*bits+2}, k of them must
    stay below 2^31)."""
    return (2 * bits + 2) + max(1, k).bit_length() <= 31


def _check_exact(k: int, bits: int):
    if not fits_exact(k, bits):
        raise ValueError(
            f"contraction length {k} overflows exact int32 accumulation "
            f"at {bits}-bit slices")


@functools.partial(jax.jit, static_argnames=("n_slices", "bits"))
def sliced_mm(a, b, n_slices: int = _SLICES, bits: int = _BITS):
    """f64 ``a @ b`` via exact integer slices (contract a's last axis)."""
    _check_exact(a.shape[-1], bits)
    xs, sx = slice_operand(a, axis=-1, n_slices=n_slices, bits=bits)
    bs, sb = slice_operand(b, axis=0, n_slices=n_slices, bits=bits)
    prods = _slice_pair_products(xs, bs)
    return _combine(prods, sx, sb, bits, a.shape[-1])


@functools.partial(jax.jit, static_argnames=("n_slices", "bits"))
def sliced_mmT(a, b, n_slices: int = _SLICES, bits: int = _BITS):
    """f64 ``a @ b.T`` (Gram layout; contracts the last axes)."""
    _check_exact(a.shape[-1], bits)
    xs, sx = slice_operand(a, axis=-1, n_slices=n_slices, bits=bits)
    bs, sb = slice_operand(b, axis=-1, n_slices=n_slices, bits=bits)
    # rhs (ns2, N, K) -> (ns2, K, N)
    prods = _slice_pair_products(xs, bs.transpose(0, 2, 1))
    return _combine(prods, sx, sb.T, bits, a.shape[-1])


@functools.partial(jax.jit, static_argnames=("n_slices", "bits"))
def sliced_mTm(a, b, n_slices: int = _SLICES, bits: int = _BITS):
    """f64 ``a.T @ b`` (contracts the first axes)."""
    _check_exact(a.shape[0], bits)
    xs, sx = slice_operand(a, axis=0, n_slices=n_slices, bits=bits)
    bs, sb = slice_operand(b, axis=0, n_slices=n_slices, bits=bits)
    # lhs (ns1, K, M) -> (ns1, M, K)
    prods = _slice_pair_products(xs.transpose(0, 2, 1), bs)
    return _combine(prods, sx.T, sb, bits, a.shape[0])


# ---------------------------------------------------------------------------
# wide-output small-K contraction (solver "rotation" products)
# ---------------------------------------------------------------------------

_WIDE_BITS = 7  # half grid (|q| <= 64); see slice_operand


def _wide_kernel(ns_a: int, ns_b: int, nlev: int, m: int, kdim: int,
                 bits: int):
    """Per n-tile: peel b's slice planes in registers, dot each against
    the resident a-slices, fold into per-level accumulators, and combine
    the levels into an EXACT triple-float32 output in the same step.

    The in-kernel combine replaces the former (nlev*m, n) int32 output:
    large Pallas outputs are prime targets for XLA's VMEM memory-space
    assignment, whose oversubscription crashes the v5e runtime
    (utils/compile.py) — and the (3*m, n) f32 triple is 3x smaller and
    saves the XLA-side combine pass entirely.  Exactness of the combine:
    each int32 level value splits as (v & ~0xfff) + (v & 0xfff); both
    halves convert to f32 exactly (<= 19 and <= 12 significant bits) and
    their power-of-two weighting is exact, so the only rounding is the
    third component of the TwoSum cascade (relative error ~2^-68, beyond
    f64).  Deepest levels are added first, mirroring _combine.
    """
    import numpy as np

    def kern(a_ref, hi_ref, mid_ref, lo_ref, o_ref):
        a_sl = a_ref[:, :]                                  # (ns_a*m, K)
        rem_hi = hi_ref[:, :]
        rem_mid = mid_ref[:, :]
        rem_lo = lo_ref[:, :]
        lv = [None] * nlev                                  # int32 levels
        for p in range(ns_b):
            w = np.float32(2.0 ** (-bits * (p + 1)))
            inv = np.float32(2.0 ** (bits * (p + 1)))
            q = jnp.round(rem_hi * inv)
            rem_hi = rem_hi - q * w
            if bits * (p + 1) >= 24:
                q2 = jnp.round(rem_mid * inv)
                rem_mid = rem_mid - q2 * w
                q = q + q2
            if bits * (p + 1) >= 48:
                q3 = jnp.round(rem_lo * inv)
                rem_lo = rem_lo - q3 * w
                q = q + q3
            plane = q.astype(jnp.int8)                      # (K, TN)
            prod = jax.lax.dot_general(
                a_sl, plane, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)           # (ns_a*m, TN)
            for i in range(ns_a):
                lev = i + p
                if lev >= nlev:
                    continue
                piece = prod[i * m:(i + 1) * m, :]
                lv[lev] = piece if lv[lev] is None else lv[lev] + piece

        def two_sum(s, t):
            # Knuth 2Sum: exact in IEEE f32, branch-free
            x = s + t
            bb = x - s
            err = (s - (x - bb)) + (t - bb)
            return x, err

        zero = jnp.zeros((m, o_ref.shape[1]), jnp.float32)
        s_hi, s_mid, s_lo = zero, zero, zero
        for lev in range(nlev - 1, -1, -1):                 # deepest first
            w = np.float32(2.0 ** (-bits * (lev + 2)))
            v = lv[lev]
            vh = jax.lax.shift_left(
                jax.lax.shift_right_arithmetic(v, jnp.int32(12)),
                jnp.int32(12))
            for part in (vh, v - vh):
                t = part.astype(jnp.float32) * w            # exact
                s_hi, e = two_sum(s_hi, t)
                s_mid, e2 = two_sum(s_mid, e)
                s_lo = s_lo + e2
        o_ref[0:m, :] = s_hi
        o_ref[m:2 * m, :] = s_mid
        o_ref[2 * m:3 * m, :] = s_lo

    return kern


def _wide_tile(m: int, kdim: int, n: int, n_slices: int):
    """Largest feasible lane tile for the wide kernel, or None.

    Lane-tile working set (bytes per lane), measured against the 16 MB
    scoped VMEM stack (the compiler reported 18.06M at tile=2048,
    K=168, m=15 with the old 12*kdim+4*nlev*m model):
      3 f32 input panels double-buffered        24*kdim
      in-kernel peel remainders (3 f32 copies)  12*kdim
      int32 level accumulators                   4*nlev*m
      dot products in flight (2x int32)          8*ns*m
      triple-f32 combine temps + out (2x)       ~40*m
    """
    nlev = min(2 * n_slices - 1, 9)
    per_lane = 36 * kdim + 4 * nlev * m + 8 * n_slices * m + 40 * m
    for cand in (2048, 1024, 512, 256):
        if n % cand == 0 and cand * per_lane <= 14 * 1024 * 1024:
            return cand
    return None


def wide_feasible(m: int, kdim: int, n: int, n_slices: int = 8,
                  bits: int = _WIDE_BITS) -> bool:
    """True iff :func:`sliced_wide_mm` can run ``(m, kdim) @ (kdim, n)``:
    the exact-int32 budget holds AND a lane tile fits the VMEM stack.
    Routing (utils/mm.py) must consult this instead of letting the kernel
    raise at trace time (round-3 advisor finding: K >~ 1450 has no
    feasible tile at the minimum 256-lane candidate)."""
    kp = kdim + ((-kdim) % 8)
    if kp * (1 << (2 * (bits - 1) + 1)) > (1 << 31):
        return False
    return _wide_tile(m, kp, n, n_slices) is not None


def sliced_wide_mm(a, b, n_slices: int = 8, bits: int = _WIDE_BITS,
                   interpret: bool = False):
    """Exact f64 ``a @ b`` for SMALL-K, WIDE-output contractions.

    ``a: (m, K)`` small (a reduced eigenvector block, an overlap), ``b:
    (K, n)`` wide (the solver's expansion space) — the Ritz-rotation /
    projection shape.  The emulated-f64 matmul costs ~7 ms at
    (15, 165) x (165, 65536) on v5e; here both operands are 7-bit integer
    slices (b peeled in registers, per n-tile, never materialized) and the
    contraction runs on the int8 MXU with exact int32 level accumulation —
    same scheme as ops/bsr_sliced.py.  Accuracy: operands truncated at
    2^-55 below the per-row(a) / per-column(b) scales; no rounding inside
    the contraction.
    """
    m, kdim = a.shape
    k2, n = b.shape
    assert kdim == k2
    # 2*(bits-1)+1 bits per product: carry-overlap levels exceed the
    # nominal 2^{bits-1} per-operand magnitude by ~1.3x (advisor r3)
    if kdim * (1 << (2 * (bits - 1) + 1)) > (1 << 31):
        raise ValueError(f"K={kdim} overflows exact int32 accumulation")
    ns = n_slices
    nlev = min(2 * ns - 1, 9)
    presplit = isinstance(b, SplitF64)
    # pad K to a sublane multiple so Pallas edge tiles are never garbage
    kpad = (-kdim) % 8
    if kpad:
        a = jnp.pad(a, ((0, 0), (0, kpad)))
        if presplit:
            b = SplitF64(*(jnp.pad(c, ((0, kpad), (0, 0))) for c in b))
        else:
            b = jnp.pad(b, ((0, kpad), (0, 0)))
        kdim += kpad

    a_sl, sa = slice_operand(a, axis=-1, n_slices=ns, bits=bits)
    a_sl = a_sl.reshape(ns * m, kdim)
    if presplit:
        # scale from |hi| (within one ulp of max|b| — the top in-kernel
        # peel digit keeps |q| <= 2^{bits-1}, see slice_operand) applied to
        # the components directly: no emulated-f64 split pass
        sb = 2.0 * pow2_grid(jnp.max(jnp.abs(b.hi), axis=0,
                                     keepdims=True).astype(jnp.float64))
        hi, mid, lo = b.scaled(1.0 / sb)
    else:
        sb = 2.0 * pow2_grid(jnp.max(jnp.abs(b), axis=0, keepdims=True))
        t = b * (1.0 / sb)
        hi = t.astype(jnp.float32)
        d = t - hi.astype(jnp.float64)
        mid = d.astype(jnp.float32)
        lo = (d - mid.astype(jnp.float64)).astype(jnp.float32)

    tile = _wide_tile(m, kdim, n, ns)
    if tile is None:
        raise ValueError(f"no valid lane tile for K={kdim}, n={n}")
    from jax.experimental import pallas as pl

    p = pl.pallas_call(
        _wide_kernel(ns, ns, nlev, m, kdim, bits),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((ns * m, kdim), lambda j: (j * 0, j * 0)),
            pl.BlockSpec((kdim, tile), lambda j: (j * 0, j)),
            pl.BlockSpec((kdim, tile), lambda j: (j * 0, j)),
            pl.BlockSpec((kdim, tile), lambda j: (j * 0, j)),
        ],
        out_specs=pl.BlockSpec((3 * m, tile), lambda j: (j * 0, j)),
        out_shape=jax.ShapeDtypeStruct((3 * m, n), jnp.float32),
        interpret=interpret,
    )(a_sl, hi, mid, lo)

    y = (p[0:m].astype(jnp.float64) + p[m:2 * m].astype(jnp.float64)
         + p[2 * m:3 * m].astype(jnp.float64))
    return y * sa * sb
