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

import jax
import jax.numpy as jnp

__all__ = ["sliced_mm", "sliced_mmT", "sliced_mTm", "slice_operand",
           "slice_scaled", "combine_weights"]

_BITS = 6
_SLICES = 9  # 54 bits >= f64's 53-bit mantissa


def _pow2(e):
    """2^e for integer-valued f64 ``e`` (exact)."""
    return jnp.exp2(e)


def pow2_grid(m):
    """Power-of-two scale s >= m elementwise (0 -> 1), exact grid values.

    Guards the log2 rounding edge: if m still exceeds 2^ceil(log2(m)),
    bump once.  Shared by the operand slicers here and slice_bsr's
    per-column grids (ops/bsr_sliced.py).
    """
    e = jnp.ceil(jnp.log2(jnp.where(m > 0.0, m, 1.0)))
    s = _pow2(e)
    s = jnp.where(m > s, 2.0 * s, s)
    return jnp.where(m > 0.0, s, 1.0)


def _row_scale(x, axis):
    """Per-row power-of-two scale sigma with |x| / sigma <= 1 (0 -> 1)."""
    return pow2_grid(jnp.max(jnp.abs(x), axis=axis, keepdims=True))


def slice_operand(x, axis, n_slices: int = _SLICES, bits: int = _BITS):
    """Split f64 ``x`` into int8 slices on a per-line power-of-two grid.

    ``axis`` is the contraction axis (alignment runs along it).  Returns
    ``(slices, scale)`` with ``slices: (n_slices,) + x.shape`` int8 and
    ``scale`` shaped like ``x`` with the contraction axis reduced (keepdims),
    such that  x ~= scale * sum_i slices[i] * 2^{-bits*(i+1)}  with error
    below ``2^{-bits*n_slices}`` relative to the per-line max.

    All slice values satisfy |q| <= 2^bits (top slice) / 2^{bits-1} + 1
    (the rest), so int8 storage at bits <= 6 is exact.
    """
    x = jnp.asarray(x)
    scale = _row_scale(x, axis)
    if bits >= 7:
        # half grid: |t| <= 0.5 keeps the top slice at |q| <= 2^{bits-1},
        # inside int8 even at bits=7 (a full grid would hit q = 2^7 = 128
        # exactly when a line max is a power of two)
        scale = 2.0 * scale
    t = x / scale  # exact: power-of-two division
    return slice_scaled(t, n_slices=n_slices, bits=bits), scale


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
