"""Integer-sliced BSR operator: f64-accurate SpMM on the int8 MXU.

The flagship matvec problem for float64 operators on TPU is twofold:

* XLA's software-emulated f64 matmul path is ~10-40x slower than the MXU;
* the mixed-precision ladder (solvers/mixed.py) otherwise needs TWO copies
  of the operator (f64 + f32 — 6 GB at the flagship 503M-nnz config), and
  scaling any dimension doubles against the 16 GB HBM of a v5e chip fast.

This module stores the operator ONCE as Ozaki-style 7-bit integer slices
(see ops/slicing.py for the scheme and its exactness argument): ``na``
int8 slice planes on a per-(block-row, output-column) half power-of-two
grid — 3.8 GB for the flagship operator at the default na=8, serving BOTH
precision tiers of the ladder from one Pallas kernel:

* ``matvec`` (f64): x is sliced into ``nx`` (default 8) planes, and each
  block entry contributes a single (nx*k, B) x (B, na*B) int8 MXU matmul
  — at the solver block k=16 the lhs is exactly one 128-row MXU tile.
  All slice-pair products land in int32 exactly (|q| <= 2^6 on the half
  grid, B <= 512, blocks/row bounded — guarded in the builder); pairs are
  folded into per-level int32 accumulators in-kernel, and the level sums
  are combined into f64 outside (int32 -> f64 is exact, weights are
  powers of two).  Result accuracy matches a true f64 SpMM (~1e-16
  relative: 7*8-1 = 55 stored mantissa bits below each output column's
  scale).
* ``matvec_f32``: same kernel shape with nx=4 top x-slices and the top
  na<=4 A-slice planes (a contiguous prefix of the slice array — no data
  movement), combined in f32.  Accuracy ~2^-20 relative — orders of
  magnitude better than a plain f32 SpMM at the same speed (BASELINE.md).

Reference mapping: the user-side ``matvec`` callback contract is
README.md:30-44 / diaglib.f90:62-72; this operator is the TPU-native
high-performance instantiation of it (the reference never materializes
the matrix; here the matrix lives only as integer slices).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bsr import BSRMatrix
from .slicing import combine_weights, pow2_grid, slice_scaled

__all__ = ["SlicedBSR", "slice_bsr", "sliced_bsr_matvec"]

# 7-bit slices on a HALF power-of-two grid (|t| <= 0.5 keeps every slice at
# |q| <= 64, inside int8): 8 planes cover 7*8-1 = 55 >= 54 mantissa bits,
# one plane fewer than the 6-bit scheme (11% less slice-store bandwidth),
# and the f64 tier's x side needs nx = 8 slices so the MXU sees exactly
# nx*k = 128 lhs rows at the solver block k = 16 — one full row tile
# instead of 144 rows padded to 256 (~44% wasted MXU issue).
_BITS = 7


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SlicedBSR:
    """BSR operator stored as int8 Ozaki slices.

    slices:    (nnzb, B, na*B) int8 — entry e holds, side by side, the na
               slice planes of T_e = A(r_e, c_e)^T (pre-transposed so the
               kernel computes x_blk @ T_e).  Plane i occupies columns
               [i*B, (i+1)*B) — a *contiguous prefix* of planes is a
               lower-precision operator.
    col_scale: (n,) f64 power-of-two grid scale per output column
               (shared by all entries of a block row — required for exact
               cross-entry accumulation).
    diagonal:  (n,) f64 main diagonal of the original operator (for
               mprec-style preconditioners; extracted before slicing).
    rows/cols/row_start: as in BSRMatrix.
    """

    slices: jax.Array
    col_scale: jax.Array
    diagonal: jax.Array
    rows: jax.Array
    cols: jax.Array
    row_start: jax.Array
    n: int = dataclasses.field(metadata=dict(static=True))
    block: int = dataclasses.field(metadata=dict(static=True))
    na: int = dataclasses.field(metadata=dict(static=True))
    max_bpr: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def nnzb(self) -> int:
        return self.slices.shape[0]

    @property
    def nnz(self) -> int:
        return self.nnzb * self.block * self.block


def slice_bsr(m: BSRMatrix, na: int | None = None,
              chunk: int = 256) -> SlicedBSR:
    """Build the sliced operator from a BSRMatrix (f32 or f64 blocks).

    na defaults to 9 (54 bits): slice planes live on a grid aligned to the
    per-(block-row, column) max, so entries whose own magnitude sits far
    below that max need the deep planes to keep their full mantissa — even
    for f32 source data.  (The f64 source mantissa itself is truncated
    below 2^-54 of the per-column max, like rounding the operator once.)
    The block data is processed in chunks of entries so peak temporary
    memory stays bounded.
    """
    if na is None:
        na = 8
    B = m.block
    nbr = m.n // B
    # int32 exactness guard for the DEFAULT tiers (nx <= 8; see also the
    # per-call guard in sliced_bsr_matvec for explicit nx): per-level
    # products |q_x q_a| summed over B * blocks_per_row * n_level_pairs
    # terms must stay below 2^31.  Budget 2*(_BITS-1)+1 bits per product:
    # at carry-overlap levels the combined slice magnitude can exceed the
    # nominal 2^{_BITS-1} by up to ~1.3x per operand (measured <= ~80 at
    # _BITS=7), so the nominal 2*(_BITS-1) product budget is ~1.5x short.
    max_bpr = int(jnp.max(jnp.bincount(m.rows, length=nbr)))
    import math
    if (2 * (_BITS - 1) + 1
            + math.ceil(math.log2(B * max_bpr * min(na, 8)))) > 31:
        raise ValueError(
            f"block {B} x {max_bpr}/row overflows exact int32 accumulation")

    # per-(block-row, column) HALF power-of-two scale over all entries of
    # the row (see _BITS note: |t| <= 0.5 keeps slices inside int8)
    absmax = jnp.max(jnp.abs(m.blocks_t), axis=1)          # (nnzb, B)
    colmax = jnp.zeros((nbr, B), m.blocks_t.dtype).at[m.rows].max(absmax)
    col_scale = 2.0 * pow2_grid(colmax.astype(jnp.float64))  # (nbr, B)

    @jax.jit
    def build(blocks_t, rows, col_scale):
        nnzb = blocks_t.shape[0]
        nchunk = -(-nnzb // chunk)
        pad = nchunk * chunk - nnzb
        bt = jnp.pad(blocks_t, ((0, pad), (0, 0), (0, 0)))
        rr = jnp.pad(rows, (0, pad))

        def body(_, ch):
            blk, r = ch
            t = blk.astype(jnp.float64) / col_scale[r][:, None, :]
            sl = slice_scaled(t, n_slices=na, bits=_BITS)   # (na, c, B, B)
            return None, jnp.concatenate(list(sl), axis=-1)  # (c, B, na*B)

        _, out = jax.lax.scan(
            body, None,
            (bt.reshape(nchunk, chunk, B, B), rr.reshape(nchunk, chunk)))
        return out.reshape(nchunk * chunk, B, na * B)[:nnzb]

    # diagonal before slicing (exact from the original data)
    from .bsr import bsr_diagonal
    diagonal = bsr_diagonal(m).astype(jnp.float64)

    return SlicedBSR(
        slices=build(m.blocks_t, m.rows, col_scale),
        col_scale=col_scale.reshape(-1),
        diagonal=diagonal,
        rows=m.rows, cols=m.cols, row_start=m.row_start,
        n=m.n, block=B, na=na, max_bpr=max_bpr,
    )


def _sliced_kernel(nx: int, na: int, nlev: int, k: int, B: int,
                   blocked_x: bool = False):
    """Kernel: per entry, one (nx*k, B) x (B, na*B) int8 dot, folded into
    per-level int32 accumulators (exact; see module docstring).

    ``blocked_x`` selects the x delivery: False keeps the whole (nx*k, n)
    slice array VMEM-resident (fastest; x is fetched once per matvec),
    True receives only the entry's (nx*k, B) column block from the
    BlockSpec pipeline (slower — x re-streams per entry — but VMEM use is
    O(k*B), so arbitrarily large n*k configurations run)."""

    def kern(rows_ref, cols_ref, first_ref, xs_ref, blk_ref, o_ref):
        g = pl.program_id(0)

        @pl.when(first_ref[g] == 1)
        def _():
            o_ref[:, :] = jnp.zeros_like(o_ref)

        if blocked_x:
            xb = xs_ref[:, :]                                # (nx*k, B)
        else:
            c = cols_ref[g]
            xb = xs_ref[:, pl.ds(pl.multiple_of(c * B, B), B)]
        prod = jax.lax.dot_general(
            xb, blk_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)                # (nx*k, na*B)
        # banded fold: level lev collects pair (j, i = lev - j); for plane
        # i the contributing x-slices are a contiguous row band, so one
        # shifted block add per plane replaces the per-pair extraction
        for i in range(na):
            nxi = min(nx, nlev - i)
            if nxi <= 0:
                continue
            o_ref[i * k:(i + nxi) * k, :] += (
                prod[0:nxi * k, i * B:(i + 1) * B])

    return kern


# VMEM budget for the resident-x fast path: the x-slice array plus the
# double-buffered slice blocks and the output tile must fit on chip
# (~128 MB on v5e); beyond this the kernel switches to per-column-block x
# delivery, which runs at any size.
_VMEM_BUDGET = 100 * 1024 * 1024


def _sliced_kernel_resident(nx: int, na: int, nlev: int, k: int, B: int,
                            pack: int):
    """Resident-accumulator variant of _sliced_kernel, ``pack`` entries
    per grid step (round 4, mirroring bsr_sliced_sym): the whole
    (nlev*k, n) int32 level accumulator stays in VMEM for the entire grid
    (zeroed once), removing the per-row output-tile writebacks AND
    amortizing the ~3-4 us fixed cost per grid step that dominated the
    revisit-tile kernel (measured 66.8 Gnnz/s f64 where the bytes alone
    allow ~200).  Entries need no row sorting here; padding entries are
    zero blocks folded into row 0 (exact zeros)."""

    def kern(rows_ref, cols_ref, xs_ref, blk_ref, acc_ref):
        e = pl.program_id(0)

        @pl.when(e == 0)
        def _():
            acc_ref[:, :] = jnp.zeros_like(acc_ref)

        for p in range(pack):
            r = rows_ref[e * pack + p]
            c = cols_ref[e * pack + p]
            xb = xs_ref[:, pl.ds(pl.multiple_of(c * B, B), B)]
            prod = jax.lax.dot_general(
                xb, blk_ref[p], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)            # (nx*k, na*B)
            for i in range(na):
                nxi = min(nx, nlev - i)
                if nxi <= 0:
                    continue
                acc_ref[i * k:(i + nxi) * k,
                        pl.ds(pl.multiple_of(r * B, B), B)] += (
                    prod[0:nxi * k, i * B:(i + 1) * B])

    return kern


@functools.partial(jax.jit, static_argnames=("nx", "nlev", "na_used",
                                             "interpret"))
def _sliced_spmm(m: SlicedBSR, x, nx: int, nlev: int, na_used: int,
                 interpret: bool = False):
    """Level sums P: (nlev*k, n) int32 plus x scales; see callers."""
    import os

    k, n = x.shape
    B = m.block
    na = na_used
    xs, sx = _slice_x(x, nx)                                  # (nx*k, n) int8

    # resident-accumulator fast path (see _sliced_kernel_resident): used
    # whenever the full level accumulator fits next to the x slices
    pack = min(8, max(1, 16 // na))
    resident_acc = (nlev * k * n * 4 + nx * k * n
                    + 2 * pack * B * na * B)
    if (resident_acc <= _VMEM_BUDGET + 28 * 1024 * 1024
            and os.environ.get("DIAGLIB_TPU_RESIDENT", "auto") != "never"):
        pad_e = (-m.nnzb) % pack
        rows_p = jnp.pad(m.rows, (0, pad_e))
        cols_p = jnp.pad(m.cols, (0, pad_e))
        slices_p = (jnp.pad(m.slices, ((0, pad_e), (0, 0), (0, 0)))
                    if pad_e else m.slices)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=((m.nnzb + pad_e) // pack,),
            in_specs=[
                pl.BlockSpec((nx * k, n),
                             lambda e, rows, cols: (e * 0, e * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pack, B, na * B),
                             lambda e, rows, cols: (e, e * 0, e * 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nlev * k, n),
                                   lambda e, rows, cols: (e * 0, e * 0),
                                   memory_space=pltpu.VMEM),
        )
        p = pl.pallas_call(
            _sliced_kernel_resident(nx, na, nlev, k, B, pack),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nlev * k, n), jnp.int32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=resident_acc + 8 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * m.nnzb * nx * k * B * na * B,
                bytes_accessed=m.nnzb * B * na * B + nlev * k * m.n * 4,
                transcendentals=0,
            ),
        )(rows_p, cols_p, xs, slices_p)
        return p, sx

    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (m.rows[1:] != m.rows[:-1]).astype(jnp.int32)])

    resident_bytes = (nx * k * n                 # x slices (int8)
                      + 2 * B * na * B           # double-buffered slice block
                      + 2 * nlev * k * B * 4)    # output tiles (int32)
    blocked_x = resident_bytes > _VMEM_BUDGET
    if blocked_x:
        x_spec = pl.BlockSpec((nx * k, B),
                              lambda e, rows, cols, first: (e * 0, cols[e]),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((nx * k, n),
                              lambda e, rows, cols, first: (e * 0, e * 0),
                              memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(m.nnzb,),
        in_specs=[
            x_spec,
            # block narrower than the array: a lower tier reads only the
            # leading na*B slice-plane columns, with no data movement
            pl.BlockSpec((1, B, na * B),
                         lambda e, rows, cols, first: (e, e * 0, e * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nlev * k, B),
                               lambda e, rows, cols, first: (e * 0, rows[e]),
                               memory_space=pltpu.VMEM),
    )
    p = pl.pallas_call(
        _sliced_kernel(nx, na, nlev, k, B, blocked_x=blocked_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nlev * k, n), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * m.nnzb * nx * k * B * na * B,
            bytes_accessed=m.nnzb * B * na * B + nlev * k * m.n * 4,
            transcendentals=0,
        ),
    )(m.rows, m.cols, first, xs, m.slices)
    return p, sx


def _slice_x(x, nx, interpret: bool = False):
    """Row-aligned int8 slices of x, stacked along the sublane axis.

    Uses the same half power-of-two grid as the operand store (bits >= 7
    forces it inside slice_operand), so |q| <= 64 on both sides.  On TPU
    the peel chain runs as a one-pass Pallas kernel (slicing.
    _peel_rows_pallas, bit-identical to the XLA path); the f64 ->
    (hi, mid, lo) f32 split stays in XLA (Mosaic has no f64)."""
    from .slicing import (
        _peel_rows_pallas,
        _peel_tile_for,
        pow2_grid,
        slice_operand,
    )
    import os
    k, n = x.shape
    on_tpu = jax.default_backend() == "tpu" or interpret
    if (not on_tpu or not _peel_tile_for(k, n, nx)
            or os.environ.get("DIAGLIB_TPU_PEEL", "auto") == "never"):
        sl, sx = slice_operand(x.astype(jnp.float64) if nx > 4 else x,
                               axis=-1, n_slices=nx, bits=_BITS)
        return sl.reshape(nx * k, n), sx

    work = x.astype(jnp.float64) if nx > 4 else x
    sx = 2.0 * pow2_grid(
        jnp.max(jnp.abs(work), axis=-1, keepdims=True))
    t = work * (1.0 / sx)  # exact: power-of-two scale
    out = _peel_rows_pallas(t, nx, _BITS, interpret=interpret)
    return (out.reshape(nx * k, n),
            sx.astype(x.dtype) if x.dtype != jnp.float64 else sx)


def _tier_params(m_na: int, dtype, nx: int | None, nlev: int | None):
    """(nx, na_used, nlev) for the requested accuracy tier.

    float64: full accuracy (nx=8 x-slices, all na A-planes, levels to
    na+nx-2 capped at 9 — beyond that the terms fall under 2^-61 of the
    per-column scale, below the 2^-55 storage truncation).
    float32: fast tier (nx=4, top min(na,4) A-planes, 4 levels,
    ~2^-20 relative — better than a plain f32 SpMM).
    """
    if dtype == jnp.float64:
        nx = 8 if nx is None else nx
        na_used = m_na
        nlev = min(na_used + nx - 1, 9) if nlev is None else nlev
    else:
        nx = 4 if nx is None else nx
        na_used = min(m_na, 4)
        nlev = min(4, na_used + nx - 1) if nlev is None else nlev
    return nx, na_used, nlev


def sliced_bsr_matvec(m: SlicedBSR, *, nx: int | None = None,
                      nlev: int | None = None, dtype=jnp.float64,
                      interpret: bool = False):
    """Matvec closure ``x: (k, n) -> (k, n)`` at the requested accuracy.

    See :func:`_tier_params` for the tier definitions.
    """
    nx, na_used, nlev = _tier_params(m.na, dtype, nx, nlev)
    if m.max_bpr:
        # int32 exactness for the ACTUAL tier: up to min(nx, na_used) pair
        # products per level, summed over B * blocks_per_row terms.
        # 2*(_BITS-1)+1 bits per product: carry-overlap headroom (see the
        # build-time guard note above)
        import math
        pairs = min(nx, na_used)
        if (2 * (_BITS - 1) + 1
                + math.ceil(math.log2(m.block * m.max_bpr * pairs))) > 31:
            raise ValueError(
                f"nx={nx} x na={na_used} slices overflow exact int32 "
                f"accumulation at block {m.block} x {m.max_bpr}/row")
    w = combine_weights(nlev, _BITS,
                        jnp.float64 if dtype == jnp.float64 else jnp.float32)

    acc_dtype = jnp.float64 if dtype == jnp.float64 else jnp.float32

    def mv(x):
        k, n = x.shape
        p, sx = _sliced_spmm(m, x, nx=nx, nlev=nlev, na_used=na_used,
                             interpret=interpret)
        y = _combine_levels(p, w, nlev, k, n, acc_dtype)
        y = y * sx.astype(acc_dtype) * m.col_scale[None, :].astype(acc_dtype)
        return y.astype(dtype)

    return mv


def _combine_levels(p, w, nlev, k, n, acc_dtype):
    """Weighted level combine of the kernel's int32 sums.

    Expressed as a broadcast-multiply + sum REDUCE over the level axis: a
    jnp.tensordot here lowers to the emulated-f64 *dot* (~6.5 ms/matvec
    at flagship size), while the reduce lowers to a fused loop (~1.1 ms,
    also beating the unrolled axpy chain's 1.35).  int32 -> f64 is exact
    and the weights are powers of two, so the only rounding is the f64
    summation itself."""
    lv = p.reshape(nlev, k, n).astype(acc_dtype)
    return jnp.sum(lv * w[:, None, None].astype(acc_dtype), axis=0)
