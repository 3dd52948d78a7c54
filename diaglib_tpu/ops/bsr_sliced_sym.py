"""Symmetric integer-sliced BSR operator: HALF the slice-store bandwidth.

The f64-accurate sliced SpMM (ops/bsr_sliced.py) is HBM-bound on reading
the int8 slice store.  For SYMMETRIC operators — every eigensolver target
in this library except the nonsym driver's — each off-diagonal block pair
(A(r,c), A(c,r) = A(r,c)^T) is stored twice there.  This module stores the
upper triangle ONCE and computes both contributions from one read:

* direct:  y_r += x_c @ T_e           (T_e = A(r,c)^T, standard dot)
* mirror:  y_c += x_r @ T_e^T         (per-plane NT dots, same bytes)

The blocker for naive sharing is the quantization grid: per-output-column
scales (bsr_sliced.py) make the mirror contraction mix scales inside the
int32 accumulation.  The fix is a SEPARABLE power-of-two grid

    q[j, k] = T_e[j, k] / (u_{cB+j} * u_{rB+k}),
    u_i = pow2_grid(sqrt(2 * rowmax_i)),   rowmax_i = max_j |A_ij|,

which is tight for symmetric matrices (|A_jk| <= sqrt(rowmax_j rowmax_k),
so |q| <= 1/2 with at most one bit lost), and factors the scales OUT of
the contraction: fold u into x once per matvec (exact: u is a power of
two) and into y once after the combine.  Both directions then accumulate
exactly in int32 on a single shared level grid, like the nonsym kernel.

Kernel shape: one grid step per stored entry; ALL contributions fold into
one VMEM-resident (nlev*k, n) int32 accumulator (constant output index
map — Pallas keeps the tile on chip across the whole grid and writes it
back once), with dynamic lane offsets rows[e]*B / cols[e]*B.  This also
removes the empty-row zeroing hazard of the tile-revisit kernels: the
accumulator is zeroed once at step 0.

VMEM bound: the resident accumulator needs nlev*k*n*4 bytes (37 MB at the
flagship n=65536, k=16), plus the x slices and double-buffered entry
blocks — configurations beyond the budget must use the general
(unsymmetric-storage) operator instead; the builder/matvec guard this.

Reference mapping: same matvec callback contract as everywhere
(README.md:30-44, diaglib.f90:62-72); the symmetric-storage SpMM is a new
TPU-native component with no reference counterpart (SURVEY.md §2.5).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bsr import BSRMatrix, bsr_diagonal
from .bsr_sliced import _BITS, _VMEM_BUDGET, _combine_levels, _slice_x
from .slicing import combine_weights, pow2_grid, slice_scaled

__all__ = ["SymSlicedBSR", "slice_bsr_sym", "sym_sliced_matvec"]

# experiment hook: force the entries-per-grid-step pack factor (None =
# the measured-default policy in bucket_call).  Module global read at
# TRACE time: set it BEFORE the matvec closure is first traced/jitted —
# mutating it afterwards has no effect on already-compiled programs.
_PACK_OVERRIDE = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SymSlicedBSR:
    """Upper-triangle int8 slice store of a SYMMETRIC BSR operator.

    Entries are the block diagonal plus the upper triangle (r <= c),
    row-sorted, PARTITIONED by leading-zero plane count (per-entry plane
    truncation): below the separable grid, an off-diagonal block with
    max|q| < 2^-_BITS has its first slice plane exactly zero — measured on
    the flagship SPD/Casida generators, EVERY off-diagonal entry sheds one
    plane (1/8 of the store's bytes; the store is what the f64 SpMM is
    HBM-bound on).

    slices:   (m0, B, na*B) int8 — full-width entries (plane 0 nonzero);
              entry e holds the na slice planes of
              T_e = A(r_e, c_e)^T / (u_c ⊗ u_r) side by side.
    slices1:  (m1, B, (na-1)*B) int8 — entries whose plane 0 is zero,
              stored from plane 1 (their level fold is offset by 1).
    u_scale:  (n,) f64 separable power-of-two grid (see module docstring).
    diagonal: (n,) f64 main diagonal of A (for preconditioners).
    rows/cols, rows1/cols1: (m,) int32 block coordinates per bucket.
    """

    slices: jax.Array
    u_scale: jax.Array
    diagonal: jax.Array
    rows: jax.Array
    cols: jax.Array
    slices1: jax.Array
    rows1: jax.Array
    cols1: jax.Array
    n: int = dataclasses.field(metadata=dict(static=True))
    block: int = dataclasses.field(metadata=dict(static=True))
    na: int = dataclasses.field(metadata=dict(static=True))
    max_row_terms: int = dataclasses.field(default=0,
                                           metadata=dict(static=True))

    @property
    def nnzb_stored(self) -> int:
        return self.slices.shape[0] + self.slices1.shape[0]

    @property
    def nnz(self) -> int:
        """LOGICAL nonzeros of the symmetric operator (both triangles)."""
        rows = jnp.concatenate([self.rows, self.rows1])
        cols = jnp.concatenate([self.cols, self.cols1])
        n_diag = int(jnp.sum(rows == cols))
        n_off = self.nnzb_stored - n_diag
        return (n_diag + 2 * n_off) * self.block * self.block


def slice_bsr_sym(m: BSRMatrix, na: int | None = None,
                  chunk: int = 256) -> SymSlicedBSR:
    """Build the symmetric slice store from a SYMMETRIC BSRMatrix.

    The matrix must be symmetric both in pattern and values (A = A^T) —
    callers' responsibility (random_bsr_spd and the Casida/gen builders
    construct exactly symmetric operators); only the r <= c entries are
    read.  ``na`` defaults to 8 (7*8-1 = 55 mantissa bits below the
    separable grid, >= f64's 53).
    """
    if na is None:
        na = 8
    B = m.block
    nbr = m.n // B

    # rowmax over the FULL symmetric matrix: stored blocks_t[e] = A(r,c)^T
    # covers rows of block r along axis 1 (max over axis (1,) after the
    # transpose convention: T_e[j, k] = A[rB+k, cB+j])
    rmax_r = jnp.max(jnp.abs(m.blocks_t), axis=1)   # (nnzb, B) rows of r
    rmax_c = jnp.max(jnp.abs(m.blocks_t), axis=2)   # (nnzb, B) rows of c
    rowmax = jnp.zeros((nbr, B), jnp.float64)
    rowmax = rowmax.at[m.rows].max(rmax_r.astype(jnp.float64))
    rowmax = rowmax.at[m.cols].max(rmax_c.astype(jnp.float64))
    u = pow2_grid(jnp.sqrt(2.0 * rowmax.reshape(-1)))          # (n,)

    keep = jnp.asarray(m.rows <= m.cols)
    idx = jnp.nonzero(keep)[0]
    rows = m.rows[idx]
    cols = m.cols[idx]
    n_diag = int(jnp.sum(rows == cols))
    n_off = rows.shape[0] - n_diag
    # int32 exactness guard: per-level products |q_x q_a| summed over
    # B * (terms per output row) * pairs; each output row receives direct
    # terms from its row's stored entries and mirror terms from its
    # column's.  2*(_BITS-1)+1 bits per product: at carry-overlap levels
    # the combined slice magnitude can exceed the nominal 2^{_BITS-1} by
    # ~1.3x per operand, so the nominal product budget is ~1.5x short.
    terms = jnp.zeros((nbr,), jnp.int32)
    terms = terms.at[rows].add(1).at[cols].add(
        jnp.where(rows != cols, 1, 0))
    max_terms = int(jnp.max(terms))
    if (2 * (_BITS - 1) + 1
            + math.ceil(math.log2(B * max_terms * min(na, 8)))) > 31:
        raise ValueError(
            f"block {B} x {max_terms} terms/row overflows exact int32 "
            "accumulation")

    u2 = u.reshape(nbr, B)

    @jax.jit
    def build(blocks_t, rows, cols, u2):
        nnzb = blocks_t.shape[0]
        nchunk = -(-nnzb // chunk)
        pad = nchunk * chunk - nnzb
        bt = jnp.pad(blocks_t, ((0, pad), (0, 0), (0, 0)))
        rr = jnp.pad(rows, (0, pad))
        cc = jnp.pad(cols, (0, pad))

        def body(_, ch):
            blk, r, c = ch
            # T_e[j, k] = A[rB+k, cB+j] -> grid u_c[j] * u_r[k]
            t = (blk.astype(jnp.float64)
                 / u2[c][:, :, None] / u2[r][:, None, :])
            sl = slice_scaled(t, n_slices=na, bits=_BITS)  # (na, c, B, B)
            return None, jnp.concatenate(list(sl), axis=-1)

        _, out = jax.lax.scan(
            body, None,
            (bt.reshape(nchunk, chunk, B, B), rr.reshape(nchunk, chunk),
             cc.reshape(nchunk, chunk)))
        return out.reshape(nchunk * chunk, B, na * B)[:nnzb]

    slices = build(m.blocks_t[idx], rows, cols, u2)

    # per-entry plane truncation: partition by the leading plane's
    # occupancy.  An entry whose first slice plane is exactly zero
    # (max|q| < 2^-_BITS below the separable grid — every off-diagonal
    # block of the flagship generators) goes to the narrow bucket with
    # plane 0 dropped; its kernel fold is offset by one level.  Exact by
    # construction (only all-zero planes are dropped); saves 1/8 of the
    # store bytes the f64 SpMM is HBM-bound on.
    planes = slices.reshape(slices.shape[0], B, na, B)
    nzp = jnp.any(planes != 0, axis=(1, 3))          # (nnzb_s, na)
    in_b0 = jnp.asarray(nzp[:, 0])                   # plane 0 occupied
    keep_any = jnp.any(nzp, axis=1)                  # drop all-zero entries
    i0 = jnp.nonzero(in_b0)[0]
    i1 = jnp.nonzero((~in_b0) & keep_any)[0]

    return SymSlicedBSR(
        slices=slices[i0],
        u_scale=u,
        diagonal=bsr_diagonal(m).astype(jnp.float64),
        rows=rows[i0],
        cols=cols[i0],
        slices1=slices[i1][:, :, B:],
        rows1=rows[i1],
        cols1=cols[i1],
        n=m.n,
        block=B,
        na=na,
        max_row_terms=max_terms,
    )


def _sym_kernel(nx: int, na: int, nlev: int, k: int, B: int,
                plane_off: int = 0, pack: int = 1):
    """One VMEM-resident accumulator; direct + mirror folds per entry.

    ``na`` counts the planes STORED for this bucket; ``plane_off`` is the
    original plane index of the bucket's first stored plane (per-entry
    plane truncation — the dropped leading planes are exactly zero).
    ``pack``: entries processed per grid step — the per-step fixed cost
    measured ~2.9 us on v5e (576 steps = 1.7 ms of the 4 ms flagship
    matvec), so fewer, fatter steps buy real bandwidth.

    Each plane-truncation bucket gets its OWN zero-initialized int32
    accumulator; the caller adds them (exact) outside the kernel.  An
    earlier round-4 variant carried bucket 0's accumulator into bucket 1
    via input_output_aliases, but the TPU scoped-VMEM *stack* accounting
    charges the aliased input AND the output (measured: 39.5 MB scoped for
    a 15.7 MB accumulator at the flagship f32 tier, a compile-time
    scoped-vmem OOM inside the davidson program) — the separate-
    accumulator add costs ~0.04 ms of fused HBM traffic instead.
    """

    def body(rows_ref, cols_ref, xs_ref, blk_ref, acc_ref):
        e = pl.program_id(0)
        for p in range(pack):
            r = rows_ref[e * pack + p]
            c = cols_ref[e * pack + p]
            blk = blk_ref[p]                                 # (B, na*B)

            # direct: y_r += x_c @ T_e (one standard int8 dot, banded fold)
            xb_c = xs_ref[:, pl.ds(pl.multiple_of(c * B, B), B)]  # (nx*k,B)
            prod = jax.lax.dot_general(
                xb_c, blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)            # (nx*k, na*B)
            for i in range(na):
                lev = plane_off + i
                nxi = min(nx, nlev - lev)
                if nxi <= 0:
                    continue
                acc_ref[lev * k:(lev + nxi) * k,
                        pl.ds(pl.multiple_of(r * B, B), B)] += (
                    prod[0:nxi * k, i * B:(i + 1) * B])

            # mirror: y_c += x_r @ T_e^T (per-plane NT dots; skipped on
            # the diagonal, where the mirror IS the direct contribution)
            @pl.when(r != c)
            def _():
                xb_r = xs_ref[:, pl.ds(pl.multiple_of(r * B, B), B)]
                for i in range(na):
                    lev = plane_off + i
                    nxi = min(nx, nlev - lev)
                    if nxi <= 0:
                        continue
                    prod2 = jax.lax.dot_general(
                        xb_r[0:nxi * k, :], blk[:, i * B:(i + 1) * B],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)    # (nxi*k, B)
                    acc_ref[lev * k:(lev + nxi) * k,
                            pl.ds(pl.multiple_of(c * B, B), B)] += prod2

    def kern(rows_ref, cols_ref, xs_ref, blk_ref, acc_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[:, :] = jnp.zeros_like(acc_ref)
        body(rows_ref, cols_ref, xs_ref, blk_ref, acc_ref)

    return kern


def _sym_tier(m_na: int, dtype, nx, nlev):
    if dtype == jnp.float64:
        nx = 8 if nx is None else nx
        na_used = m_na
        nlev = min(na_used + nx - 1, 9) if nlev is None else nlev
    else:
        nx = 4 if nx is None else nx
        na_used = min(m_na, 4)
        nlev = min(4, na_used + nx - 1) if nlev is None else nlev
    return nx, na_used, nlev


def sym_sliced_matvec(m: SymSlicedBSR, *, dtype=jnp.float64,
                      nx: int | None = None, nlev: int | None = None,
                      interpret: bool = False):
    """Matvec closure ``x: (k, n) -> (k, n)`` over the symmetric store."""
    nx, na_used, nlev = _sym_tier(m.na, dtype, nx, nlev)
    if m.max_row_terms:
        pairs = min(nx, na_used)
        if (2 * (_BITS - 1) + math.ceil(
                math.log2(m.block * m.max_row_terms * pairs))) > 31:
            raise ValueError("tier overflows exact int32 accumulation")
    w = combine_weights(nlev, _BITS,
                        jnp.float64 if dtype == jnp.float64 else jnp.float32)
    acc_dtype = jnp.float64 if dtype == jnp.float64 else jnp.float32
    B = m.block
    n = m.n

    def mv(x):
        k = x.shape[0]
        resident = (nlev * k * n * 4          # accumulator (int32)
                    + nx * k * n              # x slices (int8)
                    + 2 * B * na_used * B)    # double-buffered entry
        # the entry-window term above assumes pack=1; packed steps buffer
        # pack x that — a LOWER bound covered by the 28 MB headroom (the
        # per-call vmem_limit_bytes below uses the true packed size)
        if resident > _VMEM_BUDGET + 28 * 1024 * 1024:
            raise ValueError(
                f"symmetric kernel needs {resident >> 20} MB VMEM resident "
                f"at (k={k}, n={n}); use the general sliced operator "
                "(ops/bsr_sliced.py) for this configuration")
        # fold the separable grid into x (exact power-of-two multiply)
        xu = x.astype(acc_dtype) * m.u_scale.astype(acc_dtype)[None, :]
        xs, sx = _slice_x(
            xu.astype(jnp.float64) if dtype == jnp.float64
            else xu.astype(jnp.float32), nx, interpret=interpret)

        def bucket_call(rows_b, cols_b, slices_b, plane_off):
            """One pallas pass over a plane-truncation bucket; returns its
            own zero-initialized int32 level accumulator (None if the
            bucket is empty), summed with the other bucket's outside."""
            nnzb = rows_b.shape[0]
            width = slices_b.shape[-1] // B        # stored planes
            na_b = min(na_used - plane_off, width)
            if nnzb == 0 or na_b <= 0:
                return None
            # entries per grid step: amortize the per-step fixed cost
            # (scalar reads + dynamic-offset setup); padding entries are
            # zero blocks at (0, 0) (diagonal, so the mirror is skipped
            # and the direct dot adds exact zeros).  Round-5 re-measure on
            # the two-bucket store (dispatch-latency-corrected, rep=200):
            # pack {1,2,4,8} all land within 3% on BOTH full-width and
            # partial-width buckets — the round-4 strided-read collapse
            # (219 -> 70 Gnnz/s) does not reproduce after the per-entry
            # plane-truncation relayout; pack=4 is the measured best
            # (f64 167.1, f32 387.2 Gnnz/s at the flagship geometry).
            pack = _PACK_OVERRIDE if _PACK_OVERRIDE is not None else (
                min(8, max(1, 32 // na_b)))
            pad_e = (-nnzb) % pack
            if pad_e:
                rows_b = jnp.pad(rows_b, (0, pad_e))
                cols_b = jnp.pad(cols_b, (0, pad_e))
                slices_b = jnp.pad(slices_b, ((0, pad_e), (0, 0), (0, 0)))
            in_specs = [
                pl.BlockSpec((nx * k, n),
                             lambda e, rows, cols: (e * 0, e * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pack, B, na_b * B),
                             lambda e, rows, cols: (e, e * 0, e * 0),
                             memory_space=pltpu.VMEM),
            ]
            operands = [rows_b, cols_b, xs, slices_b]
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=((nnzb + pad_e) // pack,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((nlev * k, n),
                                       lambda e, rows, cols: (e * 0, e * 0),
                                       memory_space=pltpu.VMEM),
            )
            return pl.pallas_call(
                _sym_kernel(nx, na_b, nlev, k, B, plane_off=plane_off,
                            pack=pack),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((nlev * k, n), jnp.int32),
                interpret=interpret,
                # headroom beyond the resident set covers the
                # double-buffered entry blocks + semaphores; keep it TIGHT
                # — every scoped MB is VMEM that XLA's
                # memory-space-assignment can no longer give to promoted
                # buffers elsewhere in the program, and the flagship
                # programs sit close to that cliff (utils/compile.py)
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=resident
                    + (2 * pack - 2) * B * na_b * B
                    + 8 * 1024 * 1024),
                cost_estimate=pl.CostEstimate(
                    flops=4 * nnzb * nx * k * B * na_b * B,
                    bytes_accessed=nnzb * B * na_b * B + nlev * k * n * 4,
                    transcendentals=0,
                ),
            )(*operands)

        acc0 = bucket_call(m.rows, m.cols, m.slices, 0)
        acc1 = bucket_call(m.rows1, m.cols1, m.slices1, 1)
        if acc0 is None and acc1 is None:
            return jnp.zeros_like(x, dtype)
        # exact int32 add of the two bucket accumulators; XLA fuses it
        # into the level-combine consumer (one extra HBM read, ~0.04 ms)
        acc = acc0 + acc1 if acc0 is not None and acc1 is not None \
            else (acc0 if acc0 is not None else acc1)
        y = _combine_levels(acc, w, nlev, k, n, acc_dtype)
        y = y * sx.astype(acc_dtype) * m.u_scale[None, :].astype(acc_dtype)
        return y.astype(dtype)

    return mv


def sliced_matvec_any(store, *, dtype=jnp.float64, nx=None, nlev=None,
                      interpret: bool = False):
    """Tier matvec closure for either sliced-store flavor.

    Dispatches on the store type: :class:`SymSlicedBSR` (half-bandwidth
    symmetric kernel) or the general
    :class:`~diaglib_tpu.ops.bsr_sliced.SlicedBSR`."""
    from .bsr_sliced import sliced_bsr_matvec

    if isinstance(store, SymSlicedBSR):
        return sym_sliced_matvec(store, dtype=dtype, nx=nx, nlev=nlev,
                                 interpret=interpret)
    return sliced_bsr_matvec(store, dtype=dtype, nx=nx, nlev=nlev,
                             interpret=interpret)
