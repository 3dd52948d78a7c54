"""Block-sparse-row (BSR) operator with a Pallas TPU SpMM kernel.

The reference never materializes the matrix — users supply ``matvec``
callbacks (README.md:30-44).  For the TPU framework the north-star workload
(BASELINE.md) is a large sparse operator, so this module provides the
canonical high-performance callback: a BSR matrix whose row-block matvec
runs as a Pallas kernel tiled for the MXU.

Layout: vectors are rows (k, n) like everywhere in this library; the kernel
computes ``y = x @ A^T`` (i.e. y_i = A x_i per row) as

    y[:, r*B:(r+1)*B] = sum_e in row r   x[:, col_e*B:(col_e+1)*B] @ T_e

with ``T_e = blocks[e]^T`` stored pre-transposed so the inner contraction
is a plain (k, B) @ (B, B) MXU matmul.

Kernel structure (one grid step per nonzero block, entries sorted by row):
the scalar-prefetched ``cols``/``rows`` arrays drive the BlockSpec index
maps, so Pallas pipelines the (k, B) x-slices and (B, B) blocks from HBM
automatically; the output block lives in VMEM across consecutive grid steps
of the same row (TPU grids execute sequentially — accumulation is safe) and
is zeroed at each row's first entry.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "BSRMatrix",
    "bsr_from_dense",
    "bsr_to_dense",
    "bsr_matvec",
    "bsr_diagonal",
    "random_bsr_spd",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSRMatrix:
    """Square block-sparse matrix with uniform B x B blocks.

    blocks_t: (nnzb, B, B) — the e-th block stored TRANSPOSED (ready for
              ``x_blk @ blocks_t[e]``).
    rows:     (nnzb,) int32 block-row index of each entry (sorted ascending).
    cols:     (nnzb,) int32 block-col index of each entry.
    row_start:(nbr,) int32 — index of the first entry of each block row
              (entries are contiguous per row).
    n:        matrix dimension (nbr * B).
    """

    blocks_t: jax.Array
    rows: jax.Array
    cols: jax.Array
    row_start: jax.Array
    n: int = dataclasses.field(metadata=dict(static=True))
    block: int = dataclasses.field(metadata=dict(static=True))

    @property
    def nnzb(self) -> int:
        return self.blocks_t.shape[0]

    @property
    def nnz(self) -> int:
        return self.nnzb * self.block * self.block


def bsr_from_dense(a, block: int) -> BSRMatrix:
    """Build a BSR matrix from a dense array, dropping all-zero blocks."""
    a = np.asarray(a)
    n = a.shape[0]
    if n % block or a.shape[0] != a.shape[1]:
        raise ValueError("dense matrix must be square with n % block == 0")
    nbr = n // block
    rows, cols, blocks = [], [], []
    for r in range(nbr):
        found = False
        for c in range(nbr):
            blk = a[r * block:(r + 1) * block, c * block:(c + 1) * block]
            if np.any(blk != 0.0):
                rows.append(r)
                cols.append(c)
                blocks.append(blk.T)  # pre-transposed
                found = True
        if not found:
            # every block row must carry >= 1 entry: the Pallas kernels
            # zero an output tile only at a row's first entry, so an
            # empty row's tile would hold uninitialized memory.  (An
            # output-side mask is NOT an option: adding one to the hot
            # path changed XLA's fusion inside solver while_loops and
            # broke emulated-f64 convergence — pad the pattern instead.)
            rows.append(r)
            cols.append(r)
            blocks.append(np.zeros((block, block), a.dtype))
    return BSRMatrix(
        blocks_t=jnp.asarray(np.stack(blocks)),
        rows=jnp.asarray(rows, jnp.int32),
        cols=jnp.asarray(cols, jnp.int32),
        row_start=jnp.asarray(
            np.searchsorted(np.asarray(rows), np.arange(nbr)), jnp.int32),
        n=n,
        block=block,
    )


def bsr_to_dense(m: BSRMatrix):
    """Dense reconstruction (tests/oracles only)."""
    B = m.block
    out = jnp.zeros((m.n, m.n), m.blocks_t.dtype)

    def body(i, acc):
        r, c = m.rows[i], m.cols[i]
        return jax.lax.dynamic_update_slice(
            acc, m.blocks_t[i].T, (r * B, c * B))

    return jax.lax.fori_loop(0, m.nnzb, body, out)


def bsr_diagonal(m: BSRMatrix):
    """(n,) main diagonal — the input to mprec-style preconditioners."""
    nbr = m.n // m.block
    is_diag = m.rows == m.cols
    contrib = jax.vmap(jnp.diagonal)(m.blocks_t)  # transpose shares the diag
    d = jnp.zeros((nbr, m.block), m.blocks_t.dtype)
    d = d.at[m.rows].add(jnp.where(is_diag[:, None], contrib, 0.0))
    return d.reshape(-1)


def _spmm_kernel(rows_ref, cols_ref, first_ref, x_ref, blk_ref, o_ref):
    @pl.when(first_ref[pl.program_id(0)] == 1)
    def _():
        o_ref[:, :] = jnp.zeros_like(o_ref)

    o_ref[:, :] += jnp.dot(x_ref[:, :], blk_ref[0],
                           preferred_element_type=o_ref.dtype)


def _spmm_pallas(m: BSRMatrix, x, interpret: bool):
    k, n = x.shape
    B = m.block
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (m.rows[1:] != m.rows[:-1]).astype(jnp.int32)])
    # index maps must stay int32 and may not capture constants: with
    # jax_enable_x64 a literal 0 traces as i64 (Mosaic cannot legalize it),
    # so zeros are derived from the int32 index argument instead
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # rows, cols, first
        grid=(m.nnzb,),
        in_specs=[
            pl.BlockSpec((k, B),
                         lambda e, rows, cols, first: (e * 0, cols[e]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, B),
                         lambda e, rows, cols, first: (e, e * 0, e * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, B),
                               lambda e, rows, cols, first: (e * 0, rows[e]),
                               memory_space=pltpu.VMEM),
    )
    # NOTE: every block row must have >= 1 entry (builders enforce this by
    # padding empty rows with a zero block) — the kernel zeroes an output
    # tile only at a row's first entry, so an uncovered row's tile would
    # hold uninitialized memory.  Masking the output here instead was
    # tried and REVERTED: the extra ops changed XLA's fusion inside
    # solver while_loops and broke emulated-f64 convergence.
    return pl.pallas_call(
        _spmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, n), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m.nnzb * k * B * B,
            bytes_accessed=m.nnzb * (B * B + 2 * k * B) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(m.rows, m.cols, first, x, m.blocks_t)


def _segment_spmm(xb, rows, cols, blocks_t, nbr_out: int, chunk: int = 64,
                  init=None):
    """Gather x block-columns, batched matmul, segment-add into block rows.

    xb: (nbc, k, B) source block-columns; rows/cols: (nnzb,) entry indices;
    blocks_t: (nnzb, B, B) pre-transposed blocks.  Returns (nbr_out, k, B).

    Entries are processed in chunks inside a scan: one flat batched einsum
    over all nnzb blocks makes XLA materialize O(nnzb * B^2) temporaries
    (several copies under f64 emulation — tens of GB at production sizes).
    """
    k, B = xb.shape[1], xb.shape[2]
    nnzb = blocks_t.shape[0]
    nchunk = -(-nnzb // chunk)
    pad = nchunk * chunk - nnzb
    if pad:
        # pad with a zero block pointing at col 0 / accumulating into row 0
        cols = jnp.pad(cols, (0, pad))
        rows = jnp.pad(rows, (0, pad))
        blocks_t = jnp.pad(blocks_t, ((0, pad), (0, 0), (0, 0)))

    def body(acc, ch):
        c, r, blk = ch
        gathered = jnp.take(xb, c, axis=0)                 # (chunk, k, B)
        # 2x/0.5 scaling: see utils/mm.py (TPU f64 emulation loses
        # precision on value-correlated contractions)
        prods = jnp.einsum("ekb,ebc->ekc", gathered, 2.0 * blk) * 0.5
        return acc.at[r].add(prods), None

    if init is None:
        init = jnp.zeros((nbr_out, k, B), xb.dtype)
    out, _ = jax.lax.scan(
        body, init,
        (cols.reshape(nchunk, chunk), rows.reshape(nchunk, chunk),
         blocks_t.reshape(nchunk, chunk, B, B)))
    return out


def _spmm_reference(m: BSRMatrix, x, chunk: int = 64):
    """Pure-jnp fallback built on the chunked segment-SpMM core."""
    B = m.block
    k = x.shape[0]
    nbr = m.n // B
    xb = x.reshape(k, nbr, B).transpose(1, 0, 2)           # (nbc, k, B)
    out = _segment_spmm(xb, m.rows, m.cols, m.blocks_t, nbr, chunk)
    return out.transpose(1, 0, 2).reshape(k, m.n)


def bsr_matvec(m: BSRMatrix, *, force_reference: bool = False):
    """Row-block matvec closure ``x: (k, n) -> (k, n)`` for the solvers.

    Uses the Pallas kernel on TPU for f32/bf16; the segment-sum reference
    path elsewhere (CPU meshes, tests) and for float64, which Mosaic's MXU
    lowering does not support (XLA's emulated-f64 matmul handles it).
    """

    def mv(x):
        if (force_reference or jax.default_backend() != "tpu"
                or m.blocks_t.dtype == jnp.float64):
            return _spmm_reference(m, x)
        return _spmm_pallas(m, x, interpret=False)

    return mv


def random_bsr_spd(n: int, block: int, blocks_per_row: int, key,
                   dtype=jnp.float32, n_low_modes: int = 20,
                   off_scale: float = 0.3) -> BSRMatrix:
    """Random SPD-ish block-sparse test matrix with a dominant diagonal.

    Structure: the block diagonal plus ``blocks_per_row - 1`` symmetric
    off-diagonal block pairs per row (band-ish, deterministic from key).
    Diagonal blocks are made diagonally dominant so the matrix is SPD and
    a shift-and-invert diagonal preconditioner works (mprec-style).
    ``n_low_modes`` diagonal entries are pulled well below the bulk band
    (against one GLOBAL base — per-row bases would bury them in another
    row's bulk at scale) so the low end of the spectrum is a set of
    separated eigenvalues an iterative solver can actually resolve.

    The sparsity pattern is built on the host (tiny); the block *data* is
    generated and assembled on device — at production sizes the blocks are
    gigabytes and a host round-trip would dominate setup time.
    """
    if n % block:
        raise ValueError("n must be divisible by block")
    nbr = n // block
    B = block
    # ---- host: sparsity pattern ----
    pair_set = set()
    for r in range(nbr):
        for jj in range(blocks_per_row - 1):
            c = (r + 1 + jj * max(1, nbr // blocks_per_row)) % nbr
            lo, hi = min(r, c), max(r, c)
            if lo != hi:
                pair_set.add((lo, hi))
    pairs = sorted(pair_set)                      # upper-triangle pairs
    n_pairs = len(pairs)
    entries = [(r, r, -1, False) for r in range(nbr)]   # (row, col, pair, transposed)
    for pidx, (r, c) in enumerate(pairs):
        entries.append((r, c, pidx, False))
        entries.append((c, r, pidx, True))
    entries.sort(key=lambda t: (t[0], t[1]))
    rows = np.asarray([t[0] for t in entries], np.int32)
    cols = np.asarray([t[1] for t in entries], np.int32)
    pair_of = np.asarray([t[2] for t in entries], np.int32)
    transposed = np.asarray([t[3] for t in entries], bool)
    nnzb = len(entries)

    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    low_rows = np.sort(rng.choice(n, size=min(n_low_modes, n), replace=False))
    low_vals = np.linspace(0.5, 4.0, len(low_rows))

    # ---- device: block data (jitted so XLA plans/reuses the multi-GB
    # buffers; run eagerly, the .at[].set assembly chain keeps several
    # full-size temporaries alive at once and OOMs at production sizes) ----
    @jax.jit
    def build(key):
        k_off, k_sym, k_dia = jax.random.split(key, 3)
        scale = jnp.asarray(off_scale / np.sqrt(B), dtype)
        off = scale * jax.random.normal(k_off, (max(n_pairs, 1), B, B), dtype)
        sym = jax.random.normal(k_sym, (nbr, B, B), dtype) * jnp.asarray(
            1.0 / np.sqrt(B), dtype)
        # EXACT symmetry by construction: mirror the strict lower triangle
        # so (i, j) and (j, i) are the same stored value.  The arithmetic
        # identity 0.5*(a + a^T) is exact in IEEE but NOT under jit: XLA
        # fuses the scaling into the two operands differently and the
        # result is asymmetric at f32 eps (observed 3e-8) — enough to
        # spoil a 1e-10 f64 residual target on a nominally SPD operator.
        low = jnp.tril(sym, -1)
        sym = low + low.transpose(0, 2, 1) + jax.vmap(jnp.diag)(
            jnp.diagonal(sym, axis1=1, axis2=2))

        # diagonal dominance: per-row accumulated off-block row/col mass
        row_mass = jnp.max(jnp.sum(jnp.abs(off), axis=2), axis=1)
        col_mass = jnp.max(jnp.sum(jnp.abs(off), axis=1), axis=1)
        p_rows = jnp.asarray([p[0] for p in pairs], jnp.int32)
        p_cols = jnp.asarray([p[1] for p in pairs], jnp.int32)
        boost = jnp.zeros((nbr,), dtype)
        if n_pairs:
            boost = boost.at[p_rows].add(row_mass).at[p_cols].add(col_mass)
        sym_rowmax = jnp.max(jnp.sum(jnp.abs(sym), axis=2), axis=1)
        base = jnp.max(boost + sym_rowmax) + 1.0

        diag_vals = base + 10.0 + 3.0 * jax.random.uniform(k_dia, (n,), dtype)
        diag_vals = diag_vals.at[jnp.asarray(low_rows)].set(
            base + jnp.asarray(low_vals, dtype))
        dia = sym + jax.vmap(jnp.diag)(diag_vals.reshape(nbr, B))

        # assemble blocks_t (entry e stores A(r_e, c_e)^T)
        blocks_t = jnp.zeros((nnzb, B, B), dtype)
        dpos = jnp.asarray(np.nonzero(pair_of < 0)[0], jnp.int32)
        blocks_t = blocks_t.at[dpos].set(dia)  # diagonal blocks: symmetric
        if n_pairs:
            fwd = np.nonzero((pair_of >= 0) & ~transposed)[0]
            bwd = np.nonzero((pair_of >= 0) & transposed)[0]
            # A(r,c) = G  -> store G^T;  A(c,r) = G^T -> store G
            blocks_t = blocks_t.at[jnp.asarray(fwd, jnp.int32)].set(
                off[pair_of[fwd]].transpose(0, 2, 1))
            blocks_t = blocks_t.at[jnp.asarray(bwd, jnp.int32)].set(
                off[pair_of[bwd]])
        return blocks_t

    blocks_t = build(key)

    return BSRMatrix(
        blocks_t=blocks_t,
        rows=jnp.asarray(rows),
        cols=jnp.asarray(cols),
        row_start=jnp.asarray(
            np.searchsorted(rows, np.arange(nbr)), jnp.int32),
        n=n,
        block=block,
    )
