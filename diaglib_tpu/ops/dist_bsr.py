"""Distributed BSR SpMM: row-partitioned blocks + ppermute halo exchange.

This is the north-star distributed operator from SURVEY.md §2.5: the
reference (Molecolab-Pisa/diaglib) is serial Fortran and only ever touches
the matrix through user matvec callbacks, so the *scalable* matvec is a new
TPU-native component with no reference counterpart.

Design
------
The block rows of a :class:`~diaglib_tpu.ops.bsr.BSRMatrix` are partitioned
contiguously over the 1-D device mesh (same ``"n"`` axis the solvers shard
their (k, n) vector blocks along, see parallel/sharding.py).  Each nonzero
block A(r, c) lives on the device owning block-row r and is grouped by the
**ring offset** ``s = (shard(c) - shard(r)) mod D`` — the number of mesh
hops between the x-shard it consumes and the y-shard it produces:

* ``s = 0``: the diagonal group — consumes the device's own x shard;
  for banded operators this holds nearly all entries.
* ``s != 0``: halo groups — the needed x shard is fetched with ONE
  ``lax.ppermute`` per *nonempty* offset (empty offsets are skipped at
  trace time: a banded operator with bandwidth < n/D issues exactly two
  small permutes, to its ring neighbours, regardless of D).

XLA schedules the collective-permutes asynchronously, so the (large) s=0
local SpMM overlaps the (small) halo transfers — the TPU-native analogue of
compute/communication overlap in a halo-exchange SpMV.

Per-group entry lists are padded to a static per-offset maximum across
devices (padding points at an all-zero block accumulating into local row 0),
keeping every shape static under jit.  The local compute is the same
chunked segment-SpMM core as the single-device operator (f64-safe on TPU,
see ops/bsr.py and utils/mm.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from .bsr import BSRMatrix, _segment_spmm

__all__ = ["DistBSRMatrix", "distribute_bsr", "dist_bsr_matvec"]


def _ring_offset_groups(rows, cols, nbr_loc: int, D: int, pad_row: int):
    """Group entries by ring offset ``s = (shard(col) - shard(row)) mod D``.

    Host-side (numpy) pattern reorganization shared by the plain and the
    integer-sliced distributed operators.  Returns ``(steps, groups)`` where
    ``groups[i] = (idx, lr, lc)`` are (D, P_i) int32 arrays per nonempty
    offset ``steps[i]``: global entry index, LOCAL block row on the owning
    shard, LOCAL block col on the source x shard.  Rows per device stay
    sorted (``rows`` is sorted globally).  Padding slots get
    ``idx = len(rows)`` (one past the end), ``lr = pad_row``, ``lc = 0``.
    """
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    dest = rows // nbr_loc
    src = cols // nbr_loc
    s_of = (src - dest) % D
    steps = tuple(sorted(set(int(s) for s in s_of)))
    groups = []
    for s in steps:
        counts = [int(np.sum((dest == d) & (s_of == s))) for d in range(D)]
        p = max(counts)
        idx = np.full((D, p), len(rows), np.int32)
        lr = np.full((D, p), pad_row, np.int32)
        lc = np.zeros((D, p), np.int32)
        for d in range(D):
            sel = np.nonzero((dest == d) & (s_of == s))[0]
            idx[d, : len(sel)] = sel
            lr[d, : len(sel)] = rows[sel] - d * nbr_loc
            lc[d, : len(sel)] = cols[sel] % nbr_loc
        groups.append((idx, lr, lc))
    return steps, groups


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistBSRMatrix:
    """BSR matrix partitioned by block row over a D-device mesh axis.

    Per nonempty ring offset ``steps[i]`` the entry data is stacked with a
    leading device axis (sharded over the mesh under shard_map):

    blocks_t[i]: (D, P_i, B, B) pre-transposed blocks (zero-padded);
    loc_rows[i]: (D, P_i) int32 block row LOCAL to the owning shard;
    loc_cols[i]: (D, P_i) int32 block col LOCAL to the source x shard.
    """

    blocks_t: tuple
    loc_rows: tuple
    loc_cols: tuple
    steps: tuple = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    block: int = dataclasses.field(metadata=dict(static=True))
    ndev: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_local(self) -> int:
        return self.n // self.ndev


def distribute_bsr(m: BSRMatrix, n_shards: int) -> DistBSRMatrix:
    """Partition a BSRMatrix's block rows over ``n_shards`` mesh slots.

    The sparsity pattern is reorganized on the host (index arrays only);
    block data is re-gathered on device.  Requires the block-row count to
    divide evenly (pad the operator if it does not).
    """
    B = m.block
    nbr = m.n // B
    D = int(n_shards)
    if nbr % D:
        raise ValueError(f"block rows ({nbr}) must divide over {D} shards")
    nbr_loc = nbr // D

    steps, groups = _ring_offset_groups(m.rows, m.cols, nbr_loc, D,
                                        pad_row=0)

    # index nnzb points at an appended all-zero block (safe padding target)
    zero_blk = jnp.zeros((1, B, B), m.blocks_t.dtype)
    blocks_ext = jnp.concatenate([m.blocks_t, zero_blk], axis=0)

    blocks_l, lrows_l, lcols_l = [], [], []
    for idx, lr, lc in groups:
        blocks_l.append(jnp.take(blocks_ext, jnp.asarray(idx), axis=0))
        lrows_l.append(jnp.asarray(lr))
        lcols_l.append(jnp.asarray(lc))

    return DistBSRMatrix(
        blocks_t=tuple(blocks_l),
        loc_rows=tuple(lrows_l),
        loc_cols=tuple(lcols_l),
        steps=steps,
        n=m.n,
        block=B,
        ndev=D,
    )


def dist_bsr_matvec(dm: DistBSRMatrix, sharding):
    """Sharded matvec closure ``x: (k, n) -> (k, n)`` over the mesh.

    ``sharding`` is a :class:`~diaglib_tpu.parallel.VectorSharding` whose
    mesh axis has exactly ``dm.ndev`` devices.  The closure is jittable and
    drops straight into any solver as its ``matvec`` (the solvers constrain
    their (k, n) state along the same axis, so no resharding occurs).
    """
    mesh, axis = sharding.mesh, sharding.axis
    D = dm.ndev
    if mesh.shape[axis] != D:
        raise ValueError(
            f"matrix distributed over {D} shards but mesh axis "
            f"'{axis}' has {mesh.shape[axis]} devices")
    B = dm.block
    nbr_loc = dm.n_local // B
    steps = dm.steps

    def local(x_loc, *step_data):
        # x_loc: (k, n_local); step_data: D-sharded (1, P, ...) leaves
        k = x_loc.shape[0]
        # the scan carry inside shard_map must be device-varying like the
        # shard data it accumulates
        y = jax.lax.pcast(jnp.zeros((nbr_loc, k, B), x_loc.dtype),
                          axis, to="varying")
        for i, s in enumerate(steps):
            blocks, lr, lc = (a[0] for a in step_data[3 * i: 3 * i + 3])
            if s == 0:
                x_s = x_loc
            else:
                # fetch the shard s hops up-ring: one collective permute,
                # scheduled async so it overlaps the s=0 local compute
                perm = [(j, (j - s) % D) for j in range(D)]
                x_s = jax.lax.ppermute(x_loc, axis, perm)
            xb = x_s.reshape(k, nbr_loc, B).transpose(1, 0, 2)
            y = _segment_spmm(xb, lr, lc, blocks, nbr_loc, init=y)
        return y.transpose(1, 0, 2).reshape(k, nbr_loc * B)

    flat_data = []
    for i in range(len(steps)):
        flat_data += [dm.blocks_t[i], dm.loc_rows[i], dm.loc_cols[i]]

    shmapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis),) + (P(axis),) * len(flat_data),
        out_specs=P(None, axis),
    )

    def mv(x):
        return shmapped(x, *flat_data)

    return mv
