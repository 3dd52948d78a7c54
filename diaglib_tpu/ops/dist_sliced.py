"""Distributed integer-sliced BSR SpMM: exact f64 on the int8 MXU, sharded.

Combines the two TPU-native operator designs of this package:

* ``ops/dist_bsr.py`` — block rows partitioned over the mesh axis, remote x
  shards fetched with one ``lax.ppermute`` per nonempty ring offset (halo
  exchange overlapped with local compute by XLA's async collectives);
* ``ops/bsr_sliced.py`` — the operator stored once as Ozaki int8 slice
  planes, serving exact-f64 and fast-f32 matvec tiers from one Pallas
  kernel on the int8 MXU.

On a pod slice this is the production float64 matvec: the emulated-f64
SpMM it replaces is ~9x slower per chip (BASELINE.md), and the halo
traffic is identical (the f64 x shards are permuted, slicing happens
after receipt on the consuming device — per-(row, shard) slicing grids
are independently exact, so no global alignment is needed).

Reference mapping: the scalable matvec is a new component with no
counterpart in the serial Fortran reference (SURVEY.md §2.5); the user
callback contract it instantiates is README.md:30-44 / diaglib.f90:62-72.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from .bsr_sliced import (
    _BITS,
    SlicedBSR,
    _slice_x,
    _sliced_kernel,
    _tier_params,
)
from .slicing import combine_weights

__all__ = ["DistSlicedBSR", "distribute_sliced_bsr", "dist_sliced_matvec"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistSlicedBSR:
    """Sliced BSR operator partitioned by block row over a D-device mesh.

    Per nonempty ring offset ``steps[i]`` the entry data is stacked with a
    leading device axis (sharded over the mesh under shard_map):

    slices[i]:   (D, P_i, B, na*B) int8 slice planes (zero-padded entries);
    loc_rows[i]: (D, P_i) int32 block row LOCAL to the owning shard —
                 padding entries point at the extra row ``nbr_loc`` so they
                 can never zero or touch a real accumulator row;
    loc_cols[i]: (D, P_i) int32 block col LOCAL to the source x shard;
    first[i]:    (D, P_i) int32 — 1 at each entry that starts a new output
                 row within the group (drives accumulator zeroing in the
                 kernel; entries are row-sorted per device, padding last).
    col_scale:   (n,) f64 power-of-two output-column scales (shard along n).
    diagonal:    (n,) f64 main diagonal (for preconditioners).
    """

    slices: tuple
    loc_rows: tuple
    loc_cols: tuple
    first: tuple
    col_scale: jax.Array
    diagonal: jax.Array
    steps: tuple = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    block: int = dataclasses.field(metadata=dict(static=True))
    na: int = dataclasses.field(metadata=dict(static=True))
    ndev: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_local(self) -> int:
        return self.n // self.ndev


def distribute_sliced_bsr(ms: SlicedBSR, n_shards: int) -> DistSlicedBSR:
    """Partition a SlicedBSR's block rows over ``n_shards`` mesh slots.

    Same ring-offset grouping as :func:`~diaglib_tpu.ops.dist_bsr.
    distribute_bsr` (shared helper).  The int8 slice data is gathered on
    the HOST: at production scale the store is several GiB, and a device
    gather would transiently hold ~3x of it in HBM (source + padded copy
    per offset group).  Callers should drop their ``ms`` reference after
    distributing to reclaim the single-device store.
    """
    from .dist_bsr import _ring_offset_groups

    B = ms.block
    nbr = ms.n // B
    D = int(n_shards)
    if nbr % D:
        raise ValueError(f"block rows ({nbr}) must divide over {D} shards")
    nbr_loc = nbr // D

    # padding entries point at the extra output row nbr_loc
    steps, groups = _ring_offset_groups(ms.rows, ms.cols, nbr_loc, D,
                                        pad_row=nbr_loc)
    slices_np = np.asarray(ms.slices)  # one host copy of the store

    slices_l, lrows_l, lcols_l, first_l = [], [], [], []
    for idx, lr, lc in groups:
        pad = idx == ms.nnzb
        arr = slices_np[np.where(pad, 0, idx)]
        arr[pad] = 0  # all-zero slice blocks at padding slots
        fi = np.zeros(lr.shape, np.int32)
        fi[:, 0] = 1
        fi[:, 1:] = (lr[:, 1:] != lr[:, :-1]).astype(np.int32)
        slices_l.append(jnp.asarray(arr))
        lrows_l.append(jnp.asarray(lr))
        lcols_l.append(jnp.asarray(lc))
        first_l.append(jnp.asarray(fi))

    return DistSlicedBSR(
        slices=tuple(slices_l),
        loc_rows=tuple(lrows_l),
        loc_cols=tuple(lcols_l),
        first=tuple(first_l),
        col_scale=ms.col_scale,
        diagonal=ms.diagonal,
        steps=steps,
        n=ms.n,
        block=B,
        na=ms.na,
        ndev=D,
    )


def _group_spmm(xs, lr, lc, fi, slices, *, nx, na_used, nlev, k, B,
                nbr_loc, interpret):
    """Level sums for one offset group on one device.

    xs: (nx*k, n_local) int8 x slices; slices: (P, B, na*B) int8 (the kernel
    reads only the leading na_used*B plane columns).  Output has one extra
    padding row of B columns that padding entries write into; the caller
    slices it off.
    """
    p_cnt = slices.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(p_cnt,),
        in_specs=[
            pl.BlockSpec((nx * k, nbr_loc * B),
                         lambda e, rows, cols, first: (e * 0, e * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, na_used * B),
                         lambda e, rows, cols, first: (e, e * 0, e * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nlev * k, B),
                               lambda e, rows, cols, first: (e * 0, rows[e]),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _sliced_kernel(nx, na_used, nlev, k, B),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nlev * k, (nbr_loc + 1) * B),
                                       jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * p_cnt * nx * k * B * na_used * B,
            bytes_accessed=p_cnt * B * na_used * B
            + nlev * k * (nbr_loc + 1) * B * 4,
            transcendentals=0,
        ),
    )(lr, lc, fi, xs, slices)


def dist_sliced_matvec(dm: DistSlicedBSR, sharding, *, dtype=jnp.float64,
                       nx: int | None = None, nlev: int | None = None,
                       interpret: bool = False):
    """Sharded matvec closure ``x: (k, n) -> (k, n)`` at the requested tier.

    Drops into any solver as its ``matvec`` next to the same
    :class:`~diaglib_tpu.parallel.VectorSharding` — the f64 tier gives the
    full sliced accuracy (~1e-15 relative), the f32 tier the fast path.
    Each offset group's x shard is fetched with one ``ppermute`` (f64
    payload), sliced on the consuming device, and contracted by the same
    int8 kernel as the single-chip operator; group results are combined in
    f64 with the group's own x-scales, so exactness needs no cross-shard
    grid alignment.
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
    nx, na_used, nlev = _tier_params(dm.na, dtype, nx, nlev)
    w = combine_weights(nlev, _BITS,
                        jnp.float64 if dtype == jnp.float64 else jnp.float32)

    def local(x_loc, cs_loc, *step_data):
        k = x_loc.shape[0]
        n_loc = x_loc.shape[1]
        acc_dtype = jnp.float64 if dtype == jnp.float64 else jnp.float32
        y = jnp.zeros((k, n_loc), acc_dtype)
        for i, s in enumerate(steps):
            slices, lr, lc, fi = (a[0] for a in step_data[4*i: 4*i + 4])
            if s == 0:
                x_s = x_loc
            else:
                # one collective permute per nonempty offset; XLA schedules
                # it async so it overlaps the s=0 local kernel
                perm = [(j, (j - s) % D) for j in range(D)]
                x_s = jax.lax.ppermute(x_loc, axis, perm)
            xs, sx = _slice_x(x_s if dtype == jnp.float64
                              else x_s.astype(jnp.float32), nx)
            p = _group_spmm(xs, lr, lc, fi, slices, nx=nx, na_used=na_used,
                            nlev=nlev, k=k, B=B, nbr_loc=nbr_loc,
                            interpret=interpret)
            # local rows with no entry in this group are never written by
            # the kernel (their output blocks hold uninitialized VMEM) —
            # mask by row coverage before accumulating
            covered = jnp.zeros((nbr_loc + 1,), jnp.int32).at[lr].set(1)
            p = p.reshape(nlev * k, nbr_loc + 1, B) * covered[None, :, None]
            from .bsr_sliced import _combine_levels
            lv = p.reshape(nlev * k, (nbr_loc + 1) * B)[:, :n_loc]
            # sum-reduce combine (see bsr_sliced._combine_levels; a
            # tensordot here lowers to the slow emulated-f64 dot)
            g = _combine_levels(lv, w, nlev, k, n_loc, acc_dtype)
            y = y + g * sx.astype(acc_dtype)
        return (y * cs_loc[None, :].astype(acc_dtype)).astype(dtype)

    flat_data = []
    for i in range(len(steps)):
        flat_data += [dm.slices[i], dm.loc_rows[i], dm.loc_cols[i],
                      dm.first[i]]

    # check_vma=False: the Pallas scalar-prefetch index maps mix
    # device-varying prefetch arrays with unvaried grid indices, which the
    # vma checker cannot type yet (JAX's own suggested workaround)
    shmapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis)) + (P(axis),) * len(flat_data),
        out_specs=P(None, axis),
        check_vma=False,
    )

    def mv(x):
        return shmapped(x, dm.col_scale, *flat_data)

    return mv
