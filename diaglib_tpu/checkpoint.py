"""Checkpoint/resume for long solves (aux subsystem, SURVEY.md §5).

The reference has no persistence; its closest analogs are the Davidson
restart (collapse to Ritz vectors and continue, diaglib.f90:1795-1825) and
the warm-start guess every driver accepts (diaglib.f90:216-218).  This
module adds durable snapshots on top of the same contract: every solver
result is a pytree, and ``res.evec`` (or the LR pair rows) IS a valid
warm-start guess — so checkpoint/resume is

    save(path, res)                      # after any solve / ladder stage
    res = load(path, like=res_struct)    # later process
    res2 = davidson(mv, pc, res.evec, opts)   # resumes where it left off

Snapshots are written with orbax (async-capable, multi-host aware: on a
process-spanning mesh each host writes only its addressable shards).
"""

from __future__ import annotations

import os

import jax

__all__ = ["save", "load"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save(path: str, tree) -> None:
    """Durably write a pytree (e.g. a SolverResult, or just a guess block).

    ``path`` must be an absolute directory path (orbax requirement); it is
    created (parents included) and overwritten if present.
    """
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    ckpt.save(path, tree, force=True)
    ckpt.wait_until_finished()


def load(path: str, like):
    """Restore a pytree written by :func:`save`.

    ``like`` is a pytree of the same structure (arrays or ShapeDtypeStruct
    leaves) — e.g. the result of an identically configured solve, or
    ``jax.eval_shape`` of one — used to reconstruct shapes/dtypes/shardings.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, like)
    return _checkpointer().restore(path, target)
