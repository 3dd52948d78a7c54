"""Mixed-precision solve ladder (TPU-native capability, no reference analog).

The reference is double precision throughout (real_precision.f90: dp=8).
On TPU, float64 is software-emulated — an f64 matvec costs an order of
magnitude more than the same contraction in f32 on the MXU — so the
TPU-native way to reach f64 accuracy is a precision ladder:

1. run the full solver in float32 (Pallas/MXU speed) until the residuals
   hit the f32 noise floor;
2. warm-start the float64 solver from the f32 Ritz vectors — the drivers
   already accept a guess (diaglib.f90:216-218 "in input, a guess"), and
   ``check_guess`` re-orthonormalizes it in the target precision — so only
   the last few iterations pay the emulated-f64 matvec price.

The final result is produced entirely by the f64 stage: eigenvalues,
residual norms and convergence flags carry full double-precision guarantees
(same dual rms/max tolerances as the reference, diaglib.f90:374-375).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..types import SolverOptions, SolverResult
from .davidson import davidson
from .lobpcg import lobpcg

__all__ = ["davidson_ladder", "lobpcg_ladder"]


def _two_stage(solver, matvec_lo, precnd_lo, matvec_hi, precnd_hi,
               evec_guess, options: SolverOptions, lo_tol, lo_iter, key):
    lo_opts = dataclasses.replace(
        options,
        tol=max(float(options.tol), float(lo_tol)),
        max_iter=lo_iter if lo_iter is not None else options.max_iter,
    )
    guess32 = jnp.asarray(evec_guess, jnp.float32)
    lo = solver(matvec_lo, precnd_lo, guess32, lo_opts, key=key)
    hi_guess = lo.evec.astype(jnp.float64)
    hi = solver(matvec_hi, precnd_hi, hi_guess, options, key=key)
    return SolverResult(
        eig=hi.eig,
        evec=hi.evec,
        ok=hi.ok,
        n_iter=lo.n_iter + hi.n_iter,
        n_matvec=lo.n_matvec + hi.n_matvec,
        done=hi.done,
        rms_history=hi.rms_history,
        max_history=hi.max_history,
        eig_history=hi.eig_history,
        # the f32 stage is a warm start only; a contaminated basis there
        # is re-orthonormalized by the f64 stage's check_guess, so only
        # the f64 stage's ortho health gates the result
        ortho_ok=hi.ortho_ok,
    )


def davidson_ladder(matvec_lo, precnd_lo, matvec_hi, precnd_hi, evec_guess,
                    options: SolverOptions, *, lo_tol: float = 2e-6,
                    lo_iter: int = None, key=None):
    """f32-then-f64 Davidson-Liu.

    ``matvec_lo``/``precnd_lo`` operate on float32 blocks (e.g. the Pallas
    BSR kernel over an f32 copy of the operator), ``matvec_hi``/``precnd_hi``
    on float64.  ``lo_tol`` is the f32 stage's rms target — keep it above
    the f32 noise floor (~1e-6 · ||A||) or the stage burns its iteration
    budget without locking.  The f32 stage is not required to converge; its
    Ritz vectors are simply the warm start.

    Returns the f64 stage's :class:`SolverResult` with iteration/matvec
    counters accumulated over both stages.
    """
    return _two_stage(davidson, matvec_lo, precnd_lo, matvec_hi, precnd_hi,
                      evec_guess, options, lo_tol, lo_iter, key)


def lobpcg_ladder(matvec_lo, precnd_lo, matvec_hi, precnd_hi, evec_guess,
                  options: SolverOptions, *, lo_tol: float = 2e-6,
                  lo_iter: int = None, key=None):
    """f32-then-f64 LOBPCG (standard eigenproblem path)."""
    return _two_stage(lobpcg, matvec_lo, precnd_lo, matvec_hi, precnd_hi,
                      evec_guess, options, lo_tol, lo_iter, key)
