"""Tracing/profiling (SURVEY.md §5, tracing row).

The reference keeps per-phase cpu/wall accumulators (t_mv, t_diag, t_ortho,
t_tot; diaglib.f90:160-161) updated around each phase.  Inside a jitted
``lax.while_loop`` host-side timers are meaningless, so the TPU-native
equivalents are:

* :func:`trace` — capture an XLA/TPU profile of a solve for tensorboard /
  xprof (phase attribution comes from the ``jax.named_scope`` annotations
  the solvers emit: ``matvec``, ``rayleigh-ritz``, ``ortho``, ``expand``);
* :func:`phase_timings` — coarse per-phase wall breakdown measured by
  re-running the solve's building blocks outside the loop (matvec, reduced
  eigh, orthogonalization) with ``block_until_ready``;
* iteration/matvec counters already live in every result object
  (``n_iter``, ``n_matvec`` — the reference's ``nmult``, utils.f90:6).
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "wall", "phase_timings"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a block of device work: ``with trace("/tmp/prof"): solve()``.

    Produces a tensorboard/xprof trace directory.  Works on TPU and CPU.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def wall(fn, *args, **kwargs):
    """(result, seconds) with a device barrier around the call."""
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args, **kwargs))
    return out, time.perf_counter() - t0


def phase_timings(matvec, x, reps: int = 10):
    """Per-matvec wall seconds for an operator application (the reference's
    t_mv).  Compile excluded (one warmup)."""
    mv = jax.jit(matvec)
    jax.block_until_ready(mv(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = mv(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps
