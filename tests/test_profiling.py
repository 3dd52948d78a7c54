"""Tracing/profiling helpers (profiling.py) and named_scope annotations."""

import os

import jax
import jax.numpy as jnp

from diaglib_tpu import SolverOptions
from diaglib_tpu.problems import dense_matvec, diag_precnd, symm_matrix
from diaglib_tpu.profiling import phase_timings, trace, wall
from diaglib_tpu.solvers import davidson


def test_wall_and_phase_timings():
    a = symm_matrix(128)
    x = jnp.ones((4, 128))
    dt = phase_timings(dense_matvec(a), x, reps=3)
    assert dt > 0
    res, secs = wall(lambda: dense_matvec(a)(x))
    assert secs > 0 and res.shape == (4, 128)


def test_trace_writes_profile(tmp_path):
    a = symm_matrix(128)
    opts = SolverOptions(n_targ=2, n_max=4, max_iter=30, tol=1e-6)
    with trace(str(tmp_path)):
        res = davidson(dense_matvec(a), diag_precnd(jnp.diagonal(a)),
                       jnp.zeros((4, 128)), opts, key=jax.random.PRNGKey(0))
        jax.block_until_ready(res.eig)
    found = any(f.endswith(".xplane.pb") for _, _, fs in os.walk(tmp_path)
                for f in fs)
    assert found, "no xplane profile written"


def test_named_scopes_in_hlo():
    """Phase scopes must survive into the compiled module's metadata."""
    a = symm_matrix(64)
    opts = SolverOptions(n_targ=2, n_max=4, max_iter=10, tol=1e-6)
    fn = jax.jit(lambda g: davidson(dense_matvec(a),
                                    diag_precnd(jnp.diagonal(a)), g, opts))
    txt = fn.lower(jnp.zeros((4, 64))).as_text(debug_info=True)
    assert "rayleigh-ritz" in txt and "expand-ortho" in txt
