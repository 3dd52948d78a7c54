"""End-to-end tests for the Davidson-Liu driver vs a dense eigh oracle.

Mirrors the reference's test_symm protocol (main.f90:283-401): same matrix,
same tolerances (rms < 1e-8, max < 1e-7), extra roots n_eig = n_want + 5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diaglib_tpu import SolverOptions
from diaglib_tpu.problems import dense_matvec, diag_precnd, symm_matrix
from diaglib_tpu.solvers import davidson

N = 300
N_WANT = 6
N_EIG = min(2 * N_WANT, N_WANT + 5)
TOL = 1e-8


@pytest.fixture(scope="module")
def problem():
    a = symm_matrix(N)
    dense_w, dense_v = jnp.linalg.eigh(a)
    return a, dense_w, dense_v


def _residual_check(a, res, n_want):
    for i in range(n_want):
        v = res.evec[i]
        r = a @ v - res.eig[i] * v
        assert float(jnp.linalg.norm(r)) / np.sqrt(N) < 10 * TOL


def test_davidson_converges_random_guess(problem):
    a, dense_w, _ = problem
    opts = SolverOptions(n_targ=N_WANT, n_max=N_EIG, max_iter=100, tol=TOL)
    guess = jnp.zeros((N_EIG, N), jnp.float64)  # triggers random check_guess
    res = davidson(dense_matvec(a), diag_precnd(jnp.diagonal(a)), guess, opts,
                   key=jax.random.PRNGKey(7))
    assert bool(res.ok)
    np.testing.assert_allclose(
        np.asarray(res.eig[:N_WANT]), np.asarray(dense_w[:N_WANT]),
        rtol=0, atol=1e-7,
    )
    _residual_check(a, res, N_WANT)


def test_davidson_eigenvectors_match_dense(problem):
    a, dense_w, dense_v = problem
    opts = SolverOptions(n_targ=N_WANT, n_max=N_EIG, max_iter=100, tol=TOL)
    guess = jnp.zeros((N_EIG, N), jnp.float64)
    res = davidson(dense_matvec(a), diag_precnd(jnp.diagonal(a)), guess, opts,
                   key=jax.random.PRNGKey(3))
    assert bool(res.ok)
    for i in range(N_WANT):
        overlap = abs(float(res.evec[i] @ dense_v[:, i]))
        assert overlap > 1 - 1e-9


def test_davidson_restart_path(problem):
    """Force restarts with a tiny max_dav (effective dim_dav = 10)."""
    a, dense_w, _ = problem
    opts = SolverOptions(n_targ=4, n_max=5, max_iter=200, tol=TOL, max_dav=10)
    guess = jnp.zeros((5, N), jnp.float64)
    res = davidson(dense_matvec(a), diag_precnd(jnp.diagonal(a)), guess, opts,
                   key=jax.random.PRNGKey(11))
    assert bool(res.ok)
    np.testing.assert_allclose(
        np.asarray(res.eig[:4]), np.asarray(dense_w[:4]), rtol=0, atol=1e-7
    )


def test_davidson_warm_start_converges_fast(problem):
    """Warm-starting from near-exact eigenvectors must converge in a few
    iterations (the reference accepts a guess in evec, diaglib.f90:1527)."""
    a, dense_w, dense_v = problem
    opts = SolverOptions(n_targ=N_WANT, n_max=N_EIG, max_iter=100, tol=TOL)
    guess = dense_v[:, :N_EIG].T
    res = davidson(dense_matvec(a), diag_precnd(jnp.diagonal(a)), guess, opts)
    assert bool(res.ok)
    assert int(res.n_iter) <= 5


def test_davidson_history_shapes(problem):
    a, _, _ = problem
    opts = SolverOptions(n_targ=N_WANT, n_max=N_EIG, max_iter=100, tol=TOL)
    guess = jnp.zeros((N_EIG, N), jnp.float64)
    res = davidson(dense_matvec(a), diag_precnd(jnp.diagonal(a)), guess, opts,
                   key=jax.random.PRNGKey(0))
    it = int(res.n_iter)
    assert res.rms_history.shape == (100, N_EIG)
    # iterations past convergence remain inf
    assert np.all(np.isinf(np.asarray(res.rms_history[it:])))
    # locking is a contiguous prefix
    done = np.asarray(res.done)
    first_false = int(np.argmin(done)) if not done.all() else len(done)
    assert not done[first_false:].any() or done.all()


def test_davidson_ortho_failure_sets_flag():
    """A problem too small for its block size makes expansion impossible
    (4 existing + 4 new vectors cannot be mutually orthogonal in R^6):
    the solver must surface the contaminated basis via ortho_ok=False
    (reference semantics: hard stop at diaglib.f90:3568)."""
    n = 6
    a = symm_matrix(n)
    opts = SolverOptions(n_targ=4, n_max=4, max_iter=5, tol=1e-12)
    guess = jnp.zeros((4, n), jnp.float64)
    res = davidson(dense_matvec(a), diag_precnd(jnp.diagonal(a)), guess, opts,
                   key=jax.random.PRNGKey(2))
    assert not bool(res.ortho_ok)


def test_davidson_healthy_solve_reports_ortho_ok(problem):
    a, _, _ = problem
    opts = SolverOptions(n_targ=N_WANT, n_max=N_EIG, max_iter=100, tol=TOL)
    guess = jnp.zeros((N_EIG, N), jnp.float64)
    res = davidson(dense_matvec(a), diag_precnd(jnp.diagonal(a)), guess, opts,
                   key=jax.random.PRNGKey(21))
    assert bool(res.ok) and bool(res.ortho_ok)


def test_davidson_jit_compiles_once(problem):
    a, _, _ = problem
    opts = SolverOptions(n_targ=N_WANT, n_max=N_EIG, max_iter=100, tol=TOL)
    mv = dense_matvec(a)
    pc = diag_precnd(jnp.diagonal(a))
    solver = jax.jit(lambda g: davidson(mv, pc, g, opts, key=jax.random.PRNGKey(5)))
    guess = jnp.zeros((N_EIG, N), jnp.float64)
    res = solver(guess)
    assert bool(res.ok)
