"""Generalized Davidson tests vs the scipy dense oracle (test_geneig
protocol, main.f90:403-526)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from diaglib_tpu import SolverOptions
from diaglib_tpu.problems import (
    dense_matvec,
    diag_precnd,
    metric_matrix,
    symm_matrix,
)
from diaglib_tpu.solvers import gen_david

N = 300
N_WANT = 6
N_EIG = min(2 * N_WANT, N_WANT + 5)
TOL = 1e-8


@pytest.fixture(scope="module")
def gen_problem():
    a = symm_matrix(N)
    s = metric_matrix(N, jax.random.PRNGKey(42))
    w, v = scipy.linalg.eigh(np.asarray(a), np.asarray(s))
    return a, s, jnp.asarray(w), jnp.asarray(v)


def test_gen_david_converges(gen_problem):
    a, s, dense_w, _ = gen_problem
    opts = SolverOptions(n_targ=N_WANT, n_max=N_EIG, max_iter=200, tol=TOL)
    res = gen_david(dense_matvec(a), diag_precnd(jnp.diagonal(a)),
                    dense_matvec(s), jnp.zeros((N_EIG, N), jnp.float64),
                    opts, key=jax.random.PRNGKey(9))
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.eig[:N_WANT]),
                               np.asarray(dense_w[:N_WANT]), rtol=0, atol=1e-6)
    # A v = w B v residuals
    for i in range(N_WANT):
        v = res.evec[i]
        r = a @ v - res.eig[i] * (s @ v)
        assert float(jnp.linalg.norm(r)) / np.sqrt(N) < 100 * TOL


def test_gen_david_restart_path(gen_problem):
    a, s, dense_w, _ = gen_problem
    opts = SolverOptions(n_targ=3, n_max=4, max_iter=300, tol=TOL, max_dav=10)
    res = gen_david(dense_matvec(a), diag_precnd(jnp.diagonal(a)),
                    dense_matvec(s), jnp.zeros((4, N), jnp.float64),
                    opts, key=jax.random.PRNGKey(13))
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.eig[:3]),
                               np.asarray(dense_w[:3]), rtol=0, atol=1e-6)


def test_gen_david_b_orthonormal_space(gen_problem):
    """Computed eigenvectors should be close to B-orthonormal."""
    a, s, _, _ = gen_problem
    opts = SolverOptions(n_targ=N_WANT, n_max=N_EIG, max_iter=200, tol=TOL)
    res = gen_david(dense_matvec(a), diag_precnd(jnp.diagonal(a)),
                    dense_matvec(s), jnp.zeros((N_EIG, N), jnp.float64),
                    opts, key=jax.random.PRNGKey(9))
    g = res.evec @ s @ res.evec.T
    # converged roots (the prefix) must be B-orthonormal
    k = int(jnp.sum(res.done))
    np.testing.assert_allclose(np.asarray(g[:k, :k]), np.eye(k), atol=1e-6)


def test_gen_david_rank_deficient_metric_flags_ortho():
    """A rank-deficient metric B breaks the guess's metric Cholesky; the
    SVD rescue keeps the run alive but the event must surface as
    ortho_ok=False on the result (the reference hard-stops on this dpotrf
    failure, diaglib.f90:3131-3138)."""
    n, k = 64, 4
    a = symm_matrix(n)
    # PSD metric of rank 2 < n_max=4: the (k, k) guess metric is singular
    m = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (2, n)))
    s = jnp.asarray(m.T @ m)
    opts = SolverOptions(n_targ=2, n_max=k, max_iter=3, tol=1e-8)
    res = gen_david(dense_matvec(a), diag_precnd(jnp.diagonal(a)),
                    dense_matvec(s), jnp.zeros((k, n), jnp.float64),
                    opts, key=jax.random.PRNGKey(5))
    assert not bool(res.ortho_ok)
