"""LOBPCG tests vs dense oracles (standard and generalized paths).

Mirrors test_symm / test_geneig (main.f90:283-526): same matrices, same
tolerances, dense LAPACK (scipy) as oracle for the generalized problem.
"""

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
from diaglib_tpu.solvers import lobpcg

N = 300
N_WANT = 6
N_EIG = min(2 * N_WANT, N_WANT + 5)
TOL = 1e-8


@pytest.fixture(scope="module")
def sym_problem():
    a = symm_matrix(N)
    w, v = jnp.linalg.eigh(a)
    return a, w, v


@pytest.fixture(scope="module")
def gen_problem():
    a = symm_matrix(N)
    s = metric_matrix(N, jax.random.PRNGKey(42))
    w, v = scipy.linalg.eigh(np.asarray(a), np.asarray(s))
    return a, s, jnp.asarray(w), jnp.asarray(v)


def test_lobpcg_standard(sym_problem):
    a, dense_w, dense_v = sym_problem
    opts = SolverOptions(n_targ=N_WANT, n_max=N_EIG, max_iter=200, tol=TOL)
    res = lobpcg(dense_matvec(a), diag_precnd(jnp.diagonal(a)),
                 jnp.zeros((N_EIG, N), jnp.float64), opts,
                 key=jax.random.PRNGKey(1))
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.eig[:N_WANT]),
                               np.asarray(dense_w[:N_WANT]), rtol=0, atol=1e-7)
    for i in range(N_WANT):
        assert abs(float(res.evec[i] @ dense_v[:, i])) > 1 - 1e-8


def test_lobpcg_standard_with_shift(sym_problem):
    a, dense_w, _ = sym_problem
    opts = SolverOptions(n_targ=4, n_max=8, max_iter=200, tol=TOL, shift=2.5)
    res = lobpcg(dense_matvec(a), diag_precnd(jnp.diagonal(a)),
                 jnp.zeros((8, N), jnp.float64), opts,
                 key=jax.random.PRNGKey(1))
    assert bool(res.ok)
    # shift is internal; reported eigenvalues must be the unshifted ones
    np.testing.assert_allclose(np.asarray(res.eig[:4]),
                               np.asarray(dense_w[:4]), rtol=0, atol=1e-7)


def test_lobpcg_generalized(gen_problem):
    a, s, dense_w, dense_v = gen_problem
    opts = SolverOptions(n_targ=N_WANT, n_max=N_EIG, max_iter=300, tol=TOL)
    res = lobpcg(dense_matvec(a), diag_precnd(jnp.diagonal(a)),
                 jnp.zeros((N_EIG, N), jnp.float64), opts,
                 bvec=dense_matvec(s), key=jax.random.PRNGKey(5))
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.eig[:N_WANT]),
                               np.asarray(dense_w[:N_WANT]), rtol=0, atol=1e-6)
    # B-orthonormality of the computed eigenvectors
    sv = res.evec @ s @ res.evec.T
    np.testing.assert_allclose(np.asarray(sv), np.eye(N_EIG), atol=1e-7)
    # residuals A v = w B v
    for i in range(N_WANT):
        v = res.evec[i]
        r = a @ v - res.eig[i] * (s @ v)
        assert float(jnp.linalg.norm(r)) / np.sqrt(N) < 100 * TOL


def test_lobpcg_warm_start(sym_problem):
    a, dense_w, dense_v = sym_problem
    opts = SolverOptions(n_targ=N_WANT, n_max=N_EIG, max_iter=100, tol=TOL)
    res = lobpcg(dense_matvec(a), diag_precnd(jnp.diagonal(a)),
                 dense_v[:, :N_EIG].T, opts)
    assert bool(res.ok)
    assert int(res.n_iter) <= 5


def test_lobpcg_jit(sym_problem):
    a, _, _ = sym_problem
    opts = SolverOptions(n_targ=4, n_max=6, max_iter=200, tol=TOL)
    mv, pc = dense_matvec(a), diag_precnd(jnp.diagonal(a))
    run = jax.jit(lambda g: lobpcg(mv, pc, g, opts, key=jax.random.PRNGKey(2)))
    res = run(jnp.zeros((6, N), jnp.float64))
    assert bool(res.ok)
