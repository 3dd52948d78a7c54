"""ELLPACK scalar-sparse operator (ops/ell.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from diaglib_tpu import SolverOptions
from diaglib_tpu.ops import (
    ell_diagonal,
    ell_from_coo,
    ell_from_dense,
    ell_matvec,
    ell_to_dense,
)
from diaglib_tpu.problems import diag_precnd
from diaglib_tpu.solvers import davidson

N = 300


def _sparse_spd(key):
    """Random sparse SPD with ~8 nnz/row and a dominant diagonal."""
    rng = np.random.default_rng(7)
    k = 4 * N
    r = rng.integers(0, N, k)
    c = rng.integers(0, N, k)
    v = rng.standard_normal(k) * 0.1
    a = np.zeros((N, N))
    np.add.at(a, (r, c), v)
    a = 0.5 * (a + a.T)
    a[np.diag_indices(N)] = 2.0 + np.abs(a).sum(1) + rng.random(N)
    return jnp.asarray(a)


def test_roundtrip_and_matvec():
    a = _sparse_spd(0)
    m = ell_from_dense(a)
    np.testing.assert_allclose(np.asarray(ell_to_dense(m)), np.asarray(a),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(ell_diagonal(m)),
                               np.asarray(jnp.diagonal(a)), rtol=0, atol=0)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, N), jnp.float64)
    np.testing.assert_allclose(np.asarray(jax.jit(ell_matvec(m))(x)),
                               np.asarray(x @ a.T), rtol=0, atol=1e-12)


def test_from_coo_sums_duplicates():
    m = ell_from_coo([0, 0, 1], [1, 1, 0], [2.0, 3.0, 1.0], 4)
    d = np.asarray(ell_to_dense(m))
    assert d[0, 1] == 5.0 and d[1, 0] == 1.0
    assert m.slots == 1


def test_davidson_on_ell_operator():
    a = _sparse_spd(0)
    m = ell_from_dense(a)
    opts = SolverOptions(n_targ=4, n_max=8, max_iter=100, tol=1e-9)
    res = davidson(ell_matvec(m), diag_precnd(ell_diagonal(m)),
                   jnp.zeros((8, N)), opts, key=jax.random.PRNGKey(3))
    assert bool(res.ok)
    w = jnp.linalg.eigh(a)[0]
    np.testing.assert_allclose(np.asarray(res.eig[:4]), np.asarray(w[:4]),
                               rtol=0, atol=1e-8)
