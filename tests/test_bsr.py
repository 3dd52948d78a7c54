"""BSR operator tests: dense agreement, Pallas-interpret kernel agreement,
solver integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diaglib_tpu import SolverOptions
from diaglib_tpu.ops import (
    bsr_from_dense,
    bsr_matvec,
    bsr_to_dense,
    random_bsr_spd,
)
from diaglib_tpu.ops.bsr import _spmm_pallas, _spmm_reference
from diaglib_tpu.problems import diag_precnd
from diaglib_tpu.solvers import davidson

KEY = jax.random.PRNGKey(0)


def test_bsr_roundtrip():
    n, B = 64, 16
    dense = np.zeros((n, n))
    rng = np.random.default_rng(0)
    for (r, c) in [(0, 0), (1, 1), (2, 2), (3, 3), (0, 2), (2, 0)]:
        dense[r * B:(r + 1) * B, c * B:(c + 1) * B] = rng.standard_normal((B, B))
    m = bsr_from_dense(dense, B)
    np.testing.assert_allclose(np.asarray(bsr_to_dense(m)), dense, atol=0)


def test_bsr_reference_matvec_matches_dense():
    m = random_bsr_spd(256, 32, 3, KEY, dtype=jnp.float64)
    dense = np.asarray(bsr_to_dense(m))
    np.testing.assert_allclose(dense, dense.T, atol=1e-12)  # symmetric
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 256), jnp.float64)
    y = _spmm_reference(m, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ dense.T,
                               rtol=1e-12, atol=1e-12)


def test_bsr_pallas_interpret_matches_reference():
    m = random_bsr_spd(256, 32, 3, KEY, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 256), jnp.float32)
    y_ref = _spmm_reference(m, x)
    y_pal = _spmm_pallas(m, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_bsr_spd_and_davidson():
    """End-to-end: Davidson on the BSR operator vs dense eigh."""
    m = random_bsr_spd(512, 32, 3, KEY, dtype=jnp.float64)
    dense = bsr_to_dense(m)
    w = jnp.linalg.eigh(dense)[0]
    diag = jnp.diagonal(dense)
    opts = SolverOptions(n_targ=4, n_max=8, max_iter=200, tol=1e-8, max_dav=10)
    res = davidson(bsr_matvec(m), diag_precnd(diag),
                   jnp.zeros((8, 512), jnp.float64), opts,
                   key=jax.random.PRNGKey(5))
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.eig[:4]), np.asarray(w[:4]),
                               rtol=0, atol=1e-7)


def test_empty_block_row_returns_zeros():
    """A block row with no entries must produce zero output columns — the
    Pallas kernel never writes an uncovered tile (uninitialized VMEM), so
    bsr_from_dense pads empty rows with a zero block (an output-side mask
    was tried and reverted: it perturbed XLA fusion inside solver loops)."""
    n, B = 8 * 16, 16
    dense = np.zeros((n, n))
    rng = np.random.default_rng(0)
    for r in (0, 2, 3, 5, 7):  # rows 1, 4, 6 left empty
        dense[r*B:(r+1)*B, r*B:(r+1)*B] = rng.standard_normal((B, B))
    m = bsr_from_dense(jnp.asarray(dense, jnp.float32), B)
    x = jnp.asarray(rng.standard_normal((3, n)), jnp.float32)
    y_ref = np.asarray(x, np.float64) @ dense.T
    from diaglib_tpu.ops.bsr import _spmm_pallas
    y = _spmm_pallas(m, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y, np.float64), y_ref,
                               atol=1e-4 * max(1.0, np.max(np.abs(y_ref))))
    assert float(jnp.max(jnp.abs(y[:, B:2*B]))) == 0.0
