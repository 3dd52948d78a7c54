"""On-device nonsymmetric reduced eigensolver (utils/eberlein.py).

Validates the Eberlein norm-reducing Jacobi method against dense LAPACK
eig on the matrix classes the nonsym driver's reduced Gram actually
produces (diaglib.f90:2488-2499): diagonalizable with (mostly) real
spectrum — perturbed symmetric, similarity-transformed symmetric,
explicit P diag P^-1 — plus complex-pair location (parking contract,
diaglib.f90:2377 tol_im).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from diaglib_tpu.utils.eberlein import eberlein_eig


def _real_eigs(a):
    w = scipy.linalg.eig(np.asarray(a), right=False)
    return np.sort(w[np.abs(w.imag) < 1e-9].real)


def _check(a, atol, n_want=8):
    a = np.asarray(a, np.float64)
    wr, wi, vr, vl = jax.jit(eberlein_eig)(jnp.asarray(a))
    wr, wi, vr, vl = map(np.asarray, (wr, wi, vr, vl))
    w_ref = _real_eigs(a)
    real = wi < 1e-8
    wr_real = np.sort(wr[real])
    k = min(n_want, len(w_ref), len(wr_real))
    np.testing.assert_allclose(wr_real[:k], w_ref[:k], rtol=0, atol=atol)
    # right/left eigenvector residuals for the leading real roots (the
    # two-sided Davidson consumes both, diaglib.f90:2499 jobvl+jobvr)
    cnt = 0
    for i in range(len(wr)):
        if wi[i] > 1e-8 or cnt >= n_want:
            continue
        cnt += 1
        assert np.linalg.norm(a @ vr[:, i] - wr[i] * vr[:, i]) < 50 * atol
        assert np.linalg.norm(a.T @ vl[:, i] - wr[i] * vl[:, i]) < 50 * atol


@pytest.mark.parametrize("L", [7, 24, 80])
def test_perturbed_symmetric(L):
    rng = np.random.default_rng(L)
    s = rng.standard_normal((L, L))
    s = s + s.T
    _check(s + 0.05 * rng.standard_normal((L, L)), atol=1e-11)


def test_similarity_transformed_symmetric():
    """Variant-4 shape (main.f90:1041-1092): e^-T' S e^T' with small T."""
    rng = np.random.default_rng(0)
    L = 48
    s = rng.standard_normal((L, L))
    s = s + s.T
    t = rng.standard_normal((L, L))
    t *= 0.01 / np.linalg.norm(t)
    a = scipy.linalg.expm(-t.T) @ s @ scipy.linalg.expm(t.T)
    _check(a, atol=1e-11)


def test_explicit_spectrum():
    """P diag(w) P^-1 (variant-1 shape, main.f90:951-989): recovers the
    planted spectrum exactly."""
    rng = np.random.default_rng(2)
    L = 32
    w = np.sort(rng.uniform(1.0, 50.0, L))
    p = rng.standard_normal((L, L)) + 3 * np.eye(L)
    a = p @ np.diag(w) @ np.linalg.inv(p)
    wr, wi, _, _ = jax.jit(eberlein_eig)(jnp.asarray(a))
    assert float(jnp.max(jnp.abs(wi))) < 1e-8
    np.testing.assert_allclose(np.sort(np.asarray(wr)), w, rtol=0, atol=1e-10)


def test_symmetric_degenerates_to_jacobi():
    rng = np.random.default_rng(5)
    L = 20
    s = rng.standard_normal((L, L))
    s = s + s.T
    wr, wi, vr, _ = jax.jit(eberlein_eig)(jnp.asarray(s))
    w_ref = np.linalg.eigvalsh(s)
    assert float(jnp.max(jnp.abs(wi))) < 1e-10
    np.testing.assert_allclose(np.sort(np.asarray(wr)), w_ref, rtol=0,
                               atol=1e-12)


def test_complex_pairs_located():
    """Rotation blocks hidden by an orthogonal similarity: wi must report
    |Im lambda| at the pair slots so the caller can park them."""
    rng = np.random.default_rng(7)
    blocks = [np.diag(np.arange(1.0, 9.0))]
    ims = (3.0, 7.5)
    for k, im in enumerate(ims):
        blocks.append(np.array([[20.0 + k, im], [-im, 20.0 + k]]))
    a = scipy.linalg.block_diag(*blocks)
    q = np.linalg.qr(rng.standard_normal(a.shape))[0]
    a = q.T @ a @ q
    wr, wi, _, _ = jax.jit(eberlein_eig)(jnp.asarray(a))
    wr, wi = np.asarray(wr), np.asarray(wi)
    found = np.sort(wi[wi > 1e-6])
    np.testing.assert_allclose(found, np.repeat(np.sort(ims), 2), rtol=1e-6)
    np.testing.assert_allclose(np.sort(wr[wi < 1e-6]),
                               np.arange(1.0, 9.0), rtol=0, atol=1e-9)


def test_odd_dimension_padding():
    rng = np.random.default_rng(9)
    L = 15
    s = rng.standard_normal((L, L))
    s = s + s.T
    _check(s + 0.02 * rng.standard_normal((L, L)), atol=1e-11, n_want=L)


@pytest.mark.parametrize("L,cluster,tol_w", [
    (30, None, 1e-12), (30, 1e-6, 1e-12), (30, 1e-9, 5e-10),
    (150, None, 1e-12), (150, 1e-6, 1e-12),
])
def test_accuracy_envelope_vs_dgeev(L, cluster, tol_w):
    """Pin the documented accuracy envelope (DESIGN.md §6b): eigenvalues
    match host dgeev at the 1e-13 level through L=150 with clusters to
    1e-6 gaps, degrading gracefully (~1e-11) at 1e-9 gaps — the reduced
    dgeev contract the f64 ladder stage leans on (diaglib.f90:2499)."""
    import scipy.linalg

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(L), 3)
    d = jnp.sort(jax.random.uniform(k1, (L,), jnp.float64) * 10.0)
    if cluster is not None:
        d = d.at[1].set(d[0] + cluster)
        d = d.at[2].set(d[0] + 2 * cluster)
    q, _ = jnp.linalg.qr(jax.random.normal(k2, (L, L), jnp.float64))
    s = (q * d[None, :]) @ q.T
    t = jax.random.normal(k3, (L, L), jnp.float64)
    t = t * (0.01 / jnp.linalg.norm(t))
    e = jax.scipy.linalg.expm(t)
    em = jax.scipy.linalg.expm(-t)
    a = em @ s @ e
    w_ref = np.sort(scipy.linalg.eig(np.asarray(a))[0].real)
    wr, wi, vr, vl = eberlein_eig(a)
    assert float(jnp.max(wi)) == 0.0
    np.testing.assert_allclose(np.sort(np.asarray(wr)), w_ref, rtol=0,
                               atol=tol_w * max(1.0, np.abs(w_ref).max()))
