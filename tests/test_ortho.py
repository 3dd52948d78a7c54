"""Property tests for the orthogonalization kernel library (SURVEY.md §2.2).

Oracle thresholds follow the reference: orthonormality to ~2*eps growth
(tol_ortho, diaglib.f90:151), with test tolerances slightly relaxed for
accumulation over n.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diaglib_tpu.ortho import (
    b_ortho,
    b_ortho_vs_x,
    biortho_vs_x,
    norm_est,
    ortho_cd,
    ortho_qr,
    ortho_vs_x,
    svd_biortho,
)
from diaglib_tpu.utils import masked_eigh, masked_svd, prefix_mask

KEY = jax.random.PRNGKey(0)
N = 257  # deliberately not lane-aligned
TOL = 1e-12


def _rand(key, k, n=N, scale=1.0):
    return scale * jax.random.normal(key, (k, n), dtype=jnp.float64)


def _mask_rows(u, mask):
    return jnp.where(mask[:, None], u, 0.0)


def test_norm_est_bounds_triangular_norm():
    k = 12
    a = np.tril(np.random.default_rng(0).normal(size=(k, k)))
    est = float(norm_est(jnp.asarray(a)))
    true = np.linalg.norm(a, 2)
    assert est >= true - 1e-12
    # tight enough: within the documented  max|d| + ||o||_F  bound
    assert est <= np.max(np.abs(np.diag(a))) + np.linalg.norm(np.tril(a, -1)) + 1e-12


def test_ortho_cd_orthonormalizes():
    u = _rand(KEY, 8)
    out, growth, ok = ortho_cd(u)
    assert bool(ok)
    g = out @ out.T
    assert float(jnp.max(jnp.abs(g - jnp.eye(8)))) < TOL
    assert float(growth) > 0.0
    # same span
    c = jnp.linalg.lstsq(np.asarray(out).T, np.asarray(u).T)[0]
    assert float(jnp.max(jnp.abs(out.T @ c - u.T))) < 1e-8


def test_ortho_cd_masked_rows_stay_zero():
    k = 8
    mask = prefix_mask(k, 5)
    u = _mask_rows(_rand(KEY, k), mask)
    out, growth, ok = ortho_cd(u, mask)
    assert bool(ok)
    assert float(jnp.max(jnp.abs(out[5:]))) == 0.0
    g = out[:5] @ out[:5].T
    assert float(jnp.max(jnp.abs(g - jnp.eye(5)))) < TOL


def test_ortho_cd_level_shift_on_rank_deficiency():
    # nearly dependent vectors force the shifted-Cholesky retry ladder
    k = 6
    base = _rand(KEY, 3)
    dup = jnp.concatenate([base, base + 1e-14 * _rand(jax.random.PRNGKey(1), 3)])
    out, growth, ok = ortho_cd(dup)
    g = out @ out.T
    # either it succeeded (orthonormal) or it reported failure honestly
    if bool(ok):
        assert float(jnp.max(jnp.abs(g - jnp.eye(k)))) < 1e-8


def test_ortho_qr_masked():
    k = 7
    mask = prefix_mask(k, 4)
    u = _mask_rows(_rand(KEY, k), mask)
    out = ortho_qr(u, mask)
    assert float(jnp.max(jnp.abs(out[4:]))) == 0.0
    g = out[:4] @ out[:4].T
    assert float(jnp.max(jnp.abs(g - jnp.eye(4)))) < TOL


def test_ortho_qr_transforms_second_set():
    k = 5
    a = jax.random.normal(jax.random.PRNGKey(3), (N, N), dtype=jnp.float64)
    a = (a + a.T) / 2
    u = _rand(KEY, k)
    au = u @ a  # rows: A applied to each row vector (A symmetric)
    q, aq = ortho_qr(u, extra=au)
    # aq must equal A @ q rows
    assert float(jnp.max(jnp.abs(q @ a - aq))) < 1e-8


def test_ortho_vs_x():
    x, _, _ = ortho_cd(_rand(KEY, 6))
    u = _rand(jax.random.PRNGKey(7), 4) + 0.5 * x[:4]
    u_out, ok = ortho_vs_x(x, u)
    assert bool(ok)
    assert float(jnp.max(jnp.abs(x @ u_out.T))) < 1e-12
    g = u_out @ u_out.T
    assert float(jnp.max(jnp.abs(g - jnp.eye(4)))) < TOL


def test_ortho_vs_x_masked():
    xmask = prefix_mask(6, 3)
    x = _mask_rows(_rand(KEY, 6), xmask)
    x, _, _ = ortho_cd(x, xmask)
    umask = prefix_mask(4, 2)
    u = _mask_rows(_rand(jax.random.PRNGKey(9), 4), umask)
    u_out, ok = ortho_vs_x(x, u, xmask=xmask, umask=umask)
    assert float(jnp.max(jnp.abs(x @ u_out.T))) < 1e-12
    assert float(jnp.max(jnp.abs(u_out[2:]))) == 0.0
    g = u_out[:2] @ u_out[:2].T
    assert float(jnp.max(jnp.abs(g - jnp.eye(2)))) < TOL


@pytest.fixture
def spd_metric():
    m = jax.random.normal(jax.random.PRNGKey(11), (N, N), dtype=jnp.float64)
    return m.T @ m / N + jnp.eye(N)


def test_b_ortho(spd_metric):
    u = _rand(KEY, 5)
    bu = u @ spd_metric
    u_out, bu_out, ok = b_ortho(u, bu)
    assert bool(ok)  # clean Cholesky, no SVD rescue
    g = u_out @ bu_out.T
    assert float(jnp.max(jnp.abs(g - jnp.eye(5)))) < 1e-10
    assert float(jnp.max(jnp.abs(u_out @ spd_metric - bu_out))) < 1e-10


def test_b_ortho_rescue_reports_not_ok(spd_metric):
    """A rank-deficient block breaks the metric Cholesky; the SVD rescue
    must keep the basis usable AND report ok=False (the reference
    hard-stops on this dpotrf failure, diaglib.f90:3131-3138)."""
    u = _rand(KEY, 5)
    u = u.at[3].set(u[0] + 1e-16 * u[1])  # duplicate direction
    u = u.at[4].set(u[1])
    bu = u @ spd_metric
    u_out, bu_out, ok = b_ortho(u, bu)
    assert not bool(ok)
    assert bool(jnp.all(jnp.isfinite(u_out)))
    # the rescued B-Gram is a projector on the surviving subspace: its
    # eigenvalues are 1 (kept directions) and 0 (dropped duplicates)
    g = np.asarray(u_out @ bu_out.T)
    ev = np.sort(np.linalg.eigvalsh(0.5 * (g + g.T)))
    assert np.all(np.abs(ev[-3:] - 1.0) < 1e-8)
    assert np.all(np.abs(ev[:2]) < 1e-8)


def test_b_ortho_vs_x(spd_metric):
    x = _rand(KEY, 5)
    bx = x @ spd_metric
    x, bx, _ = b_ortho(x, bx)
    u = _rand(jax.random.PRNGKey(13), 3)
    u_out, ok = b_ortho_vs_x(x, bx, u)
    # B-orthogonal to x and orthonormal (plain) among themselves
    assert float(jnp.max(jnp.abs(bx @ u_out.T))) < 1e-11
    g = u_out @ u_out.T
    assert float(jnp.max(jnp.abs(g - jnp.eye(3)))) < TOL


def test_svd_biortho():
    ul = _rand(KEY, 4)
    ur = _rand(jax.random.PRNGKey(17), 4) + 0.8 * ul
    ul_out, ur_out = svd_biortho(ul, ur)
    g = ul_out @ ur_out.T
    assert float(jnp.max(jnp.abs(g - jnp.eye(4)))) < 1e-10


def test_svd_biortho_masked():
    mask = prefix_mask(5, 3)
    ul = _mask_rows(_rand(KEY, 5), mask)
    ur = _mask_rows(_rand(jax.random.PRNGKey(19), 5), mask)
    ul_out, ur_out = svd_biortho(ul, ur, mask)
    g = ul_out[:3] @ ur_out[:3].T
    assert float(jnp.max(jnp.abs(g - jnp.eye(3)))) < 1e-10
    assert float(jnp.max(jnp.abs(ul_out[3:]))) == 0.0


def test_biortho_vs_x():
    xl, xr = svd_biortho(_rand(KEY, 4), _rand(jax.random.PRNGKey(23), 4))
    ul = _rand(jax.random.PRNGKey(29), 3)
    ur = _rand(jax.random.PRNGKey(31), 3)
    ul_out, ur_out, done = biortho_vs_x(xl, xr, ul, ur)
    assert float(jnp.max(jnp.abs(ul_out @ ur_out.T - jnp.eye(3)))) < 1e-10
    assert float(jnp.max(jnp.abs(xl @ ur_out.T))) < 1e-10
    assert float(jnp.max(jnp.abs(xr @ ul_out.T))) < 1e-10
    assert bool(done)


def test_ortho_cd_reports_exact_rank_deficiency():
    """Exactly duplicated rows can never be orthonormalized by the
    shift-ladder path; ortho_cd must report ok=False (the condition its
    callers turn into the QR fallback, diaglib.f90:3533-3549)."""
    base = _rand(KEY, 3)
    dup = jnp.concatenate([base, base])
    out, growth, ok = ortho_cd(dup)
    assert not bool(ok)


def test_ortho_vs_x_impossible_reports_failure():
    """When X already spans the whole space, no block can be made both
    orthonormal and orthogonal to X: the iterated projection must give up
    and report done=False (the reference hard-stops here,
    diaglib.f90:3568)."""
    n = 4
    x = jnp.eye(n, dtype=jnp.float64)  # spans all of R^n
    u = jax.random.normal(jax.random.PRNGKey(37), (2, n), dtype=jnp.float64)
    u_out, done = ortho_vs_x(x, u)
    assert not bool(done)


def test_masked_eigh_matches_dense():
    k, valid = 10, 6
    rng = np.random.default_rng(5)
    a = rng.normal(size=(k, k))
    a = (a + a.T) / 2
    mask = prefix_mask(k, valid)
    w, v = masked_eigh(jnp.asarray(a), mask)
    w_ref = np.linalg.eigvalsh(a[:valid, :valid])
    np.testing.assert_allclose(np.asarray(w[:valid]), w_ref, atol=1e-12)
    # genuine eigenvectors vanish on masked rows
    assert float(jnp.max(jnp.abs(v[valid:, :valid]))) < 1e-12


def test_masked_eigh_interior_mask():
    k = 8
    rng = np.random.default_rng(6)
    a = rng.normal(size=(k, k))
    a = (a + a.T) / 2
    mask = jnp.asarray([True, True, False, True, False, True, True, False])
    idx = np.where(np.asarray(mask))[0]
    w, v = masked_eigh(jnp.asarray(a), mask)
    w_ref = np.linalg.eigvalsh(a[np.ix_(idx, idx)])
    np.testing.assert_allclose(np.asarray(w[: len(idx)]), w_ref, atol=1e-12)


def test_masked_svd_matches_dense():
    k, valid = 9, 5
    rng = np.random.default_rng(7)
    a = rng.normal(size=(k, k))
    mask = prefix_mask(k, valid)
    u, s, vt = masked_svd(jnp.asarray(a), mask)
    s_ref = np.linalg.svd(a[:valid, :valid], compute_uv=False)
    np.testing.assert_allclose(np.asarray(s[:valid]), s_ref, atol=1e-12)
    rec = (u * s) @ vt
    np.testing.assert_allclose(
        np.asarray(rec[:valid, :valid]), a[:valid, :valid], atol=1e-12
    )


def test_ortho_inside_jit():
    @jax.jit
    def run(u):
        out, growth, ok = ortho_cd(u)
        return out, ok

    u = _rand(KEY, 6)
    out, ok = run(u)
    assert bool(ok)
    assert float(jnp.max(jnp.abs(out @ out.T - jnp.eye(6)))) < TOL
