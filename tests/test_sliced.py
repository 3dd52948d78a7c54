"""Integer-sliced (Ozaki) contraction and sliced-BSR operator tests.

The slicing scheme replaces the reference's f64 dgemm/matvec work
(diaglib.f90:1691, 1717-1729, 3543-3544) with exact int8-MXU slice
products; these tests pin the accuracy claims against dense f64 oracles.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diaglib_tpu import SolverOptions
from diaglib_tpu.ops.bsr import bsr_to_dense, random_bsr_spd
from diaglib_tpu.ops.bsr_sliced import slice_bsr, sliced_bsr_matvec
from diaglib_tpu.ops.slicing import (
    slice_operand,
    sliced_mm,
    sliced_mmT,
    sliced_mTm,
)
from diaglib_tpu.problems import diag_precnd
from diaglib_tpu.solvers import davidson

KEY = jax.random.PRNGKey(0)


def _rand(key, shape, scale=1.0):
    return scale * jax.random.normal(key, shape, jnp.float64)


def test_slice_operand_reconstructs_f64():
    x = _rand(KEY, (16, 64)) * jnp.exp(
        4.0 * jax.random.normal(jax.random.PRNGKey(5), (16, 64), jnp.float64))
    sl, sc = slice_operand(x, axis=-1)
    rec = jnp.tensordot(
        jnp.asarray([2.0 ** (-6 * (i + 1)) for i in range(sl.shape[0])],
                    jnp.float64),
        sl.astype(jnp.float64), axes=1) * sc
    # truncation below ~2^-54 of the per-row scale (round-half per level x
    # three split components)
    err = np.max(np.abs(np.asarray(rec - x)), axis=-1)
    bound = 2.0 ** (-53) * np.asarray(sc)[:, 0]
    assert np.all(err <= bound + 1e-300)


@pytest.mark.parametrize("f", [sliced_mm, sliced_mmT, sliced_mTm])
def test_sliced_gemm_matches_f64(f):
    ka, kb = jax.random.split(jax.random.PRNGKey(1))
    a = _rand(ka, (48, 96))
    b = _rand(kb, (48, 96))
    if f is sliced_mm:
        b2 = _rand(kb, (96, 32))
        ref = np.asarray(a, np.float64) @ np.asarray(b2, np.float64)
        out = f(a, b2)
    elif f is sliced_mmT:
        ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64).T
        out = f(a, b)
    else:
        ref = np.asarray(a, np.float64).T @ np.asarray(b, np.float64)
        out = f(a, b)
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-14 * scale)


def test_sliced_gemm_correlated_operands():
    """The case plain f32/bf16 splitting gets wrong: strongly value-
    correlated operands (Gram matrices of nearly-parallel vectors)."""
    a = _rand(KEY, (8, 512))
    a = a.at[1:].set(a[0] + 1e-9 * a[1:])  # nearly identical rows
    g_ref = np.asarray(a, np.float64) @ np.asarray(a, np.float64).T
    g = sliced_mmT(a, a)
    np.testing.assert_allclose(np.asarray(g), g_ref,
                               atol=1e-14 * np.max(np.abs(g_ref)))


def test_sliced_gemm_overflow_guard():
    a = jnp.zeros((4, 1 << 18), jnp.float64)
    with pytest.raises(ValueError, match="overflow"):
        sliced_mm(a, a.T)


def _small_sliced(dtype=jnp.float32):
    m = random_bsr_spd(256, 64, 3, KEY, dtype=dtype)
    dense = np.asarray(bsr_to_dense(m), np.float64)
    return m, slice_bsr(m), dense


def test_sliced_bsr_f64_tier_matches_dense():
    _, sm, dense = _small_sliced()
    x = _rand(jax.random.PRNGKey(2), (8, 256))
    y = sliced_bsr_matvec(sm, interpret=True)(x)
    ref = np.asarray(x) @ dense.T
    np.testing.assert_allclose(np.asarray(y), ref,
                               atol=1e-14 * np.max(np.abs(ref)))
    assert y.dtype == jnp.float64


def test_sliced_bsr_f32_tier_beats_plain_f32():
    _, sm, dense = _small_sliced()
    x = _rand(jax.random.PRNGKey(3), (8, 256)).astype(jnp.float32)
    y = sliced_bsr_matvec(sm, dtype=jnp.float32, interpret=True)(x)
    ref = np.asarray(x, np.float64) @ dense.T
    rel = np.max(np.abs(np.asarray(y, np.float64) - ref)) / np.max(np.abs(ref))
    assert y.dtype == jnp.float32
    assert rel < 2.0 ** (-17)


def test_sliced_bsr_f64_source():
    """f64 source blocks: the deep planes carry the full 53-bit mantissa."""
    m, _, _ = _small_sliced()
    m64 = dataclasses.replace(m, blocks_t=m.blocks_t.astype(jnp.float64))
    sm = slice_bsr(m64)
    dense = np.asarray(bsr_to_dense(m64), np.float64)
    x = _rand(jax.random.PRNGKey(4), (4, 256))
    y = sliced_bsr_matvec(sm, interpret=True)(x)
    ref = np.asarray(x) @ dense.T
    np.testing.assert_allclose(np.asarray(y), ref,
                               atol=1e-14 * np.max(np.abs(ref)))


def test_sliced_bsr_diagonal_exact():
    m, sm, dense = _small_sliced()
    np.testing.assert_allclose(np.asarray(sm.diagonal), np.diagonal(dense),
                               atol=0)


def test_davidson_on_sliced_bsr():
    """End-to-end: full-accuracy Davidson on the sliced operator."""
    _, sm, dense = _small_sliced()
    w_ref = np.linalg.eigh(dense)[0]
    opts = SolverOptions(n_targ=3, n_max=6, max_iter=120, tol=1e-9,
                         max_dav=10)
    res = davidson(sliced_bsr_matvec(sm, interpret=True),
                   diag_precnd(sm.diagonal),
                   jnp.zeros((6, 256), jnp.float64), opts,
                   key=jax.random.PRNGKey(7))
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.eig[:3]), w_ref[:3],
                               rtol=0, atol=1e-8 * max(1.0, abs(w_ref[0])))


def test_mm_sliced_dispatch(monkeypatch):
    """utils/mm.py routes long f64 contractions to the sliced path when
    DIAGLIB_TPU_SLICED_MM=always (the TPU auto-dispatch, testable on CPU)."""
    from diaglib_tpu.utils import mm as mmmod

    ka, kb = jax.random.split(jax.random.PRNGKey(9))
    a = _rand(ka, (7, 8192))
    b = _rand(kb, (5, 8192))
    c = _rand(kb, (8192, 6))
    monkeypatch.setenv("DIAGLIB_TPU_SLICED_MM", "always")
    got_T = mmmod.mmT(a, b)
    got = mmmod.mm(a, c)
    got_mTm = mmmod.mTm(a.T, b.T)
    monkeypatch.setenv("DIAGLIB_TPU_SLICED_MM", "never")
    ref_T = mmmod.mmT(a, b)
    ref = mmmod.mm(a, c)
    ref_mTm = mmmod.mTm(a.T, b.T)
    for g, r in [(got_T, ref_T), (got, ref), (got_mTm, ref_mTm)]:
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-13 * np.max(np.abs(np.asarray(r))))


def test_mm_sliced_dispatch_overflow_falls_back(monkeypatch):
    """k beyond the int32-exactness bound must not dispatch (even 'always')."""
    from diaglib_tpu.utils import mm as mmmod

    monkeypatch.setenv("DIAGLIB_TPU_SLICED_MM", "always")
    a = jnp.ones((2, 1 << 18), jnp.float64)
    out = mmmod.mmT(a, a)  # would raise in sliced_mmT; must take chunked path
    np.testing.assert_allclose(np.asarray(out), float(1 << 18))


def test_sliced_empty_block_row_returns_zeros():
    """Same uninitialized-tile hazard as the plain BSR kernel: empty block
    rows must come back exactly zero from the sliced matvec (guaranteed by
    bsr_from_dense's zero-block padding of empty rows)."""
    from diaglib_tpu.ops.bsr import bsr_from_dense

    n, B = 6 * 32, 32
    rng = np.random.default_rng(1)
    dense = np.zeros((n, n))
    for r in (0, 2, 5):  # rows 1, 3, 4 empty
        dense[r*B:(r+1)*B, r*B:(r+1)*B] = rng.standard_normal((B, B))
    m = bsr_from_dense(jnp.asarray(dense), B)
    sm = slice_bsr(m)
    x = _rand(jax.random.PRNGKey(5), (4, n))
    y = sliced_bsr_matvec(sm, interpret=True)(x)
    ref = np.asarray(x) @ dense.T
    np.testing.assert_allclose(np.asarray(y), ref,
                               atol=1e-13 * max(1.0, np.max(np.abs(ref))))
    assert float(jnp.max(jnp.abs(y[:, B:2*B]))) == 0.0


def test_blocked_x_delivery_matches_resident(monkeypatch):
    """Configs whose x-slice array exceeds the VMEM budget switch to
    per-column-block x delivery; both paths must agree exactly."""
    import diaglib_tpu.ops.bsr_sliced as bs

    n, blk = 256, 16
    m = random_bsr_spd(n, blk, 3, jax.random.PRNGKey(4), dtype=jnp.float32)
    sm = bs.slice_bsr(m)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, n), jnp.float64)
    y_resident = bs.sliced_bsr_matvec(sm, interpret=True)(x)
    monkeypatch.setattr(bs, "_VMEM_BUDGET", 1)  # force the blocked path
    bs._sliced_spmm.clear_cache()
    y_blocked = bs.sliced_bsr_matvec(sm, interpret=True)(x)
    bs._sliced_spmm.clear_cache()
    np.testing.assert_array_equal(np.asarray(y_resident),
                                  np.asarray(y_blocked))


def test_sliced_wide_mm_matches_f64():
    """The level-folded wide-output kernel (Ritz rotations, ortho
    projections: small K x wide n) must match the f64 oracle to slice
    truncation (ops/slicing.py sliced_wide_mm)."""
    from diaglib_tpu.ops.slicing import sliced_wide_mm

    ka, kb = jax.random.split(jax.random.PRNGKey(11))
    m, k, n = 15, 165, 8192
    a = _rand(ka, (m, k)) * jnp.exp(
        2.0 * jax.random.normal(jax.random.PRNGKey(5), (m, k), jnp.float64))
    b = _rand(kb, (k, n))
    ref = np.asarray(a) @ np.asarray(b)
    out = sliced_wide_mm(a, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref,
                               atol=1e-14 * np.max(np.abs(ref)))
    # correlated operands (the emulated-dot failure case)
    a2 = jnp.tile(b[:1, :165].T[None, :, 0], (m, 1)) + 1e-9 * a
    out2 = sliced_wide_mm(a2, b, interpret=True)
    ref2 = np.asarray(a2) @ np.asarray(b)
    np.testing.assert_allclose(np.asarray(out2), ref2,
                               atol=1e-14 * np.max(np.abs(ref2)))


def test_sliced_wide_mm_triple_f32_edge_cases():
    """The in-kernel triple-f32 level combine must stay exact on solver
    data patterns: zero rows (masked space), transposed lhs (the mTm
    route), sign mixes, and per-column dynamic range."""
    from diaglib_tpu.ops.slicing import sliced_wide_mm

    m, k, n = 15, 165, 4096
    kk = jax.random.split(jax.random.PRNGKey(3), 4)
    a = _rand(kk[0], (m, k))
    b = _rand(kk[1], (k, n))
    # masked pattern: only the leading 30 rows of b are live
    b = b.at[30:].set(0.0)
    a = a.at[:, 30:].set(0.0)
    out = sliced_wide_mm(a, b, interpret=True)
    ref = np.asarray(a) @ np.asarray(b)
    np.testing.assert_allclose(np.asarray(out), ref,
                               atol=1e-14 * max(np.max(np.abs(ref)), 1e-30))

    # transposed lhs exactly as utils.mm.mTm routes it
    cT = _rand(kk[2], (k, m))
    b2 = _rand(kk[3], (k, n)) * jnp.exp(
        3.0 * jax.random.normal(jax.random.PRNGKey(7), (1, n), jnp.float64))
    out2 = sliced_wide_mm(cT.T, b2, interpret=True)
    ref2 = np.asarray(cT).T @ np.asarray(b2)
    np.testing.assert_allclose(np.asarray(out2), ref2,
                               atol=1e-14 * np.max(np.abs(ref2)))

    # all-zero b column and all-zero a row stay exactly zero
    b3 = b2.at[:, 0].set(0.0)
    a3 = a.at[0].set(0.0)
    out3 = sliced_wide_mm(a3, b3, interpret=True)
    assert float(jnp.max(jnp.abs(out3[:, 0]))) == 0.0
    assert float(jnp.max(jnp.abs(out3[0]))) == 0.0
