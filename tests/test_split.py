"""SplitF64 cached-split operands: exactness and route equivalence.

The split (ops/slicing.SplitF64) lets solvers decompose their f64
expansion space into exact f32 components once per iteration and feed
every sliced contraction from the components (skipping the emulated-f64
hi/mid/lo pass that dominates each product on TPU).  These tests pin:

* bit-exact reconstruction in the normal-f32 magnitude range;
* slice digits from a presplit operand reproduce the operand;
* sliced_mmT / sliced_wide_mm / mm-family results with a SplitF64 operand
  match the raw-f64 results;
* ortho_vs_x with ``xsplit`` is equivalent to the plain call.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diaglib_tpu.ops.slicing import (
    SplitF64,
    combine_weights,
    slice_operand,
    sliced_mmT,
    sliced_wide_mm,
    split_f64,
)
from diaglib_tpu.utils.mm import mm, mTm, mmT, mm_routing


def test_split_reconstruction_exact():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (7, 33), jnp.float64)
    x = x * jnp.exp(jax.random.normal(jax.random.PRNGKey(1), x.shape) * 10)
    s = split_f64(x)
    assert s.shape == x.shape and s.ndim == 2
    np.testing.assert_array_equal(np.asarray(s.value), np.asarray(x))


def test_split_edge_values():
    # exact within the range contract (residuals stay normal-f32):
    # 2^-78 <~ |x| < 2^128
    x = jnp.asarray([0.0, 1.0, -1.0, 0.5, 1e30, -1e-20, np.pi, 2.0 ** 100,
                     2.0 ** -70], jnp.float64)
    np.testing.assert_array_equal(np.asarray(split_f64(x).value),
                                  np.asarray(x))
    # below the range, the loss is bounded by ~2^-101 absolute
    tiny = jnp.asarray([1e-30, -3e-35], jnp.float64)
    err = jnp.abs(split_f64(tiny).value - tiny)
    assert float(jnp.max(err)) < 2.0 ** -100


def test_slice_operand_presplit_reproduces_operand():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (5, 64), jnp.float64)
    for bits, ns in ((6, 9), (7, 8)):
        sl, sc = slice_operand(split_f64(x), axis=-1, n_slices=ns, bits=bits)
        w = combine_weights(ns, bits)[: ns]
        # weights are 2^{-bits*(lev+2)} for PRODUCTS; single-operand digits
        # carry 2^{-bits*(i+1)}
        rec = sum(sl[i].astype(jnp.float64) * 2.0 ** (-bits * (i + 1))
                  for i in range(ns)) * sc
        rel = float(jnp.max(jnp.abs(rec - x)) / jnp.max(jnp.abs(x)))
        assert rel < 2.0 ** (-bits * ns + 2), (bits, ns, rel)
        # digits stay inside int8 with the guard headroom
        assert int(jnp.max(jnp.abs(sl.astype(jnp.int32)))) <= 2 ** bits


def test_sliced_mmT_presplit_matches_raw():
    key = jax.random.PRNGKey(3)
    a = jax.random.normal(key, (4, 256), jnp.float64)
    b = jax.random.normal(jax.random.PRNGKey(4), (9, 256), jnp.float64)
    raw = sliced_mmT(a, b)
    pre = sliced_mmT(a, split_f64(b))
    np.testing.assert_allclose(np.asarray(pre), np.asarray(raw),
                               rtol=0, atol=1e-14 * float(jnp.max(jnp.abs(raw))))
    oracle = np.asarray(a) @ np.asarray(b).T
    np.testing.assert_allclose(np.asarray(pre), oracle, rtol=1e-13)


def test_sliced_wide_mm_presplit_matches_raw():
    key = jax.random.PRNGKey(5)
    a = jax.random.normal(key, (3, 24), jnp.float64)
    b = jax.random.normal(jax.random.PRNGKey(6), (24, 512), jnp.float64)
    raw = sliced_wide_mm(a, b, interpret=True)
    pre = sliced_wide_mm(a, split_f64(b), interpret=True)
    oracle = np.asarray(a) @ np.asarray(b)
    # elementwise error is bounded relative to the OPERAND scales (the
    # 2^-55 truncation grid), not each output's magnitude — cancellation
    # can make tiny outputs; compare with a scale-anchored atol
    atol = 1e-13 * float(np.max(np.abs(oracle)))
    np.testing.assert_allclose(np.asarray(pre), oracle, rtol=1e-12,
                               atol=atol)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(raw), rtol=1e-12,
                               atol=atol)


def test_mm_family_accepts_split():
    key = jax.random.PRNGKey(7)
    u = jax.random.normal(key, (4, 300), jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(8), (6, 300), jnp.float64)
    c = jax.random.normal(jax.random.PRNGKey(9), (6, 4), jnp.float64)
    xs = split_f64(x)
    np.testing.assert_allclose(np.asarray(mmT(u, xs)), np.asarray(mmT(u, x)),
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(mTm(c, xs)), np.asarray(mTm(c, x)),
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(mm(c.T, xs)),
                               np.asarray(mm(c.T, x)), rtol=1e-13, atol=1e-13)
    # forced-sliced route with a presplit operand (CPU: XLA component peel)
    with mm_routing(sliced="always"):
        np.testing.assert_allclose(np.asarray(mmT(u, xs)),
                                   np.asarray(u @ x.T), rtol=1e-12,
                                   atol=1e-12)


def test_ortho_vs_x_xsplit_equivalent():
    from diaglib_tpu.ortho.core import ortho_vs_x

    key = jax.random.PRNGKey(10)
    x = jax.random.normal(key, (5, 200), jnp.float64)
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    x, _, _ = __import__("diaglib_tpu.ortho.core", fromlist=["ortho_cd"]
                         ).ortho_cd(x)
    u = jax.random.normal(jax.random.PRNGKey(11), (3, 200), jnp.float64)
    xmask = jnp.ones((5,), bool)
    u1, d1 = ortho_vs_x(x, u, xmask=xmask)
    u2, d2 = ortho_vs_x(x, u, xmask=xmask, xsplit=split_f64(x))
    assert bool(d1) and bool(d2)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), atol=1e-13)
    # result is orthogonal to x and orthonormal
    assert float(jnp.max(jnp.abs(x @ u2.T))) < 1e-12
    g = u2 @ u2.T
    np.testing.assert_allclose(np.asarray(g), np.eye(3), atol=1e-12)
