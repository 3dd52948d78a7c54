"""Mixed-precision solve ladder (solvers/mixed.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from diaglib_tpu import SolverOptions
from diaglib_tpu.ops import bsr_diagonal, bsr_matvec, bsr_to_dense, random_bsr_spd
from diaglib_tpu.problems import diag_precnd
from diaglib_tpu.solvers import davidson, davidson_ladder, lobpcg_ladder

N, B = 512, 32
OPTS = SolverOptions(n_targ=4, n_max=8, max_iter=150, tol=1e-10)


def _problem():
    m64 = random_bsr_spd(N, B, 4, jax.random.PRNGKey(11), dtype=jnp.float64)
    m32 = dataclasses.replace(m64, blocks_t=m64.blocks_t.astype(jnp.float32))
    d = bsr_diagonal(m64)
    lo = (bsr_matvec(m32), diag_precnd(d.astype(jnp.float32)))
    hi = (bsr_matvec(m64), diag_precnd(d))
    return m64, lo, hi


def test_davidson_ladder_full_f64_accuracy():
    m64, (mv32, pc32), (mv64, pc64) = _problem()
    res = davidson_ladder(mv32, pc32, mv64, pc64, jnp.zeros((8, N)), OPTS,
                          key=jax.random.PRNGKey(1))
    assert bool(res.ok)
    assert res.eig.dtype == jnp.float64
    w = jnp.linalg.eigh(bsr_to_dense(m64))[0]
    np.testing.assert_allclose(np.asarray(res.eig[:4]), np.asarray(w[:4]),
                               rtol=0, atol=1e-9)


def test_ladder_cuts_f64_iterations():
    m64, (mv32, pc32), (mv64, pc64) = _problem()
    direct = davidson(mv64, pc64, jnp.zeros((8, N)), OPTS,
                      key=jax.random.PRNGKey(1))
    ladder = davidson_ladder(mv32, pc32, mv64, pc64, jnp.zeros((8, N)), OPTS,
                             key=jax.random.PRNGKey(1))
    assert bool(direct.ok) and bool(ladder.ok)
    # histories cover only the f64 stage: its iteration count is the number
    # of non-inf rms rows, and warm starting must cut it well below direct
    f64_iters = int(jnp.sum(jnp.isfinite(ladder.rms_history[:, 0])))
    assert f64_iters < int(direct.n_iter) // 2, (f64_iters, int(direct.n_iter))


def test_lobpcg_ladder():
    m64, (mv32, pc32), (mv64, pc64) = _problem()
    opts = dataclasses.replace(OPTS, tol=1e-9, max_iter=300)
    res = lobpcg_ladder(mv32, pc32, mv64, pc64, jnp.zeros((8, N)), opts,
                        key=jax.random.PRNGKey(2))
    assert bool(res.ok)
    w = jnp.linalg.eigh(bsr_to_dense(m64))[0]
    np.testing.assert_allclose(np.asarray(res.eig[:4]), np.asarray(w[:4]),
                               rtol=0, atol=1e-8)
