"""Iteration-count regression fixtures for the five toy protocols.

SURVEY.md §4 calls for convergence-iteration-count regression against the
reference Fortran binary; gfortran is absent from this image AND the image
has no network egress (BASELINE.md), so the reference binary cannot be
built or fetched here — these fixtures pin the *current* converged
behavior instead: a future change that, say, doubles the iteration count
while staying numerically correct must fail here and be looked at.

ANCHORING TO THE REAL FORTRAN: run ``tests/fortran_anchor.sh`` on any
machine with gfortran + a reference checkout; it builds ``main.exe``,
drives all five protocols, and prints a paste-ready anchor block
(final iteration counts + leading eigenvalues per driver) to reconcile
the ±2-iteration band below against the actual reference run.  No such
machine has been available in any build round so far; until one is, the
band is anchored to the dense jnp.linalg/scipy oracles only.

Protocol = the reference demo config (main.f90:14-18): n=1000, n_want=10,
n_eig=15, tol=1e-8, itmax=100, m_max=20, guess strategy 4, seed 1 — exactly
what ``python -m diaglib_tpu.demo <cmd>`` runs.

UPDATE POLICY: if a deliberate algorithmic change shifts a count, re-run
``python -m pytest tests/test_iteration_parity.py -q`` locally, confirm the
eigenvalues still match the dense oracle in the driver test files, and edit
EXPECTED here in the same commit, citing the cause in the commit message.
Drift tolerance is ±2 iterations (guess RNG / reduction-order jitter);
matvec counts get a proportional band.
"""

import jax
import jax.numpy as jnp
import pytest

from diaglib_tpu import SolverOptions
from diaglib_tpu.problems import (
    casida_blocks,
    dense_matvec,
    diag_precnd,
    lrprec_eff,
    lrprec_std,
    metric_matrix,
    nonsym_matrix,
    symm_matrix,
)
from diaglib_tpu.solvers import (
    caslr,
    caslr_eff,
    davidson,
    gen_david,
    lobpcg,
    nonsym,
)
from diaglib_tpu.utils.guess import guess_evec

N, N_WANT, TOL, ITMAX, M_MAX, SEED = 1000, 10, 1e-8, 100, 20, 1
N_EIG = min(2 * N_WANT, N_WANT + 5)

# (n_iter, n_matvec) measured 2026-08-19 (round 2), f64, CPU; see module
# docstring for the update policy.
EXPECTED = {
    "symm/davidson": (22, 321),
    "symm/lobpcg": (25, 358),
    "geneig/lobpcg": (12, 157),
    "geneig/gen_david": (10, 133),
    "caslr/caslr0": (15, 816),
    "caslr/caslr1": (15, 816),
    "caslr/caslr_eff": (15, 438),
    "scflr/caslr0": (27, 1556),
    "scflr/caslr1": (27, 1556),
    "scflr/caslr_eff": (27, 808),
    "nonsym/c": (17, 137),
}

ITER_BAND = 2


def _check(name, res):
    assert bool(res.ok), f"{name} failed to converge"
    it_exp, mv_exp = EXPECTED[name]
    it, mv = int(res.n_iter), int(res.n_matvec)
    assert abs(it - it_exp) <= ITER_BAND, (
        f"{name}: n_iter drifted {it_exp} -> {it} (allowed +-{ITER_BAND}); "
        "see test_iteration_parity.py update policy"
    )
    # matvec count scales with iterations; allow the same relative drift
    band = max(1, round(mv_exp * (ITER_BAND + 0.5) / max(it_exp, 1)))
    assert abs(mv - mv_exp) <= band, (
        f"{name}: n_matvec drifted {mv_exp} -> {mv} (allowed +-{band})"
    )


@pytest.fixture(scope="module")
def symm():
    a = symm_matrix(N)
    diag = jnp.diagonal(a)
    guess = guess_evec(4, jax.random.PRNGKey(SEED), N, N_EIG, diagonal=diag)
    opts = SolverOptions(n_targ=N_WANT, n_max=N_EIG, max_iter=ITMAX, tol=TOL,
                         max_dav=M_MAX)
    return a, diag, guess, opts


def test_symm_davidson_counts(symm):
    a, diag, guess, opts = symm
    res = davidson(dense_matvec(a), diag_precnd(diag), guess, opts,
                   key=jax.random.PRNGKey(SEED))
    _check("symm/davidson", res)


def test_symm_lobpcg_counts(symm):
    a, diag, guess, opts = symm
    res = lobpcg(dense_matvec(a), diag_precnd(diag), guess, opts,
                 key=jax.random.PRNGKey(SEED))
    _check("symm/lobpcg", res)


def test_geneig_counts(symm):
    a, diag, guess, opts = symm
    s = metric_matrix(N, jax.random.PRNGKey(SEED))
    res = lobpcg(dense_matvec(a), diag_precnd(diag), guess, opts,
                 bvec=dense_matvec(s), key=jax.random.PRNGKey(SEED))
    _check("geneig/lobpcg", res)
    res = gen_david(dense_matvec(a), diag_precnd(diag), dense_matvec(s),
                    guess, opts, key=jax.random.PRNGKey(SEED))
    _check("geneig/gen_david", res)


@pytest.mark.parametrize("tag,tdscf", [("caslr", False), ("scflr", True)])
def test_casida_counts(tag, tdscf):
    blk = casida_blocks(N, jax.random.PRNGKey(SEED), tdscf=tdscf)
    diag = jnp.diagonal(blk["aa"]) - jnp.diagonal(blk["sigma"])
    guess = guess_evec(4, jax.random.PRNGKey(SEED), 2 * N, N_EIG,
                       diagonal=diag)
    ops = dict(apbmul=dense_matvec(blk["apb"]),
               ambmul=dense_matvec(blk["amb"]),
               spdmul=dense_matvec(blk["spd"]),
               smdmul=dense_matvec(blk["smd"]))
    pc_std = lrprec_std(jnp.diagonal(blk["aa"]), jnp.diagonal(blk["sigma"]))
    pc_eff = lrprec_eff(jnp.diagonal(blk["aa"]), jnp.diagonal(blk["sigma"]))
    opts = SolverOptions(n_targ=N_WANT, n_max=N_EIG, max_iter=ITMAX, tol=TOL,
                         max_dav=M_MAX)
    for alg in (0, 1):
        res = caslr(lrprec=pc_std, evec_guess=guess, options=opts,
                    algorithm=alg, **ops)
        _check(f"{tag}/caslr{alg}", res)
    res = caslr_eff(lrprec=pc_eff, evec_guess=guess, options=opts, **ops)
    _check(f"{tag}/caslr_eff", res)


def test_nonsym_counts():
    a = nonsym_matrix(N, jax.random.PRNGKey(1), variant=4)
    diag = jnp.diagonal(a)
    guess = guess_evec(6, jax.random.PRNGKey(SEED), N, N_WANT, diagonal=diag)
    opts = SolverOptions(n_targ=N_WANT, n_max=N_WANT, max_iter=ITMAX, tol=TOL,
                         max_dav=M_MAX)
    res = nonsym(dense_matvec(a), dense_matvec(a.T), diag_precnd(diag),
                 guess, opts, side="c", key=jax.random.PRNGKey(SEED))
    _check("nonsym/c", res)
