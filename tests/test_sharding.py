"""Multi-device tests on the simulated 8-device CPU mesh.

Checks that (a) solvers produce identical results when the n axis is
sharded over the mesh, and (b) the partitioner actually distributes the
work (sharded state arrays, collective Gram reductions).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diaglib_tpu import SolverOptions
from diaglib_tpu.parallel import VectorSharding, make_mesh
from diaglib_tpu.problems import dense_matvec, diag_precnd, symm_matrix
from diaglib_tpu.solvers import caslr_eff, davidson, lobpcg
from diaglib_tpu.problems import casida_blocks, lrprec_eff

N = 256  # divisible by 8 devices
N_WANT, N_EIG = 4, 8
TOL = 1e-8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, jax.devices()
    return make_mesh()


@pytest.fixture(scope="module")
def problem():
    a = symm_matrix(N)
    w = jnp.linalg.eigh(a)[0]
    return a, w


def test_davidson_sharded_matches_dense(mesh, problem):
    a, w = problem
    sh = VectorSharding(mesh)
    opts = SolverOptions(n_targ=N_WANT, n_max=N_EIG, max_iter=100, tol=TOL)
    mv, pc = dense_matvec(a), diag_precnd(jnp.diagonal(a))

    @jax.jit
    def run(guess):
        return davidson(mv, pc, guess, opts, key=jax.random.PRNGKey(3),
                        sharding=sh)

    res = run(jnp.zeros((N_EIG, N), jnp.float64))
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.eig[:N_WANT]),
                               np.asarray(w[:N_WANT]), rtol=0, atol=1e-7)
    # the eigenvector block must actually be sharded over the mesh
    shard_shapes = {s.data.shape for s in res.evec.addressable_shards}
    assert shard_shapes == {(N_EIG, N // 8)}, shard_shapes


def test_davidson_sharded_equals_unsharded(mesh, problem):
    a, _ = problem
    opts = SolverOptions(n_targ=N_WANT, n_max=N_EIG, max_iter=100, tol=TOL)
    mv, pc = dense_matvec(a), diag_precnd(jnp.diagonal(a))
    guess = jnp.zeros((N_EIG, N), jnp.float64)
    r0 = davidson(mv, pc, guess, opts, key=jax.random.PRNGKey(3))
    r1 = jax.jit(lambda g: davidson(mv, pc, g, opts, key=jax.random.PRNGKey(3),
                                    sharding=VectorSharding(mesh)))(guess)
    assert int(r0.n_iter) == int(r1.n_iter)
    np.testing.assert_allclose(np.asarray(r0.eig), np.asarray(r1.eig),
                               rtol=0, atol=1e-9)


def test_lobpcg_sharded(mesh, problem):
    a, w = problem
    sh = VectorSharding(mesh)
    opts = SolverOptions(n_targ=N_WANT, n_max=N_EIG, max_iter=200, tol=TOL)
    mv, pc = dense_matvec(a), diag_precnd(jnp.diagonal(a))
    res = jax.jit(lambda g: lobpcg(mv, pc, g, opts, key=jax.random.PRNGKey(5),
                                   sharding=sh))(jnp.zeros((N_EIG, N)))
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.eig[:N_WANT]),
                               np.asarray(w[:N_WANT]), rtol=0, atol=1e-7)


def test_caslr_eff_sharded(mesh):
    blk = casida_blocks(N, jax.random.PRNGKey(17))
    sh = VectorSharding(mesh)
    opts = SolverOptions(n_targ=3, n_max=6, max_iter=100, tol=TOL, max_dav=10)
    pc = lrprec_eff(jnp.diagonal(blk["aa"]), jnp.diagonal(blk["sigma"]))
    guess = jax.random.uniform(jax.random.PRNGKey(1), (6, 2 * N)) - 0.5
    res = jax.jit(lambda g: caslr_eff(
        dense_matvec(blk["apb"]), dense_matvec(blk["amb"]),
        dense_matvec(blk["spd"]), dense_matvec(blk["smd"]),
        pc, g, opts, sharding=sh))(guess)
    assert bool(res.ok)
    # cross-check vs unsharded
    res0 = caslr_eff(dense_matvec(blk["apb"]), dense_matvec(blk["amb"]),
                     dense_matvec(blk["spd"]), dense_matvec(blk["smd"]),
                     pc, guess, opts)
    np.testing.assert_allclose(np.asarray(res.eig[:3]),
                               np.asarray(res0.eig[:3]), rtol=0, atol=1e-8)


def test_nonsym_sharded_device_driver(mesh):
    """Two-sided nonsymmetric Davidson with the n axis sharded over the
    mesh and the reduced eigensolve fully ON DEVICE (driver='device',
    utils/eberlein.py) — the combination that needs no host callbacks
    anywhere, so the whole pass is one pjit-sharded while_loop."""
    import scipy.linalg

    from diaglib_tpu.problems import nonsym_matrix
    from diaglib_tpu.solvers import nonsym

    a = nonsym_matrix(N, jax.random.PRNGKey(1), variant=4)
    w = scipy.linalg.eig(np.asarray(a), right=False)
    w_ref = np.sort(w[np.abs(w.imag) < 1e-9].real)
    sh = VectorSharding(mesh)
    opts = SolverOptions(n_targ=3, n_max=3, max_iter=200, tol=TOL,
                         max_dav=10)
    res = nonsym(dense_matvec(a), dense_matvec(a.T),
                 diag_precnd(jnp.diagonal(a)),
                 jnp.zeros((3, N), jnp.float64), opts, side="r",
                 key=jax.random.PRNGKey(2), sharding=sh, driver="device")
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.eig[:3]), w_ref[:3],
                               rtol=0, atol=1e-7)
    shard_shapes = {s.data.shape for s in res.evec_r.addressable_shards}
    assert shard_shapes == {(3, N // 8)}, shard_shapes


def test_collectives_in_compiled_module(mesh, problem):
    """The Gram contractions must lower to cross-device reductions."""
    a, _ = problem
    sh = VectorSharding(mesh)
    opts = SolverOptions(n_targ=N_WANT, n_max=N_EIG, max_iter=10, tol=TOL)
    mv, pc = dense_matvec(a), diag_precnd(jnp.diagonal(a))
    fn = jax.jit(lambda g: davidson(mv, pc, g, opts, sharding=sh))
    txt = fn.lower(jnp.zeros((N_EIG, N))).compile().as_text()
    assert "all-reduce" in txt or "all-gather" in txt or "reduce-scatter" in txt


def test_collective_inventory_pinned(mesh, problem):
    """Pin the collective STRUCTURE of the sharded Davidson step (round-3
    verdict item #8): the op-kind inventory of the compiled module is the
    machine-independent scaling regression signal — an accidental extra
    all-gather (e.g. from a lost sharding constraint) changes it.

    If an intentional solver change alters the inventory, re-record the
    expectations below from the failure message.
    """
    from diaglib_tpu.profiling import collective_inventory

    a, _ = problem
    sh = VectorSharding(mesh)
    opts = SolverOptions(n_targ=N_WANT, n_max=N_EIG, max_iter=10, tol=TOL)
    mv, pc = dense_matvec(a), diag_precnd(jnp.diagonal(a))
    fn = jax.jit(lambda g: davidson(mv, pc, g, opts, sharding=sh))
    txt = fn.lower(jnp.zeros((N_EIG, N))).compile().as_text()
    inv = collective_inventory(txt)
    assert inv, "sharded davidson must contain collectives"
    counts = {k: v["count"] for k, v in inv.items()}
    # Recorded inventory of the compiled sharded Davidson program (jax
    # 0.7.x CPU GSPMD): 7 all-reduces (Gram/rotation reductions, norms)
    # and 3 all-gathers — the k x n VECTOR-BLOCK gathers the replicated
    # dense test operator's matvec contraction needs (O(k*n) traffic, not
    # the n^2 operator).  An extra collective here means a sharding
    # constraint regressed; an intentional change re-records this pin.
    assert counts == {"all-reduce": 7, "all-gather": 3}, counts
    # all-gathered arrays must stay vector blocks (<= n_eig * n doubles),
    # never operator-sized
    ag = inv["all-gather"]
    assert ag["bytes"] / ag["count"] <= N_EIG * N * 8, inv
    # all-reduce traffic must stay reduced-space sized
    lda_pad = (max(10, opts.max_dav) + 1) * N_EIG
    ar = inv["all-reduce"]
    assert ar["bytes"] / ar["count"] <= lda_pad * lda_pad * 8, inv
