"""Distributed integer-sliced SpMM on the simulated 8-device CPU mesh.

Validates ops/dist_sliced.py — the production multi-chip f64 matvec —
against the single-device sliced operator and the dense oracle, checks
the halo exchange lowers to collective-permutes, and drives a fully
sharded f64 Davidson solve through it.  Pallas runs in interpret mode on
the CPU mesh; the kernel itself is the one exercised on real TPU by the
single-chip tests/bench.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diaglib_tpu import SolverOptions
from diaglib_tpu.ops import (
    bsr_to_dense,
    dist_sliced_matvec,
    distribute_sliced_bsr,
    random_bsr_spd,
    slice_bsr,
    sliced_bsr_matvec,
)
from diaglib_tpu.parallel import VectorSharding, make_mesh
from diaglib_tpu.problems import diag_precnd
from diaglib_tpu.solvers import davidson

N, B, BPR = 512, 32, 4


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, jax.devices()
    return make_mesh()


@pytest.fixture(scope="module")
def sliced():
    m = random_bsr_spd(N, B, BPR, jax.random.PRNGKey(11), dtype=jnp.float64)
    return slice_bsr(m), bsr_to_dense(m)


def test_f64_tier_matches_serial_and_dense(mesh, sliced):
    ms, dense = sliced
    dm = distribute_sliced_bsr(ms, 8)
    sh = VectorSharding(mesh)
    x = jax.random.normal(jax.random.PRNGKey(2), (5, N), jnp.float64)
    y_dist = jax.jit(dist_sliced_matvec(dm, sh, interpret=True))(x)
    ref = np.asarray(x) @ np.asarray(dense, np.float64).T
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(np.asarray(y_dist), ref, rtol=0,
                               atol=1e-14 * scale)
    y_ser = sliced_bsr_matvec(ms, interpret=True)(x)
    np.testing.assert_allclose(np.asarray(y_dist), np.asarray(y_ser),
                               rtol=0, atol=1e-14 * scale)


def test_f32_tier(mesh, sliced):
    ms, dense = sliced
    dm = distribute_sliced_bsr(ms, 8)
    sh = VectorSharding(mesh)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, N)).astype(jnp.float32)
    y = jax.jit(dist_sliced_matvec(dm, sh, dtype=jnp.float32,
                                   interpret=True))(x)
    assert y.dtype == jnp.float32
    ref = np.asarray(x, np.float64) @ np.asarray(dense, np.float64).T
    rel = np.max(np.abs(np.asarray(y, np.float64) - ref)) / np.max(np.abs(ref))
    assert rel < 2.0 ** (-17)


def test_output_sharded_and_uses_ppermute(mesh, sliced):
    ms, _ = sliced
    dm = distribute_sliced_bsr(ms, 8)
    sh = VectorSharding(mesh)
    mv = jax.jit(dist_sliced_matvec(dm, sh, interpret=True))
    x = jax.random.normal(jax.random.PRNGKey(4), (4, N), jnp.float64)
    y = mv(x)
    shard_shapes = {s.data.shape for s in y.addressable_shards}
    assert shard_shapes == {(4, N // 8)}, shard_shapes
    txt = mv.lower(x).compile().as_text()
    assert "collective-permute" in txt, "halo exchange must use ppermute"


def test_padding_rows_do_not_corrupt_output(mesh):
    """Devices get different entry counts per offset; the padded entries
    must write only the discarded extra row (a bug here shows up as a
    zeroed or doubled first output row on some shard).

    ``random_bsr_spd``'s pattern is regular (equal per-device counts, no
    padding), so build an IRREGULAR one: block-diagonal plus extra blocks
    on a few shards only."""
    from diaglib_tpu.ops import bsr_from_dense

    nbr = N // B  # 16 block rows over 8 shards -> 2 per shard
    rng = np.random.default_rng(29)
    dense = np.zeros((N, N))
    pattern = {(r, r) for r in range(nbr)}
    # same offset s=1 populated on SOME shards only -> uneven counts
    pattern |= {(0, 2), (1, 3), (4, 6)}
    for r, c in pattern:
        blk = rng.standard_normal((B, B))
        dense[r*B:(r+1)*B, c*B:(c+1)*B] = blk
    m = bsr_from_dense(jnp.asarray(dense), B)
    ms = slice_bsr(m)
    dm = distribute_sliced_bsr(ms, 8)
    nbr_loc = dm.n_local // B
    # padding entries carry the extra-row marker; require that some device
    # actually has them, or this test stops exercising the padded path
    assert any(bool(np.any(np.asarray(lr) == nbr_loc)) for lr in dm.loc_rows)
    sh = VectorSharding(mesh)
    x = jax.random.normal(jax.random.PRNGKey(5), (3, N), jnp.float64)
    y = jax.jit(dist_sliced_matvec(dm, sh, interpret=True))(x)
    ref = np.asarray(x) @ dense.T
    np.testing.assert_allclose(np.asarray(y), ref, rtol=0,
                               atol=1e-14 * max(1.0, np.max(np.abs(ref))))


def test_indivisible_rows_rejected(sliced):
    ms, _ = sliced
    with pytest.raises(ValueError):
        distribute_sliced_bsr(ms, 5)


def test_davidson_f64_on_distributed_sliced(mesh, sliced):
    """Full sharded f64 solve through the int8 halo-exchange matvec."""
    ms, dense = sliced
    dm = distribute_sliced_bsr(ms, 8)
    sh = VectorSharding(mesh)
    opts = SolverOptions(n_targ=4, n_max=8, max_iter=100, tol=1e-9)
    guess = jnp.zeros((8, N), jnp.float64)
    res = jax.jit(lambda g: davidson(
        dist_sliced_matvec(dm, sh, interpret=True),
        diag_precnd(dm.diagonal), g, opts,
        key=jax.random.PRNGKey(4), sharding=sh))(guess)
    assert bool(res.ok)
    w = np.linalg.eigh(np.asarray(dense, np.float64))[0]
    np.testing.assert_allclose(np.asarray(res.eig[:4]), w[:4], rtol=0,
                               atol=1e-7 * max(1.0, abs(w[0])))


def test_sharded_davidson_ladder_on_dist_sliced():
    """The mixed-precision ladder over the DISTRIBUTED sliced operator:
    both tiers sharded over the mesh, f32 warm start -> f64 refinement
    (the production multi-chip solve path end to end)."""
    from diaglib_tpu.solvers import davidson_ladder

    n_dev = 8
    mesh = make_mesh(jax.devices()[:n_dev])
    sh = VectorSharding(mesh)
    B = 8
    n = 4 * B * n_dev
    m = random_bsr_spd(n, B, 2, jax.random.PRNGKey(7), dtype=jnp.float64,
                       n_low_modes=8)
    dms = distribute_sliced_bsr(slice_bsr(m), n_dev)
    diag = dms.diagonal
    opts = SolverOptions(n_targ=2, n_max=4, max_iter=80, tol=1e-9)

    @jax.jit
    def run(dms, g):
        return davidson_ladder(
            dist_sliced_matvec(dms, sh, dtype=jnp.float32, interpret=True),
            diag_precnd(diag.astype(jnp.float32)),
            dist_sliced_matvec(dms, sh, interpret=True),
            diag_precnd(diag),
            g, opts, lo_tol=1e-4, key=jax.random.PRNGKey(1))

    res = run(dms, jnp.zeros((4, n), jnp.float64))
    assert bool(res.ok)
    w = jnp.linalg.eigh(bsr_to_dense(m))[0]
    np.testing.assert_allclose(np.asarray(res.eig[:2]), np.asarray(w[:2]),
                               rtol=0, atol=1e-7)
