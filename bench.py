"""Benchmark driver: one JSON line on stdout, a metric suite on stderr.

Headline metric (the stdout JSON): wall time for a full mixed-precision
Davidson-Liu solve of the flagship matrix-free workload — 10 lowest
eigenpairs of a 65536-dim SPD block-sparse operator (BSR, 512-blocks,
~500M nnz) to tol 1e-10 rms — on the available accelerator.  This
exercises the whole framework: the int8-MXU Ozaki-sliced SpMM, the masked
static-shape solver loop, the mixed-precision Jacobi reduced eigensolver
and the orthogonalization kernels.

``vs_baseline``: the reference publishes no numbers (BASELINE.md); we
report speedup vs the previous round's recorded value (BENCH_r{N}.json in
the repo root), 1.0 when none exists.

The FULL metric suite goes to stderr as one JSON object per line
(``{"metric": ..., "value": ..., "unit": ...}``) covering: the flagship
Davidson ladder, the flagship-scale Casida (caslr_eff) ladder on sliced
(A+B)/(A-B) operators, the LOBPCG ladder, SpMM f32/f64-tier throughputs,
and the five reference toy protocols (main.f90:14-18 config) — so
round-over-round regressions are visible on every axis, not just the
headline.  BASELINE.md tables are generated from these lines.
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
    casida_blocks,
    dense_matvec,
    diag_precnd,
    lrprec_eff,
    lrprec_std,
    metric_matrix,
    nonsym_matrix,
    symm_matrix,
)
from diaglib_tpu.solvers import davidson  # noqa: E402

METRIC = "davidson_bsr_n65536_f64_wall"
SUITE = []


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(metric, value, unit, **extra):
    rec = {"metric": metric, "value": round(float(value), 4), "unit": unit}
    rec.update(extra)
    SUITE.append(rec)
    log(json.dumps(rec))


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
    emit("spmm_f32_gnnzps", m.nnz / 1e9 / dt, "Gnnz/s",
         ms_per_matvec=round(dt * 1e3, 2))

    # f64-accurate and f32-tier SpMM on the int8 MXU (Ozaki slices)
    from diaglib_tpu.ops.bsr_sliced import slice_bsr, sliced_bsr_matvec
    ms = slice_bsr(m)
    del m
    x64 = x.astype(jnp.float64)
    for tag, dtype, xx, rep_t in (("spmm_f64_gnnzps", jnp.float64, x64, 20),
                                  ("spmm_sliced_f32_gnnzps", jnp.float32, x,
                                   20)):
        @jax.jit
        def many_t(ms, x):
            def body(i, acc):
                return sliced_bsr_matvec(ms, dtype=dtype)(acc) * 1e-3
            return jax.lax.fori_loop(0, rep_t, body, x)

        y = many_t(ms, xx)
        _ = float(y[0, 0])  # fetch-terminated warmup
        t0 = time.time()
        y = many_t(ms, xx)
        _ = float(y[0, 0])  # value fetch before the clock stops
        dt = (time.time() - t0) / rep_t
        emit(tag, ms.nnz / 1e9 / dt, "Gnnz/s",
             ms_per_matvec=round(dt * 1e3, 2))


def _steady(run, args_of_key, warm_key, keys, fetch_ok=True):
    """Fetch-terminated steady-state timing over varying-key solves: the
    axon runtime's block_until_ready does not await device execution, so
    only a scalar fetch after a loop of varying inputs is honest."""
    res = run(*args_of_key(warm_key))
    _ = bool(res.ok)
    t0 = time.time()
    for k in keys:
        res = run(*args_of_key(k))
    ok = bool(res.ok)  # value fetch: waits for the full pipeline
    return (time.time() - t0) / len(keys), res, ok


def bench_davidson_bsr():
    """Flagship: mixed-precision ladder (solvers/mixed.py) on the Ozaki
    integer-sliced operator (ops/bsr_sliced.py) — both tiers served by ONE
    int8 slice store on the MXU — to full f64 1e-10 rms convergence."""
    from diaglib_tpu.ops.bsr_sliced import slice_bsr, sliced_bsr_matvec
    from diaglib_tpu.solvers import davidson_ladder, lobpcg_ladder

    n, B, bpr = 65536, 512, 8
    n_want, n_eig = 10, 15
    m32 = random_bsr_spd(n, B, bpr, jax.random.PRNGKey(0), dtype=jnp.float32)
    ms = slice_bsr(m32)
    del m32
    opts = SolverOptions(n_targ=n_want, n_max=n_eig, max_iter=150, tol=1e-10,
                         max_dav=10)
    g = jnp.zeros((n_eig, n), jnp.float64)

    run = jax.jit(lambda ms, g, k: davidson_ladder(
        sliced_bsr_matvec(ms, dtype=jnp.float32),
        diag_precnd(ms.diagonal.astype(jnp.float32)),
        sliced_bsr_matvec(ms), diag_precnd(ms.diagonal), g, opts,
        lo_tol=2e-6, lo_iter=35, key=k))

    t0 = time.time()
    res = jax.block_until_ready(run(ms, g, jax.random.PRNGKey(1)))
    log(f"davidson ladder n={n}: compile+first solve {time.time()-t0:.1f}s, "
        f"ok={bool(res.ok)} iters={int(res.n_iter)} "
        f"matvecs={int(res.n_matvec)}")
    if not bool(res.ok):
        log("WARNING: flagship solve did not converge")

    dt, res, ok = _steady(
        run, lambda k: (ms, g, k), jax.random.PRNGKey(1),
        [jax.random.PRNGKey(2 + i) for i in range(3)])
    f64_iters = int(jnp.sum(jnp.isfinite(res.rms_history[:, 0])))
    emit(METRIC, dt, "s", ok=ok, iters=int(res.n_iter), f64_iters=f64_iters)

    # LOBPCG ladder on the same operator/tolerances
    run_l = jax.jit(lambda ms, g, k: lobpcg_ladder(
        sliced_bsr_matvec(ms, dtype=jnp.float32),
        diag_precnd(ms.diagonal.astype(jnp.float32)),
        sliced_bsr_matvec(ms), diag_precnd(ms.diagonal), g, opts,
        lo_tol=2e-6, lo_iter=70, key=k))
    dt_l, res_l, ok_l = _steady(
        run_l, lambda k: (ms, g, k), jax.random.PRNGKey(1),
        [jax.random.PRNGKey(12 + i) for i in range(3)])
    emit("lobpcg_bsr_n65536_f64_wall", dt_l, "s", ok=ok_l,
         iters=int(res_l.n_iter))
    return dt, ok


def bench_caslr_bsr():
    """Flagship-scale Casida: caslr_eff mixed-precision ladder on sliced
    (A+B)/(A-B) BSR operators (~1B nnz total), tdscf structure
    (caslr_eff_driver semantics, diaglib.f90:1024-1481)."""
    from diaglib_tpu.problems import bsr_casida_tdscf
    from diaglib_tpu.solvers import caslr_eff_ladder

    # bpr=4 per matrix: 2 x 251M nnz (503M total), 2 x 2.1 GiB slice
    # stores — comfortably inside one 16 GiB chip next to solver state
    n, B, bpr = 65536, 512, 4
    n_want, n_eig = 10, 15
    from diaglib_tpu.problems import casida_tdscf_ops

    _, _, diag_aa, (apb, amb) = bsr_casida_tdscf(
        n, B, bpr, jax.random.PRNGKey(0))
    opts = SolverOptions(n_targ=n_want, n_max=n_eig, max_iter=150, tol=1e-10,
                         max_dav=10)
    g = jnp.zeros((n_eig, 2 * n), jnp.float64)

    # operators passed as jit ARGUMENTS — closing over them bakes the
    # multi-GB slice stores into the program as constants (DESIGN.md §6)
    run = jax.jit(lambda apb, amb, g, k: caslr_eff_ladder(
        *casida_tdscf_ops(apb, amb), g, opts, lo_tol=2e-6, lo_iter=60,
        key=k))
    t0 = time.time()
    res = jax.block_until_ready(run(apb, amb, g, jax.random.PRNGKey(1)))
    log(f"caslr_eff ladder n={n}: compile+first solve {time.time()-t0:.1f}s, "
        f"ok={bool(res.ok)} iters={int(res.n_iter)} "
        f"matvecs={int(res.n_matvec)}")
    dt, res, ok = _steady(
        run, lambda k: (apb, amb, g, k), jax.random.PRNGKey(1),
        [jax.random.PRNGKey(2 + i) for i in range(3)])
    emit("caslr_eff_bsr_n65536_f64_wall", dt, "s", ok=ok,
         iters=int(res.n_iter), n_matvec=int(res.n_matvec))


def bench_toy():
    """The reference's five toy protocols (main.f90:14-18 config)."""
    from diaglib_tpu.solvers import (
        caslr,
        caslr_eff,
        gen_david,
        lobpcg,
        nonsym,
    )
    from diaglib_tpu.utils.guess import guess_evec

    n, n_want, n_eig = 1000, 10, 15
    opts = SolverOptions(n_targ=n_want, n_max=n_eig, max_iter=100, tol=1e-8,
                         max_dav=20)
    a = symm_matrix(n)
    diag = jnp.diagonal(a)
    g = jnp.zeros((n_eig, n), jnp.float64)
    keys = [jax.random.PRNGKey(2 + i) for i in range(10)]

    def steady(name, run, args_of_key):
        dt, res, ok = _steady(run, args_of_key, jax.random.PRNGKey(1), keys)
        emit(f"toy_{name}_ms", dt * 1e3, "ms", ok=ok, iters=int(res.n_iter))

    run_d = jax.jit(lambda a, g, k: davidson(
        dense_matvec(a), diag_precnd(jnp.diagonal(a)), g, opts, key=k))
    steady("davidson", run_d, lambda k: (a, g, k))

    run_l = jax.jit(lambda a, g, k: lobpcg(
        dense_matvec(a), diag_precnd(jnp.diagonal(a)), g, opts, key=k))
    steady("lobpcg", run_l, lambda k: (a, g, k))

    s = metric_matrix(n, jax.random.PRNGKey(1))
    run_g = jax.jit(lambda a, s, g, k: gen_david(
        dense_matvec(a), diag_precnd(jnp.diagonal(a)), dense_matvec(s),
        g, opts, key=k))
    steady("gen_david", run_g, lambda k: (a, s, g, k))

    blk = casida_blocks(n, jax.random.PRNGKey(1))
    dlr = jnp.diagonal(blk["aa"]) - jnp.diagonal(blk["sigma"])
    glr = guess_evec(4, jax.random.PRNGKey(1), 2 * n, n_eig, diagonal=dlr)
    pc_std = lrprec_std(jnp.diagonal(blk["aa"]), jnp.diagonal(blk["sigma"]))
    pc_eff = lrprec_eff(jnp.diagonal(blk["aa"]), jnp.diagonal(blk["sigma"]))
    ops = dict(apbmul=dense_matvec(blk["apb"]),
               ambmul=dense_matvec(blk["amb"]),
               spdmul=dense_matvec(blk["spd"]),
               smdmul=dense_matvec(blk["smd"]))

    run_c = jax.jit(lambda g, k: caslr(
        lrprec=pc_std, evec_guess=g, options=opts, **ops))
    steady("caslr", run_c, lambda k: (glr, k))
    run_c0 = jax.jit(lambda g, k: caslr(
        lrprec=pc_std, evec_guess=g, options=opts, algorithm=0, **ops))
    steady("caslr_alg0", run_c0, lambda k: (glr, k))
    run_e = jax.jit(lambda g, k: caslr_eff(
        lrprec=pc_eff, evec_guess=g, options=opts, **ops))
    steady("caslr_eff", run_e, lambda k: (glr, k))

    an = nonsym_matrix(n, jax.random.PRNGKey(1), variant=4)
    dn = jnp.diagonal(an)
    gn = guess_evec(6, jax.random.PRNGKey(1), n, n_want, diagonal=dn)
    on = SolverOptions(n_targ=n_want, n_max=n_want, max_iter=100, tol=1e-8,
                       max_dav=20)

    # nonsym's host-dgeev loop is Python-orchestrated on this runtime:
    # time it directly (no outer jit); closures held STABLE across calls
    # so the cached jitted step programs hit (solvers/nonsym.py)
    mv_n, mvt_n, pc_n = dense_matvec(an), dense_matvec(an.T), diag_precnd(dn)

    def run_n(g, k):
        return nonsym(mv_n, mvt_n, pc_n, g, on, side="c", key=k)

    dt, res, ok = _steady(run_n, lambda k: (gn, k), jax.random.PRNGKey(1),
                          keys[:3])
    emit("toy_nonsym_ms", dt * 1e3, "ms", ok=ok, iters=int(res.n_iter))


def main():
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    # flagship FIRST: running the Pallas SpMM kernel earlier in the same
    # process has been observed to leave the axon TPU runtime in a state
    # where the subsequent large f64 program faults
    dt, ok = bench_davidson_bsr()
    for fn in (bench_caslr_bsr, bench_spmm, bench_toy):
        try:
            fn()
        except Exception as e:  # secondary metrics; never fail the bench
            log(f"{fn.__name__} failed: {e}")
    prev = prev_value()
    vs = (prev / dt) if prev else 1.0
    print(json.dumps({
        "metric": METRIC,
        "value": round(dt, 4),
        "unit": "s",
        "vs_baseline": round(vs, 4),
        "suite": SUITE,
    }), flush=True)


if __name__ == "__main__":
    main()
