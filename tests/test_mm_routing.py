"""Option-driven kernel routing (round-3 verdict item #5).

The wide/sliced contraction routing used to live only in trace-time env
vars (DIAGLIB_TPU_WIDE_MM, ...), which jit caches do not key on; bench.py
had to mutate os.environ between sections.  Routing now rides
``SolverOptions.wide_mm`` / ``.sliced_mm`` via the ``mm_routing`` context
entered by every solver driver (utils/mm.py routing_for), with validated
per-driver defaults; env vars remain emergency overrides only.
"""

import jax
import jax.numpy as jnp
import pytest

from diaglib_tpu import SolverOptions
from diaglib_tpu.utils import mm as mmmod
from diaglib_tpu.utils.mm import mm, mm_routing, routing_for


@pytest.fixture
def fake_tpu(monkeypatch):
    # _use_wide gates on the default backend; fake it so the routing
    # decision (not the kernel) is testable on CPU
    monkeypatch.setattr(mmmod.jax, "default_backend", lambda: "tpu")


def test_routing_defaults_per_driver(fake_tpu):
    opts = SolverOptions(n_targ=2, n_max=4)  # wide_mm="auto"
    shape = (jnp.float64, 165, 15, 65536)  # flagship rotation shape
    assert not mmmod._use_wide(*shape), "bare-call default must stay OFF"
    with routing_for(opts, "davidson"):
        assert mmmod._use_wide(*shape)
    with routing_for(opts, "gen_david"):
        assert mmmod._use_wide(*shape)
    with routing_for(opts, "caslr_eff"):
        assert mmmod._use_wide(*shape)
    with routing_for(opts, "lobpcg"):
        # OFF through round 4 (VMEM-MSA overflow); ON since the round-5
        # SplitF64 presplit reshaped the promoted-buffer set (validated
        # at the flagship: 21.6 vs 27.6 ms/f64-iter, no crash)
        assert mmmod._use_wide(*shape)
    # context restored
    assert not mmmod._use_wide(*shape)


def test_routing_options_override_default(fake_tpu):
    shape = (jnp.float64, 165, 15, 65536)
    with routing_for(SolverOptions(n_targ=2, n_max=4, wide_mm="always"),
                     "lobpcg"):
        assert mmmod._use_wide(*shape)
    with routing_for(SolverOptions(n_targ=2, n_max=4, wide_mm="never"),
                     "davidson"):
        assert not mmmod._use_wide(*shape)


def test_env_var_is_emergency_override(fake_tpu, monkeypatch):
    shape = (jnp.float64, 165, 15, 65536)
    monkeypatch.setenv("DIAGLIB_TPU_WIDE_MM", "never")
    with routing_for(SolverOptions(n_targ=2, n_max=4, wide_mm="always"),
                     "davidson"):
        assert not mmmod._use_wide(*shape)
    monkeypatch.setenv("DIAGLIB_TPU_WIDE_MM", "always")
    with routing_for(SolverOptions(n_targ=2, n_max=4, wide_mm="never"),
                     "davidson"):
        assert mmmod._use_wide(*shape)


def test_wide_infeasible_tile_falls_back(fake_tpu):
    """Round-3 advisor medium: K beyond the lane-tile budget must fall
    back to the chunked path, not raise inside sliced_wide_mm."""
    from diaglib_tpu.ops.slicing import wide_feasible

    assert wide_feasible(15, 165, 65536)
    assert not wide_feasible(15, 2048, 65536)
    with mm_routing(wide="always"):
        assert not mmmod._use_wide(jnp.float64, 2048, 15, 65536)
        # the full mm() call must produce the correct product via the
        # fallback path
        a = jnp.linspace(-1.0, 1.0, 15 * 2048,
                         dtype=jnp.float64).reshape(15, 2048)
        b = jnp.linspace(0.5, 1.5, 2048 * 256,
                         dtype=jnp.float64).reshape(2048, 256)
        out = mm(a, b)
        ref = jnp.asarray(a) @ jnp.asarray(b)
        assert float(jnp.max(jnp.abs(out - ref))) < 1e-10


def test_sliced_routing_context_one_process():
    """Both sliced settings in ONE process, correct results from each
    program (the env-var jit-cache footgun this replaces)."""
    k = 1024
    a = jax.random.normal(jax.random.PRNGKey(0), (8, k), jnp.float64)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, 32), jnp.float64)
    ref = a @ b
    with mm_routing(sliced="always"):
        assert mmmod._use_sliced(jnp.float64, k)
        out_sliced = mm(a, b)
    with mm_routing(sliced="never"):
        assert not mmmod._use_sliced(jnp.float64, k)
        out_plain = mm(a, b)
    assert float(jnp.max(jnp.abs(out_sliced - ref))) < 1e-9
    assert float(jnp.max(jnp.abs(out_plain - ref))) < 1e-9


def test_solver_runs_with_explicit_routing():
    """End-to-end: a solver accepts routing options and converges (CPU:
    the wide kernel is backend-gated off, the option path still routes)."""
    from diaglib_tpu.problems import dense_matvec, diag_precnd, symm_matrix
    from diaglib_tpu.solvers import davidson

    n = 96
    a = symm_matrix(n)
    opts = SolverOptions(n_targ=2, n_max=4, max_iter=60, tol=1e-9,
                         wide_mm="never", sliced_mm="never")
    res = davidson(dense_matvec(a), diag_precnd(jnp.diagonal(a)),
                   jnp.zeros((4, n), jnp.float64), opts,
                   key=jax.random.PRNGKey(1))
    w = jnp.linalg.eigh(a)[0]
    assert bool(res.ok)
    assert float(jnp.max(jnp.abs(res.eig[:2] - w[:2]))) < 1e-7
