"""Global configuration helpers for diaglib-tpu.

The reference library (diaglib.f90, real_precision.f90:1-4) is hard-wired to
double precision.  On TPU, float64 is emulated and slow, so this library is
dtype-polymorphic instead: every solver works in the dtype of its inputs and
derives machine-epsilon-based thresholds (e.g. tol_ortho = 2*eps,
diaglib.f90:151) from that dtype.  ``enable_x64()`` is a convenience for tests
and CPU runs that want bit-comparable behavior with the Fortran reference.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = [
    "enable_x64",
    "default_dtype",
    "eps",
    "tol_ortho",
    "enable_persistent_cache",
]


def enable_x64(enable: bool = True) -> None:
    """Enable float64 globally (matches the reference's ``dp = 8``)."""
    jax.config.update("jax_enable_x64", enable)


def default_dtype():
    """float64 if x64 is enabled, else float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def eps(dtype) -> float:
    """Machine epsilon of ``dtype`` (Fortran ``epsilon(one)``)."""
    return float(jnp.finfo(dtype).eps)


def tol_ortho(dtype) -> float:
    """Orthogonalization threshold, ``2 * epsilon`` (diaglib.f90:151)."""
    return 2.0 * eps(dtype)


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at ``path`` and return it.

    TPU AOT compiles of the big solver programs cost 300-700 s *each* on a
    remote-compile runtime; the reference's user-felt setup cost is zero
    (gfortran once, Makefile:4-8).  The persistent cache closes that gap:
    an unchanged program re-loads in ~1 s (verified on the axon TPU
    runtime: serialized executables round-trip, including Pallas
    ``tpu_custom_call`` programs and ``compiler_options`` overrides, which
    participate in the cache key).

    Default path: ``$DIAGLIB_TPU_CACHE_DIR`` or ``<repo>/.xla_cache``.
    Safe to call more than once.
    """
    if path is None:
        path = os.environ.get("DIAGLIB_TPU_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".xla_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
