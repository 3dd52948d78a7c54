"""Global configuration helpers for diaglib-tpu.

The reference library (diaglib.f90, real_precision.f90:1-4) is hard-wired to
double precision.  On TPU, float64 is emulated and slow, so this library is
dtype-polymorphic instead: every solver works in the dtype of its inputs and
derives machine-epsilon-based thresholds (e.g. tol_ortho = 2*eps,
diaglib.f90:151) from that dtype.  ``enable_x64()`` is a convenience for tests
and CPU runs that want bit-comparable behavior with the Fortran reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["enable_x64", "default_dtype", "eps", "tol_ortho"]


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
