"""Precision-safe matmul helpers for TPU's emulated float64.

Empirical finding on TPU (v5e, XLA AOT): an f64 ``dot_general`` whose
operands hold *identical or highly correlated values* silently loses ~7
decimal digits (|rel err| ~ 4e-9 instead of ~3e-15) — e.g. the Gram matrix
``u @ u.T``, or ``v.T @ v`` even when the second operand is a bitwise copy
passed as a separate argument.  Independent operands, and — decisively —
the *same* values scaled by 2.0, are computed at full double precision.
Multiplying one operand by 2 and halving the product are both exact in
binary floating point, so

    (a @ (2*b).T) * 0.5

is a bit-for-bit valid implementation of ``a @ b.T`` that steers clear of
whatever value-correlated fast path the emulation takes.  Every Gram-like
or rotation contraction in the solvers goes through these helpers; on
non-f64 dtypes the scaling costs one fused elementwise pass and changes
nothing.

(See also utils/jacobi.py and utils/reduced.py for the other TPU-float64
accommodations; this one was isolated by a stalled Davidson residual floor
at ~30*eps_f32 that only reproduced on TPU.)
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["mm", "mmT", "mTm"]


def mm(a, b):
    """a @ b (contract last dim of a with first of b), f64-safe on TPU."""
    return (a @ (2.0 * b)) * 0.5


def mmT(a, b):
    """a @ b.T — the Gram-product layout, f64-safe on TPU."""
    return (a @ (2.0 * b).T) * 0.5


def mTm(a, b):
    """a.T @ b, f64-safe on TPU."""
    return (a.T @ (2.0 * b)) * 0.5
