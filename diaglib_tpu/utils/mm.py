"""Precision-safe matmul helpers for TPU's emulated float64.

Empirical findings on TPU (v5e, XLA AOT), isolated from a Davidson residual
stall that only reproduced on TPU:

* an f64 ``dot_general`` whose operands hold *identical or highly
  correlated values* (any Gram-like product ``u @ u.T``, ``v.T @ v`` — even
  through optimization barriers or bitwise copies) silently loses ~7
  decimal digits; independent operands are computed at full precision;
* multiplying one operand by 2.0 restores full precision for contraction
  lengths up to ~4096, but the defect returns for longer contractions;
* chunking the contraction dimension to <= 4096 inside a ``lax.scan`` (so
  XLA cannot re-fuse the partial dots) with the x2 scaling per chunk is
  fully accurate at every length tested (verified to 65536).

Multiplying by 2 and halving are exact in binary floating point, and the
f64 partial-sum additions are exact emulated adds, so these helpers are
bit-sane implementations of ``a @ b``-style contractions that route around
whatever value-correlated fast path the emulation takes.  Every Gram-like
or rotation contraction in the solvers goes through them; for non-f64
dtypes and short contractions they reduce to a single scaled matmul.

On TPU, long f64 contractions additionally dispatch to the Ozaki
integer-sliced path (ops/slicing.py): exact int8-MXU slice products beat
the chunked emulated-f64 scan (measured 1.3x+ at K=65536 on v5e) at equal
or better accuracy (no rounding inside the contraction at all).  Set
``DIAGLIB_TPU_SLICED_MM=always|never`` to override the auto dispatch
(``always`` is how the CPU test suite exercises the sliced route).  The
variable is read at trace time: jit caches do not key on env vars, so set
it before the first compilation of a solver.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["mm", "mmT", "mTm"]

_CHUNK = 4096
_SLICED_MIN_K = 8192

# trace-time call-site tag for wide-route bisection (DIAGLIB_TPU_WIDE_SITES)
_wide_site = "untagged"


class wide_site:
    """Context manager tagging mm/mTm call sites at trace time (debug)."""

    def __init__(self, name):
        self.name = name

    def __enter__(self):
        global _wide_site
        self.prev = _wide_site
        _wide_site = self.name

    def __exit__(self, *a):
        global _wide_site
        _wide_site = self.prev


def _use_sliced(dtype, k):
    # NOTE: read at TRACE time — jit caches do not key on env vars, so
    # changing DIAGLIB_TPU_SLICED_MM after a solver is compiled has no
    # effect on the cached executable
    mode = os.environ.get("DIAGLIB_TPU_SLICED_MM", "auto")
    if mode == "never":
        return False
    from ..ops.slicing import fits_exact
    if mode == "always":
        return dtype == jnp.float64 and fits_exact(k)
    return (dtype == jnp.float64 and k >= _SLICED_MIN_K and fits_exact(k)
            and jax.default_backend() == "tpu")


def _use_wide(dtype, k, m, n):
    """Route short-contraction WIDE-output products (Ritz rotations,
    ortho projections: (m, k) @ (k, n) with k ~ subspace size, n ~ vector
    length) to the level-folded int8 kernel: the emulated-f64 matmul
    costs ~7 ms at (15, 165) x (165, 65536) on v5e, the sliced kernel
    ~1 ms at the same exactness."""
    if os.environ.get("DIAGLIB_TPU_SLICED_MM", "auto") == "never":
        return False
    mode = os.environ.get("DIAGLIB_TPU_WIDE_MM", "auto")
    if mode == "never":
        return False
    if mode == "auto":
        # default OFF: the kernel itself is correct (isolated + composed
        # repros pass), but its 35 MB int32 outputs are prime targets for
        # XLA's VMEM memory-space-assignment, whose oversubscription next
        # to the sliced SpMM's scoped reservation crashes the v5e worker
        # (see utils/compile.py).  Opt in with DIAGLIB_TPU_WIDE_MM=always
        # together with DIAGLIB_TPU_NO_VMEM_MSA=1.
        return False
    use = (dtype == jnp.float64 and jax.default_backend() == "tpu"
           and k <= 4096 and m <= 1024 and n >= 8192
           and n % 256 == 0 and k * (1 << 12) < (1 << 31))
    if use and mode.startswith("kmin:"):
        use = k >= int(mode[5:])
    elif use and mode.startswith("kmax:"):
        use = k <= int(mode[5:])
    sites = os.environ.get("DIAGLIB_TPU_WIDE_SITES")
    if use and sites:
        use = _wide_site in sites.split(",")
    if use and os.environ.get("DIAGLIB_TPU_MM_LOG"):
        print(f"[mm] wide route: ({m}, {k}) @ ({k}, {n}) site={_wide_site}",
              flush=True)
    return use


def _scaled(a, b):
    return (a @ (2.0 * b)) * 0.5


def _needs_chunking(dtype, k):
    return dtype == jnp.float64 and k > _CHUNK


def _chunk_sizes(k):
    nc = k // _CHUNK
    return nc, nc * _CHUNK


def mmT(a, b):
    """a @ b.T (Gram layout, contracting the last axes), f64-safe on TPU."""
    k = a.shape[-1]
    if _use_sliced(a.dtype, k):
        from ..ops.slicing import sliced_mmT
        return sliced_mmT(a, b)
    if not _needs_chunking(a.dtype, k):
        return (a @ (2.0 * b).T) * 0.5
    nc, k_main = _chunk_sizes(k)
    aa = a[..., :k_main].reshape(a.shape[0], nc, _CHUNK).transpose(1, 0, 2)
    bb = b[..., :k_main].reshape(b.shape[0], nc, _CHUNK).transpose(1, 0, 2)

    def body(acc, xy):
        x, y = xy
        return acc + (x @ (2.0 * y).T) * 0.5, None

    acc0 = jnp.zeros((a.shape[0], b.shape[0]), a.dtype)
    out, _ = jax.lax.scan(body, acc0, (aa, bb))
    if k_main < k:
        out = out + (a[..., k_main:] @ (2.0 * b[..., k_main:]).T) * 0.5
    return out


def mm(a, b):
    """a @ b (contract last dim of a with first of b), f64-safe on TPU."""
    k = a.shape[-1]
    if _use_sliced(a.dtype, k):
        from ..ops.slicing import sliced_mm
        return sliced_mm(a, b)
    if a.ndim == 2 and b.ndim == 2 and _use_wide(a.dtype, k, a.shape[0],
                                                b.shape[-1]):
        from ..ops.slicing import sliced_wide_mm
        return sliced_wide_mm(a, b)
    if not _needs_chunking(a.dtype, k):
        return _scaled(a, b)
    nc, k_main = _chunk_sizes(k)
    aa = a[:, :k_main].reshape(a.shape[0], nc, _CHUNK).transpose(1, 0, 2)
    bb = b[:k_main].reshape(nc, _CHUNK, b.shape[1])

    def body(acc, xy):
        x, y = xy
        return acc + _scaled(x, y), None

    acc0 = jnp.zeros((a.shape[0], b.shape[1]), a.dtype)
    out, _ = jax.lax.scan(body, acc0, (aa, bb))
    if k_main < k:
        out = out + _scaled(a[:, k_main:], b[k_main:])
    return out


def mTm(a, b):
    """a.T @ b (contract the first axes), f64-safe on TPU."""
    k = a.shape[0]
    if _use_sliced(a.dtype, k):
        from ..ops.slicing import sliced_mTm
        return sliced_mTm(a, b)
    if a.ndim == 2 and b.ndim == 2 and _use_wide(a.dtype, k, a.shape[1],
                                                b.shape[-1]):
        from ..ops.slicing import sliced_wide_mm
        return sliced_wide_mm(a.T, b)
    if not _needs_chunking(a.dtype, k):
        return (a.T @ (2.0 * b)) * 0.5
    nc, k_main = _chunk_sizes(k)
    aa = a[:k_main].reshape(nc, _CHUNK, a.shape[1])
    bb = b[:k_main].reshape(nc, _CHUNK, b.shape[1])

    def body(acc, xy):
        x, y = xy
        return acc + (x.T @ (2.0 * y)) * 0.5, None

    acc0 = jnp.zeros((a.shape[1], b.shape[1]), a.dtype)
    out, _ = jax.lax.scan(body, acc0, (aa, bb))
    if k_main < k:
        out = out + (a[k_main:].T @ (2.0 * b[k_main:])) * 0.5
    return out
