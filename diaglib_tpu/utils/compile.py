"""TPU compile options that keep Pallas-heavy programs inside VMEM.

XLA's memory-space-assignment (MSA) pass promotes large HLO buffers into
VMEM ("alternate memory", layout tag ``S(1)``) to save HBM round trips.
On programs that also run Pallas kernels with large *scoped* VMEM
reservations (the resident-accumulator SpMM of ops/bsr_sliced_sym.py asks
for ~70 MB; every other kernel holds the 16 MB default), MSA's accounting
oversubscribes the 128 MB of VMEM: at run time the allocator cannot place
a promoted buffer next to the scoped reservation and the TPU worker dies
with ``Check failed: buffer != nullptr`` / "TPU worker process crashed".

Empirically (see DESIGN.md, runtime-quirk table):

* the crash needs the *composition* — the same kernels run standalone
  because MSA has nothing else worth promoting there;
* ``xla_vf_max_vmem_used_by_memory_space_assignment`` (the budget knob for
  the v5 "viperfish" family) does NOT prevent it at 16 MB;
* ``xla_vf_vmem_memory_space_assignment=false`` removes every ``S(1)``
  promotion and the programs run.

:func:`tpu_compiler_options` returns that override for the TPU backends
that need it (v5 family); :func:`safe_jit` is ``jax.jit`` with the options
pre-applied.  Pass any extra jit kwargs through.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["tpu_compiler_options", "safe_jit"]


@functools.lru_cache(maxsize=None)
def _device_kind_options(kind: str, backend: str):
    if backend != "tpu":
        return None
    # v5 family = "viperfish" flag prefix ("TPU v5 lite" / "TPU v5").
    # Other generations keep MSA on until shown to need the same guard —
    # the flag prefixes differ per generation (jf/df/pf/vf/gf) and an
    # unknown option key fails the compile.
    if "v5" in kind:
        return {"xla_vf_vmem_memory_space_assignment": "false"}
    return None


def tpu_compiler_options():
    """Compiler-option overrides for the current default backend.

    Returns a dict usable as ``jax.jit(..., compiler_options=...)``.

    Disabling MSA costs real performance (the flagship ladder measured
    1.48 s vs 0.94 s with promotions on), so the guard is OPT-IN via
    ``DIAGLIB_TPU_NO_VMEM_MSA=1``: programs near the VMEM cliff (big
    scoped reservations + many promotable Pallas outputs) set it — or are
    re-run with it after a worker crash, which is how bench.py's section
    retry uses it.  The milder budget knobs were probed and do NOT
    prevent the overflow (``xla_vf_max_vmem_used_by_memory_space_assignment``
    leaves the S(1) promotions in place at any value;
    ``xla_tpu_msa_reduce_scoped_vmem_limit`` crashes the compiler;
    ``xla_tpu_scoped_vmem_limit_kib`` only grows the reservation).
    """
    import os

    if not os.environ.get("DIAGLIB_TPU_NO_VMEM_MSA"):
        return {}
    try:
        backend = jax.default_backend()
        kind = jax.devices()[0].device_kind if backend == "tpu" else ""
    except RuntimeError:
        return {}
    return dict(_device_kind_options(kind, backend) or {})


def safe_jit(fun=None, **jit_kwargs):
    """``jax.jit`` with the VMEM-MSA guard applied on TPU backends.

    Use for any program that mixes Pallas kernels with big scoped-VMEM
    reservations (the sliced SpMM operators) into larger jitted programs
    (solver loops).  Usable as decorator or call: ``safe_jit(f)`` or
    ``@safe_jit``.
    """
    if fun is None:
        return lambda f: safe_jit(f, **jit_kwargs)
    opts = tpu_compiler_options()
    if opts:
        merged = dict(opts)
        merged.update(jit_kwargs.pop("compiler_options", None) or {})
        return jax.jit(fun, compiler_options=merged, **jit_kwargs)
    return jax.jit(fun, **jit_kwargs)
