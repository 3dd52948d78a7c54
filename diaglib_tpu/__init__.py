"""diaglib-tpu: a TPU-native, matrix-free iterative eigensolver library.

Built from scratch in JAX (XLA/Pallas/pjit) with the capabilities of
Molecolab-Pisa/diaglib (see SURVEY.md): block Davidson-Liu, LOBPCG
(standard + generalized), generalized Davidson, two Casida linear-response
solvers, and a two-sided nonsymmetric Davidson, on top of a family of
numerically hardened orthogonalization kernels.
"""

from . import config, ortho, utils
from .utils.compile import safe_jit, tpu_compiler_options
from .types import (
    LROps,
    LRSolverResult,
    NonsymResult,
    SolverOptions,
    SolverResult,
)

__version__ = "0.2.0"
