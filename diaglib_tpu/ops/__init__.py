"""Operator kernels: the hot matvec paths (Pallas on TPU)."""

from .bsr import (
    BSRMatrix,
    bsr_diagonal,
    bsr_from_dense,
    bsr_matvec,
    bsr_to_dense,
    random_bsr_spd,
)

__all__ = [
    "BSRMatrix",
    "bsr_diagonal",
    "bsr_from_dense",
    "bsr_matvec",
    "bsr_to_dense",
    "random_bsr_spd",
]
