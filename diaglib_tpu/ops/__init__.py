"""Operator kernels: the hot matvec paths (Pallas on TPU)."""

from .bsr import (
    BSRMatrix,
    bsr_diagonal,
    bsr_from_dense,
    bsr_matvec,
    bsr_to_dense,
    random_bsr_spd,
)
from .dist_bsr import DistBSRMatrix, dist_bsr_matvec, distribute_bsr

__all__ = [
    "BSRMatrix",
    "DistBSRMatrix",
    "bsr_diagonal",
    "bsr_from_dense",
    "bsr_matvec",
    "bsr_to_dense",
    "dist_bsr_matvec",
    "distribute_bsr",
    "random_bsr_spd",
]
