"""Solver drivers (TPU-native re-designs of diaglib.f90's six drivers)."""

from .caslr import caslr, caslr_eff
from .davidson import davidson, gen_david
from .lobpcg import lobpcg
from .mixed import davidson_ladder, lobpcg_ladder
from .nonsym import nonsym

__all__ = ["caslr", "caslr_eff", "davidson", "davidson_ladder", "gen_david",
           "lobpcg", "lobpcg_ladder", "nonsym"]
