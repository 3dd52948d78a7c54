"""Solver drivers (TPU-native re-designs of diaglib.f90's six drivers)."""

from .caslr import caslr, caslr_eff
from .davidson import davidson, gen_david
from .lobpcg import lobpcg
from .nonsym import nonsym

__all__ = ["caslr", "caslr_eff", "davidson", "gen_david", "lobpcg", "nonsym"]
