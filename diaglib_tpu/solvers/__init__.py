"""Solver drivers (TPU-native re-designs of diaglib.f90's six drivers)."""

from .davidson import davidson, gen_david
from .lobpcg import lobpcg

__all__ = ["davidson", "gen_david", "lobpcg"]
