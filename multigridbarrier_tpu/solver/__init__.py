"""Barrier solver core — the MultiGridBarrier.jl algorithm layer
(behavioral contract reconstructed in SURVEY.md §2.3/§3)."""

from .convex import Convex, convex_linear, convex_Euclidian_power, convex_intersect
from .amgb import amgb, AMGBSOL
from .parabolic import parabolic_solve, ParabolicSOL

__all__ = [
    "Convex",
    "convex_linear",
    "convex_Euclidian_power",
    "convex_intersect",
    "amgb",
    "AMGBSOL",
    "parabolic_solve",
    "ParabolicSOL",
]
