"""Objective-value regression against the exact-direct-solve trajectory.

Mid-path barrier Hessians reach cond ~ 1e15; inexact Newton directions
silently drift the iterate off the central path and the solver then
reports convergence at a measurably suboptimal point (measured: MG-CG at
fem2d L=5 lands 1.3e-3 .. 2.0e-3 above the exact-solve objective — see
tools/probe_mult_schwarz.py and the dense_threshold docstring).  These
tests pin the default configuration to exact-solver objectives so any
future linear-solver change that degrades direction quality fails loudly
instead of "converging" to the wrong answer.

Values produced by tools/check_exact.py (dense Cholesky at EVERY level,
the reference's MUMPS trajectory, SURVEY.md §3.5).
"""

import numpy as np

import multigridbarrier_tpu as mgb

# exact-solver objectives, fem2d p=1 defaults (tools/check_exact.py)
C_EXACT = {
    4: 50.618082533590,
    5: 27.360702531510,
}


def test_fem2d_L4_objective_matches_exact():
    sol = mgb.amgb(mgb.fem2d(L=4), p=1.0)
    c = float(sol.SOL_main.c_dot_Dz[-1])
    assert abs(c - C_EXACT[4]) < 5e-7 * abs(C_EXACT[4])


def test_fem2d_L5_objective_matches_exact():
    # L=5's finest level (nf*m = 1922) must sit on the direct path by
    # default (dense_threshold >= 2048); with it, the whole trajectory is
    # exact-direct and lands on the exact objective.
    sol = mgb.amgb(mgb.fem2d(L=5), p=1.0)
    c = float(sol.SOL_main.c_dot_Dz[-1])
    assert abs(c - C_EXACT[5]) < 5e-7 * abs(C_EXACT[5])
