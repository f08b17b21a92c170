"""Time-dependent (parabolic) p-Laplace — reference example
(/root/reference/test/test_parabolic.jl:48, parabolic_solve(g; h, t1, p)).

Run:  python examples/parabolic.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import multigridbarrier_tpu as mgb

g = mgb.fem2d(L=2)
psol = mgb.parabolic_solve(g, h=0.25, t1=1.0, p=1.0, verbose=True)

print("time values:", psol.ts)
print("snapshots:", len(psol.u), "of shape", psol.u[0].shape)

mgb.plot_parabolic(psol, fname="parabolic_2d.png")
print("wrote parabolic_2d.png")
