"""Obstacle problem — a custom convex constraint through the Convex API.

    min   ∫ 3·u + |∇u|²    s.t.   u(x) ≥ φ(x)   (pointwise obstacle)

expressed in the linear-cost barrier framework with a slack field s for
the gradient term and a linear inequality for the obstacle (the same
mechanism as the reference's convex-set constructors).

Run:  python examples/obstacle.py
"""

import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import multigridbarrier_tpu as mgb
from multigridbarrier_tpu.solver.convex import (
    convex_Euclidian_power,
    convex_intersect,
    convex_linear,
)

g = mgb.fem2d(L=3)
dim, k = 2, 4  # D rows: u:id, u:dx, u:dy, s:id


def phi(x):
    # a bump obstacle in the middle of the domain
    return 0.5 - 2.0 * (x[0] ** 2 + x[1] ** 2)


# |∇u|^2 <= s
Q_grad = convex_Euclidian_power(idx=(1, 2, 3), p=2.0)
# u >= phi(x):  -y_0 <= -phi(x)
Q_obstacle = convex_linear(
    A=lambda x: jnp.array([[-1.0, 0.0, 0.0, 0.0]]),
    b=lambda x: jnp.array([-phi(x)]),
)
Q = convex_intersect(Q_grad, Q_obstacle)

sol = mgb.amgb(
    g,
    D=[("u", "id"), ("u", "dx"), ("u", "dy"), ("s", "id")],
    f=lambda x: jnp.array([3.0, 0.0, 0.0, 1.0]),
    g=lambda x: jnp.array([x[0] ** 2 + x[1] ** 2, 100.0]),
    Q=Q,
    tol=1e-7,
    verbose=True,
)

u = np.asarray(sol.z)[:, 0]
x = np.asarray(g.x)
phis = np.array([0.5 - 2.0 * (xx[0] ** 2 + xx[1] ** 2) for xx in x])
print("min(u - phi) =", float((u - phis).min()), "(>= 0 up to tolerance)")
print("its:", sol.SOL_main.its.tolist())
mgb.plot(sol, fname="obstacle_2d.png")
print("wrote obstacle_2d.png")
