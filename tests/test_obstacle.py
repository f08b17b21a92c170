"""Obstacle problem with an infeasible start — regression for two solver
bugs: (a) the phase-1 objective must include the original cost or it is
unbounded below (slack fields ride the barrier's -log(s) to -inf);
(b) Newton-stall acceptance must not trigger in the damped region
(lam2 plateaus there while phi legitimately decreases).

Ground truth: scipy SLSQP on the identical discrete NLP (the reference's
native-vs-distributed differential strategy, SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import minimize

import multigridbarrier_tpu as mgb
from multigridbarrier_tpu.solver.convex import (
    convex_Euclidian_power,
    convex_intersect,
    convex_linear,
)


def _phi(x):
    return 0.5 - 2.0 * (x[..., 0] ** 2 + x[..., 1] ** 2)


def test_obstacle_matches_scipy():
    g = mgb.fem2d(L=2)
    x = np.asarray(g.x)
    w = np.asarray(g.w)
    phis = _phi(x)

    Q = convex_intersect(
        convex_Euclidian_power(idx=(1, 2, 3), p=2.0),
        convex_linear(
            A=lambda xx: jnp.array([[-1.0, 0.0, 0.0, 0.0]]),
            b=lambda xx: jnp.array([-(0.5 - 2.0 * (xx[0] ** 2 + xx[1] ** 2))]),
        ),
    )
    sol = mgb.amgb(
        g,
        D=[("u", "id"), ("u", "dx"), ("u", "dy"), ("s", "id")],
        f=lambda xx: jnp.array([3.0, 0.0, 0.0, 1.0]),
        g=lambda xx: jnp.array([xx[0] ** 2 + xx[1] ** 2, 100.0]),
        Q=Q,
        tol=1e-7,
    )
    z = np.asarray(sol.z)
    # infeasible start -> feasibility phase must have run
    assert sol.SOL_feasibility.its.sum() > 0
    # obstacle satisfied and ACTIVE (binding) at the center
    assert (z[:, 0] - phis).min() > -1e-6
    assert (z[:, 0] - phis).min() < 1e-3

    # scipy on the identical discrete NLP
    R = g.subspaces["dirichlet"][-1].to_scipy().toarray()
    Dx = g.operators["dx"].to_scipy().toarray()
    Dy = g.operators["dy"].to_scipy().toarray()
    n, m = R.shape
    u0 = x[:, 0] ** 2 + x[:, 1] ** 2
    s0 = np.full(n, 100.0)

    def fields(v):
        return u0 + R @ v[:m], s0 + R @ v[m:]

    def obj(v):
        u, s = fields(v)
        return np.dot(w, 3 * u + s)

    cons = [
        {"type": "ineq", "fun": lambda v: (lambda u, s: s - (Dx @ u) ** 2 - (Dy @ u) ** 2)(*fields(v))},
        {"type": "ineq", "fun": lambda v: fields(v)[0] - phis},
    ]
    res = minimize(
        obj, np.zeros(2 * m), constraints=cons, method="SLSQP",
        options={"maxiter": 800, "ftol": 1e-12},
    )
    assert res.success
    cost_amgb = float(np.dot(w, 3 * z[:, 0] + z[:, 1]))
    assert abs(cost_amgb - res.fun) < 1e-3 * (1 + abs(res.fun))
    u_ref, _ = fields(res.x)
    np.testing.assert_allclose(z[:, 0], u_ref, atol=2e-3)
