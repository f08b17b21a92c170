"""End-to-end 1D barrier-solver tests (the reference's test_quick.jl
analogue, SURVEY.md §4 layer 4).

Ground truth is scipy.optimize (SLSQP) on the *identical* discrete NLP —
a fully independent optimizer standing in for the reference's
native-vs-distributed differential test.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import minimize

import multigridbarrier_tpu as mgb


def _discrete_nlp_solution(g, p=2.0, f_cost=(0.5, 0.0, 1.0)):
    """Solve min sum_i w_i (c . Dz_i) s.t. s_i >= |u'_i|^p with scipy SLSQP
    over the finest dirichlet subspace."""
    R = g.subspaces["dirichlet"][-1].to_scipy().toarray()
    n, m = R.shape
    x = np.asarray(g.x)[:, 0]
    w = np.asarray(g.w)
    D = g.operators["dx"].to_scipy().toarray()
    u0 = x ** 2
    s0 = np.full(n, 100.0)

    def fields(v):
        u = u0 + R @ v[:m]
        s = s0 + R @ v[m:]
        return u, s

    def obj(v):
        u, s = fields(v)
        du = D @ u
        return np.dot(w, f_cost[0] * u + f_cost[1] * du + f_cost[2] * s)

    def cons(v):
        u, s = fields(v)
        du = D @ u
        return s - np.abs(du) ** p

    res = minimize(
        obj,
        np.zeros(2 * m),
        constraints=[{"type": "ineq", "fun": cons}],
        method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-12},
    )
    assert res.success, res.message
    u, s = fields(res.x)
    return u, s


@pytest.mark.parametrize("p", [2.0, 1.5])
def test_amgb_1d_matches_slsqp(p):
    g = mgb.fem1d(L=2)
    sol = mgb.amgb(g, p=p, tol=1e-7, verbose=False)
    z = np.asarray(sol.z)
    u_ref, s_ref = _discrete_nlp_solution(g, p=p)
    np.testing.assert_allclose(z[:, 0], u_ref, atol=2e-4)
    np.testing.assert_allclose(z[:, 1], s_ref, atol=2e-3)


def test_amgb_1d_p1_converges():
    g = mgb.fem1d(L=3)
    sol = mgb.amgb(g, p=1.0, tol=1e-7, verbose=False)
    z = np.asarray(sol.z)
    # constraint satisfied pointwise: |u'| <= s
    du = np.asarray(g.operators["dx"].matvec(jnp.asarray(z[:, 0])))
    assert np.all(np.abs(du) <= np.asarray(z[:, 1]) + 1e-6)
    # log contract (reference docs/src/api.md:96-103)
    assert sol.SOL_main.its.shape == (3,)
    assert sol.SOL_main.its.sum() > 0
    assert len(sol.SOL_main.ts) == len(sol.SOL_main.c_dot_Dz)
    assert sol.SOL_main.t_elapsed > 0
    # c_dot_Dz decreases along the path
    cd = sol.SOL_main.c_dot_Dz
    assert cd[-1] <= cd[0]


def test_amgb_boundary_values_preserved():
    # the iterate constraint is z = z0 + R v with R the Dirichlet subspace:
    # z - z0 must lie in range(R) (boundary data enters only through z0,
    # matching the reference's subspace-constrained Newton steps)
    g = mgb.fem1d(L=3)
    sol = mgb.amgb(g, p=1.0, tol=1e-6)
    z = np.asarray(sol.z)
    x = np.asarray(g.x)[:, 0]
    z0 = np.stack([x ** 2, np.full_like(x, 100.0)], axis=1)
    R = g.subspaces["dirichlet"][-1].to_scipy().toarray()
    dz = z - z0
    # least-squares residual of projecting each field onto range(R) ~ 0
    for f in range(2):
        v, res, *_ = np.linalg.lstsq(R, dz[:, f], rcond=None)
        assert np.abs(R @ v - dz[:, f]).max() < 1e-8


def test_amgb_ignores_unknown_kwargs():
    # reference entry points splat the same kwargs into both the geometry
    # builder and amgb (src/MultiGridBarrierMPI.jl:594-600)
    g = mgb.fem1d(L=2)
    sol = mgb.amgb(g, p=1.0, tol=1e-4, L=2, bogus_kwarg=42)
    assert sol.z.shape == (g.n, 2)


def test_fem1d_solve_entrypoint():
    sol = mgb.fem1d_solve(L=2, p=1.0, tol=1e-5)
    # backend_auto may pick a mesh (element-padded rows); the real broken
    # space is always 4 elements x 2 points
    assert sol.z.shape[0] == sol.geometry.n
    assert sol.geometry.n_real == 8
