"""fem3d geometry + solve tests (reference: fem3d(T; L, k, K) Q_k hexahedra,
/root/reference/src/MultiGridBarrierMPI.jl:680-687; 3D defaults src:735-745)."""

import numpy as np
import jax.numpy as jnp
import pytest

import multigridbarrier_tpu as mgb


def test_fem3d_quadrature_and_sizes():
    g = mgb.fem3d(L=2, k=3)
    assert g.n == 8 * 64
    x, w = np.asarray(g.x), np.asarray(g.w)
    assert abs(w.sum() - 8.0) < 1e-12  # volume of [-1,1]^3
    # GLL order 3 is exact through degree 5 per axis
    assert abs(np.dot(w, x[:, 0] ** 2) - 8.0 / 3.0) < 1e-12
    assert abs(np.dot(w, x[:, 0] ** 4 * x[:, 1] ** 2) - 8.0 / 15.0) < 1e-12
    assert abs(np.dot(w, x[:, 2] ** 5)) < 1e-12


def test_fem3d_derivatives_exact_on_Qk():
    g = mgb.fem3d(L=1, k=3)
    x = np.asarray(g.x)
    u = x[:, 0] ** 3 * x[:, 1] - x[:, 2] ** 2
    du = np.asarray(g.operators["dx"].matvec(jnp.asarray(u)))
    dz = np.asarray(g.operators["dz"].matvec(jnp.asarray(u)))
    np.testing.assert_allclose(du, 3 * x[:, 0] ** 2 * x[:, 1], atol=1e-11)
    np.testing.assert_allclose(dz, -2 * x[:, 2], atol=1e-11)


def test_fem3d_nesting_and_bases():
    g = mgb.fem3d(L=2, k=2)
    for key in ("dirichlet", "full"):
        R1 = g.subspaces[key][0].to_scipy()
        R2 = g.subspaces[key][1].to_scipy()
        E = g.embed[key][0].to_scipy()
        assert abs(R2 @ E - R1).max() < 1e-12
        for lb, R in zip(g.bases[key], g.subspaces[key]):
            assert abs(lb.to_scipy() - R.to_scipy()).max() < 1e-12


def test_fem3d_dirichlet_boundary():
    g = mgb.fem3d(L=2, k=2)
    R = g.subspaces["dirichlet"][-1].to_scipy()
    x = np.asarray(g.x)
    on_b = (np.abs(np.abs(x) - 1.0) < 1e-12).any(axis=1)
    assert on_b.any()
    assert abs(R[on_b]).max() < 1e-12


def test_fem3d_refine_coarsen_roundtrip():
    g = mgb.fem3d(L=2, k=2)
    rng = np.random.default_rng(7)
    v = rng.standard_normal(g.refine[0].ncols)
    up = g.refine[0].matvec(jnp.asarray(v))
    back = g.coarsen[0].matvec(up)
    np.testing.assert_allclose(np.asarray(back), v, atol=1e-10)


def test_fem3d_solve():
    # end-to-end with the reference's 3D default problem structure
    sol = mgb.fem3d_solve(L=2, k=2, p=1.0, tol=1e-6)
    z = np.asarray(sol.z)
    g = sol.geometry
    du = np.stack(
        [
            np.asarray(g.operators[d].matvec(jnp.asarray(z[:, 0])))
            for d in ("dx", "dy", "dz")
        ],
        axis=1,
    )
    assert (np.linalg.norm(du, axis=1) <= z[:, 1] + 1e-5).all()
    assert sol.SOL_main.its.sum() > 0


def test_fem3d_nd_fine_solver_matches_exact():
    """3D through the ND multifrontal fine solver (VERDICT r3 item 6).

    fem3d L=2 k=3 has 2*125 = 250 fine unknowns; dense_threshold=64
    routes the fine level through the on-device ND multifrontal solver
    (the same path fem3d L=3 k=3 takes at default thresholds, where
    2*1331 = 2662 > 2048).  The pinned objective is the exact-dense
    direct run measured on this problem (default backend, identical
    [6, 91] its); ND directions are exact so both paths agree to the
    floor, but the assert allows the documented cross-platform
    floor-stop variation (~2e-6 relative).  Reference 3D entry:
    /root/reference/src/MultiGridBarrierMPI.jl:696-745.
    """
    import os

    prev = os.environ.get("MGB_FINE_SOLVER")
    try:
        os.environ["MGB_FINE_SOLVER"] = "nd"
        b = mgb.backend_cpu(dense_threshold=64)
        sol = mgb.amgb(mgb.fem3d(L=2, k=3, backend=b), p=1.0)
    finally:
        if prev is None:
            os.environ.pop("MGB_FINE_SOLVER", None)
        else:
            os.environ["MGB_FINE_SOLVER"] = prev
    c = float(sol.SOL_main.c_dot_Dz[-1])
    C_EXACT = 192.49066199206504  # exact-dense direct run, this problem
    assert abs(c - C_EXACT) < 1e-5 * abs(C_EXACT), c
    assert int(sol.SOL_main.its.sum()) < 200


def test_fem3d_custom_K():
    # two stacked unit boxes
    K = []
    for z0 in (0.0, 1.0):
        K.extend(
            [
                [i, j, z0 + kk]
                for kk in range(2)
                for j in range(2)
                for i in range(2)
            ]
        )
    g = mgb.fem3d(L=1, k=2, K=np.asarray(K, dtype=float))
    assert g.discretization.nelem == 2
    assert abs(np.asarray(g.w).sum() - 2.0) < 1e-12
