"""Geometry-construction tests: shapes, quadrature exactness, operator
consistency, hierarchy nesting (the reference's structural tests,
test/test_amg_structure.jl, test/test_nonsquare.jl)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multigridbarrier_tpu import fem1d, fem2d


def test_fem1d_sizes():
    for L in (2, 3, 4):
        g = fem1d(L=L)
        assert g.n == 2 ** (L + 1)  # 2 Gauss points per element
        dims = g.subspace_dims("dirichlet")
        assert dims == tuple(2 ** l - 1 for l in range(1, L + 1))
        assert len(g.refine) == L - 1 and len(g.coarsen) == L - 1


def test_fem2d_sizes():
    # n = 14 * 4^(L-1): the reference grid-size law
    # (/root/reference/docs/src/guide.md:246-253).
    for L in (1, 2, 3):
        g = fem2d(L=L)
        assert g.n == 14 * 4 ** (L - 1)


def test_fem1d_quadrature_integrates_polys():
    g = fem1d(L=3)
    x = np.asarray(g.x)[:, 0]
    w = np.asarray(g.w)
    # 2-pt Gauss: exact for cubics on each element
    for k, exact in [(0, 2.0), (1, 0.0), (2, 2.0 / 3.0), (3, 0.0)]:
        assert abs(np.dot(w, x ** k) - exact) < 1e-12


def test_fem2d_quadrature_integrates_polys():
    g = fem2d(L=2)
    x = np.asarray(g.x)
    w = np.asarray(g.w)
    assert abs(w.sum() - 4.0) < 1e-12  # area of [-1,1]^2
    assert abs(np.dot(w, x[:, 0]) - 0.0) < 1e-12
    assert abs(np.dot(w, x[:, 0] ** 2) - 4.0 / 3.0) < 1e-12
    assert abs(np.dot(w, x[:, 0] * x[:, 1])) < 1e-12
    # degree 3 (rule is exact for cubics)
    assert abs(np.dot(w, x[:, 0] ** 3)) < 1e-12
    assert abs(np.dot(w, x[:, 0] ** 2 * x[:, 1])) < 1e-12


@pytest.mark.parametrize("builder,dim", [(fem1d, 1), (fem2d, 2)])
def test_derivative_operators_exact_on_quadratics(builder, dim):
    # broken spaces contain quadratics (1D: only linears), so dx must be
    # exact on them
    g = builder(L=2)
    x = np.asarray(g.x)
    if dim == 1:
        u = 3.0 * x[:, 0] + 1.0
        du = np.asarray(g.operators["dx"].matvec(jnp.asarray(u)))
        np.testing.assert_allclose(du, 3.0, atol=1e-12)
    else:
        u = x[:, 0] ** 2 + 2.0 * x[:, 0] * x[:, 1] - x[:, 1]
        du = np.asarray(g.operators["dx"].matvec(jnp.asarray(u)))
        dv = np.asarray(g.operators["dy"].matvec(jnp.asarray(u)))
        np.testing.assert_allclose(du, 2 * x[:, 0] + 2 * x[:, 1], atol=1e-11)
        np.testing.assert_allclose(dv, 2 * x[:, 0] - 1.0, atol=1e-11)


@pytest.mark.parametrize("builder", [fem1d, fem2d])
def test_subspace_nesting(builder):
    # R_{l+1} @ E_l == R_l : conforming spaces are nested, which is what
    # makes coarse-level Newton corrections legal at finer levels.
    g = builder(L=3)
    for key in ("dirichlet", "full"):
        for l in range(g.levels - 1):
            R1 = g.subspaces[key][l].to_scipy()
            R2 = g.subspaces[key][l + 1].to_scipy()
            E = g.embed[key][l].to_scipy()
            assert abs(R2 @ E - R1).max() < 1e-12


@pytest.mark.parametrize("builder", [fem1d, fem2d])
def test_subspace_continuity(builder):
    # functions in the conforming subspace must have exact values of a
    # continuous function: interpolate f(x)=x0 via the full subspace at the
    # finest level and check broken values match f at quadrature points.
    g = builder(L=2)
    R = g.subspaces["full"][-1].to_scipy()
    x = np.asarray(g.x)
    # solve least squares for nodal values of f(x)=x0 (exact since linear
    # functions are in the space)
    f_broken = x[:, 0]
    v, *_ = np.linalg.lstsq(R.toarray(), f_broken, rcond=None)
    np.testing.assert_allclose(R @ v, f_broken, atol=1e-10)


@pytest.mark.parametrize("builder", [fem1d, fem2d])
def test_refine_coarsen_roundtrip(builder):
    # coarsen(refine(v)) == v on the broken space (level transfer contract)
    g = builder(L=3)
    rng = np.random.default_rng(3)
    for l in range(g.levels - 1):
        nc = g.refine[l].ncols
        v = rng.standard_normal(nc)
        up = g.refine[l].matvec(jnp.asarray(v))
        back = g.coarsen[l].matvec(up)
        np.testing.assert_allclose(np.asarray(back), v, atol=1e-10)


def test_fem2d_dirichlet_boundary():
    # dirichlet subspace functions vanish at boundary quadrature points
    g = fem2d(L=2)
    R = g.subspaces["dirichlet"][-1].to_scipy()
    x = np.asarray(g.x)
    on_boundary = (np.abs(np.abs(x[:, 0]) - 1.0) < 1e-12) | (
        np.abs(np.abs(x[:, 1]) - 1.0) < 1e-12
    )
    vals = abs(R[on_boundary]).max() if on_boundary.any() else 0.0
    assert on_boundary.any()
    assert vals < 1e-12


def test_fem2d_custom_K():
    # reference K format: (3*nt, 2) triangle vertex matrix
    # (docs/src/guide.md:317)
    K = np.array(
        [[0.0, 0.0], [2.0, 0.0], [2.0, 1.0], [0.0, 0.0], [2.0, 1.0], [0.0, 1.0]]
    )
    g = fem2d(L=2, K=K)
    assert g.n == 56
    assert abs(np.asarray(g.w).sum() - 2.0) < 1e-12
    # nesting still holds on the custom mesh
    R1 = g.subspaces["dirichlet"][0].to_scipy()
    R2 = g.subspaces["dirichlet"][1].to_scipy()
    E = g.embed["dirichlet"][0].to_scipy()
    assert abs(R2 @ E - R1).max() < 1e-12


def test_int64_index_backend():
    """Backend.itype = int64 must flow into every index array (the
    reference's Ti=Int64 control for >2B-nnz problems,
    src/MultiGridBarrierMPI.jl:233-234) and solve identically to int32."""
    import jax.numpy as jnp
    import multigridbarrier_tpu as mgb

    b64 = mgb.backend_cpu(itype=jnp.int64)
    g = mgb.fem2d(L=2, backend=b64)
    for R in g.subspaces["dirichlet"]:
        assert R.cols.dtype == jnp.int64, R.cols.dtype
    for B in g.bases["dirichlet"]:
        assert B.idx.dtype == jnp.int64, B.idx.dtype
        assert B.scatter_idx.dtype == jnp.int64, B.scatter_idx.dtype

    sol64i = mgb.amgb(g, p=1.0, tol=1e-6)
    sol32i = mgb.amgb(mgb.fem2d(L=2), p=1.0, tol=1e-6)
    diff = np.abs(np.asarray(sol64i.z) - np.asarray(sol32i.z)).max()
    assert diff < 1e-9, diff
