"""Utility-layer tests: plotting, save/load, io0, host conversion."""

import os

import numpy as np
import pytest

import multigridbarrier_tpu as mgb


@pytest.fixture(scope="module")
def sol_1d():
    return mgb.fem1d_solve(L=2, p=1.0, tol=1e-5)


def test_io0_stream(capsys):
    print("hello", file=mgb.io0())
    assert "hello" in capsys.readouterr().out


def test_save_load_roundtrip(sol_1d, tmp_path):
    f = str(tmp_path / "sol.npz")
    mgb.save_solution(f, sol_1d)
    back = mgb.load_solution(f)
    np.testing.assert_array_equal(back["z"], np.asarray(sol_1d.z))
    assert back["kind"] == "amgb"
    assert back["main_its"].sum() == sol_1d.SOL_main.its.sum()


def test_plot_1d(sol_1d, tmp_path):
    f = str(tmp_path / "u.png")
    mgb.plot(sol_1d, fname=f)
    assert os.path.getsize(f) > 0


def test_plot_2d(tmp_path):
    sol = mgb.fem2d_solve(L=2, p=1.0, tol=1e-5)
    f = str(tmp_path / "u2.png")
    mgb.plot(sol, fname=f)
    assert os.path.getsize(f) > 0


def test_parabolic_save_plot(tmp_path):
    psol = mgb.parabolic_solve(mgb.fem1d(L=2), h=0.5, t1=1.0, p=1.0, tol=1e-5)
    f = str(tmp_path / "p.npz")
    mgb.save_solution(f, psol)
    back = mgb.load_solution(f)
    assert back["kind"] == "parabolic"
    assert len(back["ts"]) == 3
    g = str(tmp_path / "p.png")
    mgb.plot_parabolic(psol, fname=g)
    assert os.path.getsize(g) > 0


def test_device_to_native(sol_1d):
    native = mgb.device_to_native(sol_1d)
    assert isinstance(np.asarray(native.z), np.ndarray)
    # nested solve records are deep-converted (reference mpi_to_native on
    # AMGBSOL recursively converts SOL_* and the geometry, src:409-474)
    assert isinstance(native.geometry, mgb.NativeGeometry)
    assert isinstance(native.SOL_main.its, np.ndarray)
    gn = mgb.device_to_native(sol_1d.geometry)
    assert isinstance(gn.x, np.ndarray)


def _assert_geometry_roundtrip(g):
    import scipy.sparse as sp

    ng = mgb.device_to_native(g)
    # every operator/subspace/refine/coarsen/embed is host scipy
    for A in (
        list(ng.operators.values())
        + [R for v in ng.subspaces.values() for R in v]
        + list(ng.refine)
        + list(ng.coarsen)
        + [E for v in ng.embed.values() for E in v]
    ):
        assert sp.issparse(A)

    g2 = mgb.native_to_device(ng, g.backend)
    np.testing.assert_allclose(np.asarray(g2.x), np.asarray(g.x), atol=1e-15)
    np.testing.assert_allclose(np.asarray(g2.w), np.asarray(g.w), atol=1e-15)
    for name, op in g.operators.items():
        d = abs(g2.operators[name].to_scipy() - op.to_scipy()).max()
        assert d < 1e-15, (name, d)
    for key in g.subspaces:
        for R, R2 in zip(g.subspaces[key], g2.subspaces[key]):
            assert abs(R2.to_scipy() - R.to_scipy()).max() < 1e-15
        for B, B2 in zip(g.bases[key], g2.bases[key]):
            assert abs(B2.to_scipy() - B.to_scipy()).max() < 1e-15
    for seq, seq2 in ((g.refine, g2.refine), (g.coarsen, g2.coarsen)):
        for R, R2 in zip(seq, seq2):
            assert abs(R2.to_scipy() - R.to_scipy()).max() < 1e-15
    for key in g.embed:
        for E, E2 in zip(g.embed[key], g2.embed[key]):
            assert abs(E2.to_scipy() - E.to_scipy()).max() < 1e-15


def test_native_roundtrip_fem1d():
    _assert_geometry_roundtrip(mgb.fem1d(L=3))


def test_native_roundtrip_fem2d():
    _assert_geometry_roundtrip(mgb.fem2d(L=2))


def test_native_roundtrip_solve_parity():
    """A geometry rebuilt from its host form must solve identically."""
    g = mgb.fem2d(L=2)
    g2 = mgb.native_to_device(mgb.device_to_native(g), g.backend)
    z1 = np.asarray(mgb.amgb(g, p=1.0, tol=1e-6).z)
    z2 = np.asarray(mgb.amgb(g2, p=1.0, tol=1e-6).z)
    assert np.abs(z1 - z2).max() < 1e-10


def test_checkpoint_resume(tmp_path):
    # documented recipe (docs/guide.md): persist z + barrier t, continue the
    # path at tighter tolerance; must match a from-scratch solve
    import multigridbarrier_tpu as mgb

    g = mgb.fem1d(L=3)
    sol = mgb.amgb(g, p=2.0, tol=1e-4)
    f = str(tmp_path / "ck.npz")
    mgb.save_solution(f, sol)
    ck = mgb.load_solution(f)
    sol2 = mgb.amgb(g, p=2.0, tol=1e-7, z0=ck["z"], t=float(ck["main_ts"][-1]))
    sol_direct = mgb.amgb(mgb.fem1d(L=3), p=2.0, tol=1e-7)
    diff = np.abs(np.asarray(sol2.z) - np.asarray(sol_direct.z)).max()
    assert diff < 1e-7 * 1000
    # warm start must save Newton work
    assert sol2.SOL_main.its.sum() < sol_direct.SOL_main.its.sum()
