"""Parabolic (implicit time-stepping) tests — reference
test/test_parabolic.jl:48-104: parabolic_solve(g; h, t1, p, verbose),
result fields geometry/ts/u, len(u) == len(ts), per-snapshot agreement."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import multigridbarrier_tpu as mgb
from multigridbarrier_tpu.backend import Backend, make_mesh


def test_parabolic_contract_1d():
    g = mgb.fem1d(L=2)
    sol = mgb.parabolic_solve(g, h=0.5, t1=1.0, p=1.0)
    assert sol.geometry is g  # same geometry reused (reference :51)
    assert len(sol.u) == len(sol.ts)  # reference :52-53
    assert sol.ts == [0.0, 0.5, 1.0]
    for u in sol.u:
        assert np.isfinite(np.asarray(u)).all()


def test_parabolic_diffusion_decays():
    # implicit p-Laplace diffusion with zero source contracts u towards
    # its boundary data; check the time evolution is monotone in energy
    g = mgb.fem1d(L=3)
    sol = mgb.parabolic_solve(g, h=0.25, t1=0.75, p=2.0, f1=0.0)
    w = np.asarray(g.w)
    u0 = np.asarray(sol.u[0])[:, 0]
    norms = [float(np.dot(w, (np.asarray(u)[:, 0] - u0) ** 2)) for u in sol.u]
    # changes from the initial snapshot grow smoothly (no blowup)
    assert all(np.isfinite(norms))
    du = np.asarray(sol.u[-1])[:, 0] - u0
    assert np.abs(du).max() < 10.0


def test_parabolic_2d_runs():
    g = mgb.fem2d(L=2)
    sol = mgb.parabolic_solve(g, h=0.5, t1=1.0, p=1.0)
    assert len(sol.u) == 3
    assert sol.u[0].shape == (g.n, 3)  # fields (u, s1, s2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_parabolic_parity_8dev():
    # the reference's per-snapshot MPI-vs-native agreement
    # (test/test_parabolic.jl:101-104), as 1-vs-8-device parity
    sol1 = mgb.parabolic_solve(mgb.fem1d(L=2), h=0.5, t1=1.0, p=1.0, tol=1e-7)
    b8 = Backend(dtype=jnp.float64, mesh=make_mesh(8))
    sol8 = mgb.parabolic_solve(
        mgb.fem1d(L=2, backend=b8), h=0.5, t1=1.0, p=1.0, tol=1e-7
    )
    # the meshed geometry is element-padded to 8; compare real rows only
    nr = sol8.geometry.n_real
    assert nr == sol1.geometry.n
    for u1, u8 in zip(sol1.u, sol8.u):
        assert np.abs(np.asarray(u1) - np.asarray(u8)[:nr]).max() < 1e-4
