"""Float32 end-to-end solves (the reference's Float32/Metal configuration,
test/test_utils.jl:38-61 with tolerance(T)=1e-4 for Float32,
test/test_utils.jl:118-119)."""

import numpy as np
import jax.numpy as jnp
import pytest

import multigridbarrier_tpu as mgb


def test_fem2d_f32_solve_matches_f64():
    b32 = mgb.backend_cpu(dtype=jnp.float32)
    sol32 = mgb.amgb(mgb.fem2d(L=2, backend=b32), p=1.0, tol=1e-4)
    assert np.asarray(sol32.z).dtype == np.float32
    sol64 = mgb.amgb(mgb.fem2d(L=2), p=1.0, tol=1e-4)
    z64 = np.asarray(sol64.z)
    diff = np.abs(np.asarray(sol32.z) - z64).max()
    # norm-relative bound: the reference's Float32 contract is
    # tolerance(T)=1e-4 checked at x1000 (test/test_utils.jl:118-119), but
    # scaled by the solution magnitude (||z||_inf = 100 via the boundary
    # field) an absolute 1e-1 barely constrains anything
    rel = diff / np.abs(z64).max()
    assert rel < 2e-4, (diff, rel)


def test_fem1d_f32_constraint():
    b32 = mgb.backend_cpu(dtype=jnp.float32)
    g = mgb.fem1d(L=3, backend=b32)
    sol = mgb.amgb(g, p=1.0, tol=1e-4)
    z = np.asarray(sol.z)
    du = np.asarray(g.operators["dx"].matvec(jnp.asarray(z[:, 0])))
    assert np.all(np.abs(du) <= z[:, 1] + 1e-3)
