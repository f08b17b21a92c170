"""Instrumented-solve tests: inject a custom Newton linear solver to
capture every Newton matrix (the reference's monkey-patch of
MultiGridBarrier.solve, test/test_newton_matrix_compare.jl:33-125 and
test/test_instrumented_solve.jl:28-99 — here it's a first-class
`linear_solver` kwarg instead of method piracy)."""

import numpy as np
import jax
import jax.numpy as jnp

import multigridbarrier_tpu as mgb


def test_linear_solver_hook_captures_and_matches():
    shapes = []

    def spying_solver(H, b):
        # runs under jit: record the static shape, solve with Cholesky
        shapes.append(H.shape)
        cf = jax.scipy.linalg.cho_factor(H)
        return jax.scipy.linalg.cho_solve(cf, b)

    g = mgb.fem1d(L=2)
    sol = mgb.amgb(g, p=2.0, tol=1e-6, linear_solver=spying_solver)
    sol_ref = mgb.amgb(mgb.fem1d(L=2), p=2.0, tol=1e-6)

    # the hook was exercised and saw SPD systems of per-level sizes
    assert shapes, "custom solver never called"
    sizes = {s[0] for s in shapes}
    # nf*(m+1) for m in dirichlet dims (1, 3)
    assert sizes == {2 * 2, 2 * 4}
    # and the solve still matches the built-in solver's answer
    diff = np.abs(np.asarray(sol.z) - np.asarray(sol_ref.z)).max()
    assert diff < 1e-5, diff


def test_newton_matrices_are_spd():
    """Every Newton system the solver factors must be symmetric positive
    definite (the reference asserts the same via captured-eigenvalue
    comparisons, test/test_newton_matrix_compare.jl:33-125).  The solver
    hook runs under jit, so concrete matrices are shipped to the host with
    jax.debug.callback."""
    captured = []

    def record(H):
        captured.append(np.asarray(H))

    def capture(H, b):
        jax.debug.callback(record, H)
        cf = jax.scipy.linalg.cho_factor(H)
        return jax.scipy.linalg.cho_solve(cf, b)

    g = mgb.fem1d(L=2)
    mgb.amgb(g, p=2.0, tol=1e-4, linear_solver=capture)
    jax.effects_barrier()

    assert captured, "no Newton matrices captured"
    for H in captured:
        asym = np.abs(H - H.T).max() / max(np.abs(H).max(), 1.0)
        assert asym < 1e-12, f"Newton matrix not symmetric: {asym}"
        lam_min = np.linalg.eigvalsh(H).min()
        assert lam_min > 0.0, f"Newton matrix not PD: lambda_min={lam_min}"
