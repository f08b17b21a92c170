"""Element-local runtime + Newton linear-solver tests.

Differential testing against scipy/dense references — the reference's
distributed-vs-native conformance strategy (SURVEY.md §4 layer 2) with
"element-local batched" standing in for "distributed"."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import multigridbarrier_tpu as mgb
from multigridbarrier_tpu.runtime import LevelBasis, level_basis_from_csr
from multigridbarrier_tpu.solver.linsolve import (
    LevelSystem,
    dense_assemble,
    dense_solve,
    diag_of,
    hvp,
    hvp_lane,
    lambda_max_est,
    mgcg_solve,
)


def _rand_level_system(key, nelem=16, nl=4, nf=2, m=20):
    k1, k2 = jax.random.split(key)
    # distinct node ids within each element (as real FEM connectivity has):
    # repeated ids would fold element off-diagonals onto the global diagonal
    perms = np.stack(
        [
            np.random.default_rng(int(s)).permutation(m + 1)[:nl]
            for s in np.arange(nelem)
        ]
    )
    idx = jnp.asarray(perms, dtype=jnp.int32)
    A = jax.random.normal(k2, (nelem, nf * nl, nf * nl), dtype=jnp.float64)
    He = jnp.einsum("eab,ecb->eac", A, A)  # SPSD per element
    # zero out rows/cols whose node is the pad slot (contract of assembly)
    padmask = (idx == m).astype(jnp.float64)  # (nelem, nl)
    keep = 1.0 - jnp.tile(padmask, (1, nf))  # (nelem, nf*nl)
    He = He * keep[:, :, None] * keep[:, None, :]
    return LevelSystem(He, idx, m)


def test_level_basis_roundtrip_fem2d():
    g = mgb.fem2d(L=2)
    for key in ("dirichlet", "full"):
        for lb, R in zip(g.bases[key], g.subspaces[key]):
            Rs = R.to_scipy()
            assert abs(lb.to_scipy() - Rs).max() < 1e-13
            v = np.random.default_rng(0).standard_normal(Rs.shape[1])
            np.testing.assert_allclose(
                np.asarray(lb.matvec(jnp.asarray(v))), Rs @ v, atol=1e-12
            )
            y = np.random.default_rng(1).standard_normal(Rs.shape[0])
            np.testing.assert_allclose(
                np.asarray(lb.rmatvec(jnp.asarray(y))), Rs.T @ y, atol=1e-12
            )


def test_hvp_matches_dense():
    sys_ = _rand_level_system(jax.random.PRNGKey(0))
    nf, m = 2, sys_.m
    H = np.asarray(dense_assemble(sys_, nf))
    v = jax.random.normal(jax.random.PRNGKey(2), (nf, m + 1), dtype=jnp.float64)
    v = v.at[:, m].set(0.0)
    hv = np.asarray(hvp(sys_, v))
    ref = (H @ np.asarray(v).reshape(-1)).reshape(nf, m + 1)
    ref[:, m] = 0.0
    np.testing.assert_allclose(hv, ref, atol=1e-12)


def test_hvp_lane_matches_hvp():
    sys_ = _rand_level_system(jax.random.PRNGKey(9))
    nf, m = 2, sys_.m
    v = jax.random.normal(jax.random.PRNGKey(10), (nf, m + 1), dtype=jnp.float64)
    v = v.at[:, m].set(0.0)
    He_lane = jnp.transpose(sys_.He, (1, 2, 0))
    np.testing.assert_allclose(
        np.asarray(hvp_lane(He_lane, sys_, v)),
        np.asarray(hvp(sys_, v)),
        atol=1e-12,
    )


def test_diag_of_matches_dense():
    sys_ = _rand_level_system(jax.random.PRNGKey(3))
    nf, m = 2, sys_.m
    H = np.asarray(dense_assemble(sys_, nf))
    d = np.asarray(diag_of(sys_)).reshape(-1)
    np.testing.assert_allclose(d, np.diag(H), atol=1e-12)


def test_lambda_max_est():
    sys_ = _rand_level_system(jax.random.PRNGKey(4))
    nf, m = 2, sys_.m
    H = np.asarray(dense_assemble(sys_, nf))
    dinv = 1.0 / np.diag(H)
    true = np.abs(np.linalg.eigvals(dinv[:, None] * H)).max()
    est = float(lambda_max_est(sys_, jnp.asarray(dinv.reshape(2, m + 1))))
    assert 0.9 * true <= est <= 1.3 * true


def test_mgcg_solves_forced():
    # end-to-end: MG-CG path (tiny dense_threshold) reproduces the dense
    # path's solution on fem2d (the reference's MUMPS-vs-iterative parity)
    b = mgb.Backend(dtype=jnp.float64, dense_threshold=20)
    g = mgb.fem2d(L=2, backend=b)
    sol = mgb.amgb(g, p=1.0, tol=1e-7)
    gd = mgb.fem2d(L=2)
    sold = mgb.amgb(gd, p=1.0, tol=1e-7)
    assert (
        np.abs(np.asarray(sol.z) - np.asarray(sold.z)).max() < 1e-5
    )


def test_mgcg_on_spd_system():
    # solve a well-conditioned 2-level system to tight tolerance
    g = mgb.fem2d(L=2)
    lb = g.bases["dirichlet"]
    nf = 1
    systems = []
    for lvl in range(2):
        basis = lb[lvl]
        nelem, nq, nl = basis.rloc.shape
        # mass-matrix He: rloc' diag(w_e) rloc per element
        w_e = jnp.asarray(np.asarray(g.w).reshape(nelem, nq))
        He = jnp.einsum("eqa,eq,eqb->eab", basis.rloc, w_e, basis.rloc)
        systems.append(LevelSystem(He, basis.idx, basis.m))
    m = lb[1].m
    rng = np.random.default_rng(5)
    bp = jnp.zeros((nf, m + 1), dtype=jnp.float64)
    bp = bp.at[:, :m].set(jnp.asarray(rng.standard_normal((nf, m))))
    x, its, rel, _ = mgcg_solve(
        systems, g.embed["dirichlet"][:1], bp, nf, rtol=1e-12, shift=0.0
    )
    xd = dense_solve(systems[-1], nf, bp)
    np.testing.assert_allclose(np.asarray(x), np.asarray(xd), atol=1e-9)
    assert float(rel) < 1e-10


def test_mgcg_stagnation_cannot_return_zero():
    # Regression (mixed-precision handoff no-op): on a solvable SPD system
    # the solver must return a genuine DESCENT direction (b'x > 0 — the
    # captured Newton decrement) even under an aggressive stagnation
    # setting.  The round-1 residual-based best-iterate design returned the
    # zero vector whenever the residual wandered above ||b|| past the
    # stagnation window, silently no-op'ing the Newton step.
    g = mgb.fem2d(L=2)
    lb = g.bases["dirichlet"]
    nf = 1
    systems = []
    for lvl in range(2):
        basis = lb[lvl]
        nelem, nq, nl = basis.rloc.shape
        w_e = jnp.asarray(np.asarray(g.w).reshape(nelem, nq))
        He = jnp.einsum("eqa,eq,eqb->eab", basis.rloc, w_e, basis.rloc)
        systems.append(LevelSystem(He, basis.idx, basis.m))
    m = lb[1].m
    rng = np.random.default_rng(7)
    bp = jnp.zeros((nf, m + 1), dtype=jnp.float64)
    bp = bp.at[:, :m].set(jnp.asarray(rng.standard_normal((nf, m))))
    x, its, rel, _ = mgcg_solve(
        systems, g.embed["dirichlet"][:1], bp, nf, rtol=1e-12, stagnation=1
    )
    assert float(rel) < 1.0
    assert float(jnp.vdot(bp, x)) > 0.0  # descent direction

def test_mgcg_deflated_restart_matches_dense(monkeypatch):
    # Force the Ritz-deflated restart (harvest shorter than the solve)
    # on an anisotropic SPD system and check the deflated phase still
    # converges to the dense solution: the Vuik/Nicolaides projection
    # plus final W-space correction must be exact, not approximate.
    nlev = 3
    g = mgb.fem2d(L=nlev)
    lb = g.bases["dirichlet"]
    nf = 1
    rng = np.random.default_rng(11)
    systems = []
    for lvl in range(nlev):
        basis = lb[lvl]
        nelem, nq, nl = basis.rloc.shape
        w_e = jnp.asarray(np.asarray(g.w).reshape(nelem, nq))
        He = jnp.einsum("eqa,eq,eqb->eab", basis.rloc, w_e, basis.rloc)
        # element-wise anisotropy spanning 1e6 + point-Jacobi smoothing
        # (which cannot resolve element anisotropy): slows CG so the
        # harvest phase cannot converge on its own
        scale = jnp.asarray(10.0 ** rng.uniform(0, 6, size=(nelem, 1, 1)))
        systems.append(LevelSystem(He * scale, basis.idx, basis.m))
    m = lb[nlev - 1].m
    bp = jnp.zeros((nf, m + 1), dtype=jnp.float64)
    bp = bp.at[:, :m].set(jnp.asarray(rng.standard_normal((nf, m))))
    monkeypatch.setenv("MGB_SMOOTHER", "jacobi")
    monkeypatch.setenv("MGB_CG_DEFLATE", "2")
    monkeypatch.setenv("MGB_CG_HARVEST", "6")
    x, its, rel, _ = mgcg_solve(
        systems, g.embed["dirichlet"][: nlev - 1], bp, nf, rtol=1e-12,
        maxiter=400,
    )
    assert int(its) > 6  # the deflated phase actually ran
    assert float(rel) < 1e-10
    xd = dense_solve(systems[-1], nf, bp)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(xd), rtol=0, atol=1e-8
    )

def test_mgcg_truncated_two_grid_matches_dense(monkeypatch):
    # MGB_MGCG_LEVELS=2 drops every level but the top two and solves the
    # new coarsest level exactly; on a 3-level anisotropic SPD system the
    # truncated solve must match the dense solution and preserve the
    # carried-lmaxs length contract (len(systems)-1 entries, dropped
    # slots padded positive so a carried re-solve skips re-estimation).
    nlev = 3
    g = mgb.fem2d(L=nlev)
    lb = g.bases["dirichlet"]
    nf = 1
    rng = np.random.default_rng(13)
    systems = []
    for lvl in range(nlev):
        basis = lb[lvl]
        nelem, nq, nl = basis.rloc.shape
        w_e = jnp.asarray(np.asarray(g.w).reshape(nelem, nq))
        He = jnp.einsum("eqa,eq,eqb->eab", basis.rloc, w_e, basis.rloc)
        scale = jnp.asarray(10.0 ** rng.uniform(0, 6, size=(nelem, 1, 1)))
        systems.append(LevelSystem(He * scale, basis.idx, basis.m,
                                   pair_idx=basis.pair_idx))
    m = lb[nlev - 1].m
    bp = jnp.zeros((nf, m + 1), dtype=jnp.float64)
    bp = bp.at[:, :m].set(jnp.asarray(rng.standard_normal((nf, m))))
    monkeypatch.setenv("MGB_MGCG_LEVELS", "2")
    x, its, rel, lmaxs = mgcg_solve(
        systems, g.embed["dirichlet"][: nlev - 1], bp, nf, rtol=1e-12,
        maxiter=400,
    )
    assert lmaxs.shape == (nlev - 1,)
    assert bool(jnp.all(lmaxs > 0))
    assert float(rel) < 1e-10
    xd = dense_solve(systems[-1], nf, bp)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(xd), rtol=0, atol=1e-8
    )
    # carried lmaxs round-trip: a re-solve with lmaxs_in must accept the
    # padded entries without re-estimating (same solution)
    x2, _, rel2, _ = mgcg_solve(
        systems, g.embed["dirichlet"][: nlev - 1], bp, nf, rtol=1e-12,
        maxiter=400, lmaxs_in=lmaxs,
    )
    np.testing.assert_allclose(
        np.asarray(x2), np.asarray(xd), rtol=0, atol=1e-8
    )


def test_mgcg_nd_factored_coarse_matches_dense(monkeypatch):
    """Above the dense coarse cap the truncated two-grid cycle factors
    the coarse level with the ND multifrontal instead of a dense
    Cholesky (round-4 verdict item 6: MUMPS has no size cap,
    /root/reference/src/MultiGridBarrierMPI.jl:87).  Forcing the cap to
    1 routes the same 3-level problem through the ND coarse; the solve
    must match the dense direct solution like the dense-coarse cycle
    does."""
    from types import SimpleNamespace

    from multigridbarrier_tpu.solver.hostsolve import HostPattern
    from multigridbarrier_tpu.solver.ndsolve import (
        NDFactorizer,
        NDSymbolic,
        node_coords,
    )

    nlev = 3
    g = mgb.fem2d(L=nlev)
    lb = g.bases["dirichlet"]
    nf = 1
    rng = np.random.default_rng(13)
    systems = []
    for lvl in range(nlev):
        basis = lb[lvl]
        nelem, nq, nl = basis.rloc.shape
        w_e = jnp.asarray(np.asarray(g.w).reshape(nelem, nq))
        He = jnp.einsum("eqa,eq,eqb->eab", basis.rloc, w_e, basis.rloc)
        scale = jnp.asarray(10.0 ** rng.uniform(0, 6, size=(nelem, 1, 1)))
        systems.append(LevelSystem(He * scale, basis.idx, basis.m,
                                   pair_idx=basis.pair_idx))
    m = lb[nlev - 1].m
    bp = jnp.zeros((nf, m + 1), dtype=jnp.float64)
    bp = bp.at[:, :m].set(jnp.asarray(rng.standard_normal((nf, m))))

    basis_c = lb[nlev - 2]
    pattern = HostPattern(np.asarray(basis_c.idx), basis_c.m, nf)
    sym = NDSymbolic(
        np.asarray(basis_c.idx), basis_c.m, nf,
        node_coords(basis_c.idx, basis_c.m, np.asarray(g.x), basis_c.nq),
        leaf=4,
    )
    fz = NDFactorizer(sym, dtype=jnp.float64)
    static = SimpleNamespace(fz=fz, nseg=pattern.nseg)
    args = dict(
        consts=fz.consts(),
        full_ids=jnp.asarray(pattern.full_ids),
    )
    monkeypatch.setenv("MGB_MGCG_LEVELS", "auto")
    monkeypatch.setenv("MGB_MGCG_COARSE_CAP", "1")
    x, its, rel, lmaxs = mgcg_solve(
        systems, g.embed["dirichlet"][: nlev - 1], bp, nf, rtol=1e-12,
        maxiter=400, coarse_nd=static, coarse_nd_args=args,
    )
    assert float(rel) < 1e-10
    xd = dense_solve(systems[-1], nf, bp)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(xd), rtol=0, atol=1e-8
    )
    # without coarse_nd the same cap falls back to the full hierarchy
    # (no truncation) and still solves, just through the smoothed cycle
    x0, _, rel0, _ = mgcg_solve(
        systems, g.embed["dirichlet"][: nlev - 1], bp, nf, rtol=1e-12,
        maxiter=400,
    )
    assert float(rel0) < 1e-10
