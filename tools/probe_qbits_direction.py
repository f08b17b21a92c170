"""Factor-precision certification probe — the df32 GO/NO-GO decision.

The round-4 verdict's #1 lever is a double-float (pair-f32, ~48-bit) ND
factor used like f32pc: certified PCG against the exact f64 Hessian.
Whether that can WIN depends on one question the notes cannot answer:
does a 48-bit-quality factor still certify directions (relres <= 1e-9)
in the ENDGAME (t >= 1e4), where f32pc is dead and every Newton step
pays a fresh emulated-f64 factor (~630ms of the ~930ms it)?

This probe answers it on CPU with the qbits truncation simulator
(ndsolve._round_bits applied at every factor stage output): for each
barrier value t it assembles the real fem2d Newton system at the
centered iterate, factors at several precision profiles, and measures
PCG iterations to the certification gate.

Profiles:
  q53      fresh f64 factor (the endgame incumbent; its raw relres is
           the accepted ungated floor)
  q48/q44/q40  uniform truncation, equilibrated, unshifted (df32-class)
  q24+s    f32-class + shift 3e-6 (the f32pc regime, sanity anchor)
  leaf24   hybrid: leaf HALF of groups at 24 bits, top half full f64,
           shift 3e-6 — locates WHERE precision is needed
  root24   hybrid: top half 24 bits, leaves full — the converse

Usage: python tools/probe_qbits_direction.py [L] [t1,t2,...]
"""

import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import multigridbarrier_tpu as mgb

A = importlib.import_module("multigridbarrier_tpu.solver.amgb")
from multigridbarrier_tpu.solver.ndsolve import (
    NDFactorizer,
    NDSymbolic,
    node_coords,
)

L = int(sys.argv[1]) if len(sys.argv) > 1 else 6
ts = (
    [float(v) for v in sys.argv[2].split(",")]
    if len(sys.argv) > 2
    else [1e3, 1e4, 1e5, 1e6, 1e7, 6.7e7]
)

g = mgb.fem2d(L=L)
spec = A._normalize_D(A.default_D(2))
dtype = g.x.dtype
c0 = jax.vmap(lambda xi: jnp.asarray(A.default_f(2, dtype)(xi), dtype))(g.x)
ctx = A._SolverCtx(g, spec, A.default_Q(2, 1.0).barrier, c0)
level = ctx.levels - 1
basis = ctx._bases[level]
pat = ctx._get_host_pattern(level)
h = ctx._get_host(level)
m, nf = pat.m, pat.nf

sym = NDSymbolic(
    np.asarray(basis.idx), m, nf,
    node_coords(basis.idx, m, np.asarray(g.x), basis.nq), leaf=16,
)
fz = NDFactorizer(sym, dtype=jnp.float64)
cst = fz.consts()
ng = sym.ngroups
print(f"L={L} m={m} nf={nf} groups={ng} "
      f"F_dofs={[ (sym.s_pad[d]+sym.b_pad[d])*nf for d in range(ng) ]}")

nuniq = sym.nuniq
pair_pid = jnp.asarray(sym.pair_pid)
pair_i = jnp.asarray(sym.pair_i)
pair_j = jnp.asarray(sym.pair_j)
diag_ids = (
    (np.arange(nf, dtype=np.int64) * (nf + 1))[None, :] * nuniq
    + sym.diag_pid[:, None]
).reshape(-1)


@jax.jit
def matvec(vals, xv):
    vb = vals.reshape(nf, nf, nuniq)
    xm = xv.reshape(m, nf)
    contrib = jnp.einsum("fgp,pg->pf", vb[:, :, pair_pid], xm[pair_j])
    return jax.ops.segment_sum(contrib, pair_i, num_segments=m).reshape(-1)


def pcg_its(vals, b, apply_fac, rtol=1e-9, cap=60):
    """(its_to_gate_or_-1, best_relres)"""
    bb = float(np.vdot(b, b))
    x = apply_fac(b)
    r = b - matvec(vals, x)
    z = apply_fac(r)
    rz = jnp.vdot(r, z)
    p = z
    best = float(np.sqrt(np.vdot(r, r).real / bb))
    if not np.isfinite(best):
        return -2, float("inf")
    if best <= rtol:
        return 0, best
    for it in range(1, cap + 1):
        Ap = matvec(vals, p)
        pAp = float(jnp.vdot(p, Ap))
        if not np.isfinite(pAp) or pAp <= 0:
            return -2, best
        al = float(rz) / pAp
        x = x + al * p
        r = r - al * Ap
        rel = float(np.sqrt(float(jnp.vdot(r, r)) / bb))
        best = min(best, rel)
        if rel <= rtol:
            return it, rel
        z = apply_fac(r)
        rz2 = jnp.vdot(r, z)
        beta = float(rz2) / float(rz)
        if not np.isfinite(beta) or beta < 0:
            return -2, best
        p = z + beta * p
        rz = rz2
    return -1, best


for t_mid in ts:
    t0 = time.time()
    sol = mgb.amgb(g, p=1.0, tol=1.0 / t_mid, verbose=False)
    z = sol.z
    vals, gv, *_ = h["pre"](
        ctx._P[level], basis, ctx.x, ctx.w, ctx.c, jnp.asarray(z, dtype),
        jnp.asarray(t_mid, dtype), h["full_ids"],
    )
    vals_np = np.asarray(vals, np.float64)
    b = -np.asarray(gv, np.float64).reshape(nf, m + 1)[:, :m].T.reshape(-1)
    bj = jnp.asarray(b)
    vj = jnp.asarray(vals_np)
    print(f"\n== t={t_mid:.3g}  (path {time.time()-t0:.0f}s, "
          f"c={float(sol.SOL_main.c_dot_Dz[-1]):.8f})")

    # equilibration frame (shared by all reduced-q profiles)
    dg = np.abs(vals_np[diag_ids])
    s_eq = 1.0 / np.sqrt(np.maximum(dg, 1e-300))
    snf = np.concatenate([s_eq.reshape(m, nf), np.ones((1, nf))])
    ri = snf.T[:, sym.pair_i_all][:, None, :]
    cj = snf.T[:, sym.pair_j_all][None, :, :]
    vals_s = (vals_np.reshape(nf, nf, nuniq) * ri * cj).reshape(-1)
    sj = jnp.asarray(s_eq)

    def run(name, qbits, delta=0.0):
        fz.qbits = qbits
        try:
            vv = vals_s.copy()
            if delta:
                vv[diag_ids] += delta
            fac = fz.factor(jnp.asarray(vv), cst)
            ok = all(
                bool(jnp.all(jnp.isfinite(a)) & jnp.all(jnp.isfinite(bb_)))
                for a, bb_ in fac
            )
            if not ok:
                print(f"  {name:12s} factor NaN")
                return
            ap = lambda r: sj * fz.solve(fac, sj * r, cst).astype(r.dtype)
            its, rel = pcg_its(vj, bj, ap)
            tag = {-1: "CAP", -2: "BRK"}.get(its, f"{its:3d} its")
            print(f"  {name:12s} gate {tag:8s} relres {rel:.3e}")
        finally:
            fz.qbits = None

    # incumbent floor: fresh f64 factor, raw direct solve residual
    fac64 = fz.factor(jnp.asarray(vals_s), cst)
    x64 = sj * fz.solve(fac64, sj * bj, cst)
    r64 = bj - matvec(vj, x64)
    rel64 = float(jnp.sqrt(jnp.vdot(r64, r64) / jnp.vdot(bj, bj)))
    its64, best64 = pcg_its(
        vj, bj, lambda r: sj * fz.solve(fac64, sj * r, cst)
    )
    tag = {-1: "CAP", -2: "BRK"}.get(its64, f"{its64:3d} its")
    print(f"  {'q53 fresh':12s} gate {tag:8s} relres {best64:.3e}  "
          f"(raw direct relres {rel64:.3e})")

    half = ng // 2
    if os.environ.get("MGB_PROBE_SHIFTED", "0") == "1":
        # round-5 follow-up: the unshifted q48 factor NaNs past t~1e6
        # while the f32pc-style 3e-6 shift caps the preconditioner at
        # ~3e-5 — probe the df-scale shifts in between (the shift only
        # perturbs the PRECONDITIONER; certification is still against
        # the exact Hessian)
        run("q48", 48)
        run("q48+s1e-13", 48, 1e-13)
        run("q48+s1e-12", 48, 1e-12)
        run("q48+s1e-11", 48, 1e-11)
        run("q48+s1e-10", 48, 1e-10)
        run("q44+s1e-11", 44, 1e-11)
        run("q24+s3e-6", 24, 3e-6)
    else:
        run("q48", 48)
        run("q44", 44)
        run("q40", 40)
        run("q24+s3e-6", 24, 3e-6)
        run("leaf24+s", [53] * half + [24] * (ng - half), 3e-6)
        run("root24+s", [24] * half + [53] * (ng - half), 3e-6)
