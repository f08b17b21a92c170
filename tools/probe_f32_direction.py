"""Direction-quality probe for the mixed-precision ND factor path.

Solves fem2d at a given L with tol chosen so the path stops at a
mid-path t, assembles the Newton system at the returned (centered)
iterate, and compares Newton directions:
  gold      scipy splu on the assembled sparse matrix (f64 direct)
  nd64      ND factor f64 + CG polish
  nd32      ND factor f32 (equilibrated) + f64 CG polish, several trip counts
  nd32raw   ND factor f32 WITHOUT equilibration + f64 CG polish

Usage: MGB_* env as usual;  python tools/probe_f32_direction.py [L] [t]
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

import importlib

import multigridbarrier_tpu as mgb

A = importlib.import_module("multigridbarrier_tpu.solver.amgb")
from multigridbarrier_tpu.solver.ndsolve import (
    NDFactorizer,
    NDSymbolic,
    node_coords,
)

L = int(sys.argv[1]) if len(sys.argv) > 1 else 6
t_mid = float(sys.argv[2]) if len(sys.argv) > 2 else 1e3

g = mgb.fem2d(L=L)
sol = mgb.amgb(g, p=1.0, tol=1.0 / t_mid, verbose=False)
z = sol.z
print(f"L={L} path stopped at t={t_mid:g}, c={sol.SOL_main.c_dot_Dz[-1]:.8f}")

spec = A._normalize_D(A.default_D(2))
dtype0 = g.x.dtype
c0 = jax.vmap(lambda xi: jnp.asarray(A.default_f(2, dtype0)(xi), dtype0))(g.x)
ctx = A._SolverCtx(g, spec, A.default_Q(2, 1.0).barrier, c0)
level = ctx.levels - 1
basis = ctx._bases[level]
pat = ctx._get_host_pattern(level)
h = ctx._get_host(level)
dtype = g.x.dtype
vals, gv, *_ = h["pre"](
    ctx._P[level], basis, ctx.x, ctx.w, ctx.c, jnp.asarray(z, dtype),
    jnp.asarray(t_mid, dtype), h["full_ids"],
)
vals_np = np.asarray(vals, np.float64)
m, nf = pat.m, pat.nf
b_fm = np.asarray(gv, np.float64).reshape(nf, m + 1)[:, :m]
b = -b_fm.T.reshape(-1)

import scipy.sparse.linalg as spla

Asp = pat.fill(vals_np).tocsc()
# reorder host layout (field-major) -> node-major congruence
perm = (np.arange(m)[:, None] * nf + np.arange(nf)).reshape(-1)  # node-major id
# pat.fill gives field-major (f*(m+1)+node)? build node-major dense apply via matvec check
sym = NDSymbolic(np.asarray(basis.idx), m, nf, coords_ := node_coords(
    basis.idx, m, np.asarray(g.x), basis.nq), leaf=16)
fz = NDFactorizer(sym, dtype=jnp.float64)
cst = fz.consts()

# gold via splu in host layout
b_host = -np.asarray(gv, np.float64).reshape(-1)
lu = spla.splu(Asp)
x_host = lu.solve(b_host)
x_gold = x_host.reshape(nf, m + 1)[:, :m].T.reshape(-1)

nuniq = sym.nuniq
pair_pid = jnp.asarray(sym.pair_pid)
pair_i = jnp.asarray(sym.pair_i)
pair_j = jnp.asarray(sym.pair_j)


def matvec(xv):
    vb = jnp.asarray(vals_np).reshape(nf, nf, nuniq)
    xm = xv.reshape(m, nf)
    contrib = jnp.einsum("fgp,pg->pf", vb[:, :, pair_pid], xm[pair_j])
    return jax.ops.segment_sum(contrib, pair_i, num_segments=m).reshape(-1)


bj = jnp.asarray(b)


def cg_polish(x0, apply_fac, k):
    x = x0
    r = bj - matvec(x)
    p = zv = apply_fac(r)
    rz = jnp.vdot(r, zv)
    for _ in range(k):
        Ap = matvec(p)
        al = rz / jnp.vdot(p, Ap)
        x = x + al * p
        r = r - al * Ap
        z2 = apply_fac(r)
        rz2 = jnp.vdot(r, z2)
        p = z2 + (rz2 / rz) * p
        rz = rz2
    return x


def report(name, x):
    x = np.asarray(x, np.float64)
    err = np.linalg.norm(x - x_gold) / np.linalg.norm(x_gold)
    res = np.linalg.norm(np.asarray(matvec(jnp.asarray(x))) - b) / np.linalg.norm(b)
    print(f"{name:28s} relerr={err:.3e}  relres={res:.3e}")


fac64 = fz.factor(jnp.asarray(vals_np), cst)
x64 = fz.solve(fac64, bj, cst)
report("nd64 raw", x64)
report("nd64 +cg2", cg_polish(x64, lambda r: fz.solve(fac64, r, cst), 2))

# -- f32 unscaled
fac32r = fz.factor(jnp.asarray(vals_np), cst, dtype=jnp.float32)
ap32r = lambda r: fz.solve(fac32r, r, cst).astype(r.dtype)
x32r = ap32r(bj)
report("nd32 raw (no equil)", x32r)
for k in (3, 7):
    report(f"nd32 no-equil +cg{k}", cg_polish(x32r, ap32r, k))

# -- f32 equilibrated
diag_ids = (
    (np.arange(nf, dtype=np.int64) * (nf + 1))[None, :] * nuniq
    + sym.diag_pid[:, None]
).reshape(-1)
dg = np.abs(vals_np[diag_ids])
s = 1.0 / np.sqrt(np.maximum(dg, 1e-300))
snf = np.concatenate([s.reshape(m, nf), np.ones((1, nf))])
ri = snf.T[:, sym.pair_i_all][:, None, :]
cj = snf.T[:, sym.pair_j_all][None, :, :]
vals_s = (vals_np.reshape(nf, nf, nuniq) * ri * cj).reshape(-1)
fac32 = fz.factor(jnp.asarray(vals_s), cst, dtype=jnp.float32)
sj = jnp.asarray(s)
ap32 = lambda r: sj * fz.solve(fac32, sj * r, cst).astype(r.dtype)
x32 = ap32(bj)
report("nd32 equil raw", x32)
for k in (3, 7, 15):
    report(f"nd32 equil +cg{k}", cg_polish(x32, ap32, k))
