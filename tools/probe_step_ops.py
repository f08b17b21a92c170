"""Bisect the TPU worker 'kernel fault' inside the level-4 Newton step.

Reproduces the crash state (z evolved by dense levels 0-3 at t=0.1),
then executes the MG-CG step's constituent ops EAGERLY on the TPU one at
a time, printing progress — the op that faults the worker is the last
line printed."""

import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import multigridbarrier_tpu as mgb

A = importlib.import_module("multigridbarrier_tpu.solver.amgb")
LS = importlib.import_module("multigridbarrier_tpu.solver.linsolve")

L = int(os.environ.get("MGB_PROBE_L", "7"))
LVL = int(os.environ.get("MGB_PROBE_LVL", "4"))
print(f"# devices {jax.devices()}", file=sys.stderr)
g = mgb.fem2d(L=L)
dtype = g.x.dtype
spec = A._normalize_D(A.default_D(g.dim))
Q = A.default_Q(g.dim, 1.0)
ffun, gfun = A.default_f(g.dim, dtype), A.default_g(g.dim, dtype)
c = jax.vmap(lambda xi: jnp.asarray(ffun(xi), dtype=dtype))(g.x)
z = jax.vmap(lambda xi: jnp.asarray(gfun(xi), dtype=dtype))(g.x)
ctx = A._get_ctx(g, spec, Q.barrier, c, subspace="dirichlet", x=g.x)

t = 0.1
for lvl in range(LVL):
    z, its, code, tr = ctx.run_level(lvl, z, t, 0.0625)
    print(f"pre: level {lvl} its={its} code={code}", flush=True)

print(f"# state ready; dissecting level {LVL} step ops", flush=True)


def sync(name, val):
    jax.block_until_ready(val)
    print(f"OK {name}", flush=True)
    return val


Ps, bases, embeds, rloc = ctx._level_args(LVL)
basis = bases[-1]
m, nl, nq = basis.m, basis.nl, basis.nq
Pl, idx = Ps[-1], basis.idx
nelem = Pl.shape[0]
nf, k = spec.nfields, spec.k
x, w = ctx.x, ctx.w
barrier = Q.barrier
F1 = jax.grad(barrier, argnums=1)
F2 = jax.hessian(barrier, argnums=1)

y = sync("apply_D", A._apply_D(ctx.ops, spec, z))
F0v = sync("F0", jax.vmap(barrier)(x, y))
F1v = sync("F1", jax.vmap(F1)(x, y))
gy = (w[:, None] * (t * c + F1v)).reshape(nelem, nq, k)
gf = jnp.einsum("eqj,eqjc->ec", gy, Pl)
gv = sync(
    "gv",
    basis.scatter_add(
        gf.reshape(nelem, nf, nl).transpose(0, 2, 1).reshape(-1, nf)
    ).T,
)
Y2w = sync("F2", jax.vmap(F2)(x, y) * w[:, None, None])
Y2w_e = Y2w.reshape(nelem, nq, k, k)
sub_levels = ctx._sub_levels(LVL)
systems = []
for i, sl in enumerate(sub_levels):
    He = sync(f"He[{i}]", ctx._assemble_He(Ps[i], Y2w_e))
    systems.append(LS.LevelSystem(He, bases[i].idx, ctx._bases[sl].m))

# mgcg internals, eagerly
dinvs = [sync(f"dinv[{i}]", 1.0 / LS.diag_of(s)) for i, s in enumerate(systems)]
coarse_cf = sync(
    "coarse_chol", jax.scipy.linalg.cho_factor(LS.dense_assemble(systems[0], nf))
)
f32c = jnp.float32
svecs = [jnp.sqrt(d) for d in dinvs]
systems32 = []
for i, (s_, sv) in enumerate(zip(systems, svecs)):
    nelem_l, nl_l = s_.idx.shape
    se = sv[:, s_.idx].transpose(1, 0, 2).reshape(nelem_l, nf * nl_l)
    He_hat = sync(
        f"He_hat[{i}]", (s_.He * se[:, :, None] * se[:, None, :]).astype(f32c)
    )
    systems32.append(s_._replace(He=He_hat))
states32 = [None]
for i, s in enumerate(systems32[1:], start=1):
    st = LS.schwarz_setup(s, nf)
    sync(f"schwarz_chol[{i}]", st.chol)
    states32.append(st)
minvs32 = [jnp.asarray(1.0, dtype=f32c)] + [
    (lambda s=s, st=st: lambda r: LS.schwarz_apply(s, st, r))()
    for s, st in zip(systems32[1:], states32[1:])
]
for i in range(1, len(systems32)):
    lm = sync(f"lmax[{i}]", LS.lambda_max_est(systems32[i], minvs32[i], iters=6))
    print(f"   lmax[{i}] = {float(lm):.3f}", flush=True)

# one full precond application + a few CG iterations
sv32 = [sv.astype(f32c) for sv in svecs]
embeds32 = [
    LS._ScaledTransfer(
        E=E,
        sc=sv32[i][:, : systems[i].m].T,
        sf_inv=(1.0 / sv32[i + 1][:, : systems[i + 1].m]).T,
    )
    for i, E in enumerate(embeds)
]
s0_inv = 1.0 / svecs[0]
m0 = systems[0].m


def coarse_solve(bp0_hat):
    r = (bp0_hat.astype(s0_inv.dtype) * s0_inv).reshape(-1)
    xc = jax.scipy.linalg.cho_solve(coarse_cf, r).astype(s0_inv.dtype)
    xc = (xc.reshape(nf, m0 + 1) * s0_inv).astype(f32c)
    return xc.at[:, m0].set(0.0)


lmaxs32 = [jnp.asarray(1.0, f32c)] + [
    LS.lambda_max_est(systems32[i], minvs32[i], iters=6).astype(f32c)
    for i in range(1, len(systems32))
]
s_fine = svecs[-1]
bp = -gv
r = bp
for it in range(5):
    rhat = (r * s_fine).astype(f32c)
    out = LS.vcycle(
        systems32, minvs32, lmaxs32, embeds32, coarse_solve, rhat, nf, degree=3
    )
    zk = sync(f"vcycle[{it}]", s_fine * out.astype(bp.dtype))
    Av = sync(f"hvp[{it}]", LS.hvp(systems[-1], zk))
    r = r - 0.5 * Av  # arbitrary walk to vary data

# finally the full jitted mgcg + full jitted step
dvp, its_cg, rel, _ = LS.mgcg_solve(
    systems, embeds, bp, nf, rtol=ctx.cg_rtol, maxiter=ctx.cg_maxiter
)
sync("full_mgcg", dvp)
print(f"mgcg its={int(its_cg)} rel={float(rel):.2e}", flush=True)

z2, its, code, tr = ctx.run_level(LVL, z, t, 0.0625)
print(f"full run_level: its={its} code={code}", flush=True)
print("STEP OPS OK", flush=True)
