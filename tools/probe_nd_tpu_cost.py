"""Time the ND factor/solve building blocks on the live backend at a
given L (default 7): whole factor(), whole solve(), and per-depth
batched cholesky / triangular-solve / inverse-matmul primitives.

This is the decision probe for replacing XLA's f64 cholesky/trisolve
(sequential inner loops on TPU) with a custom blocked-recursion inverse
built from MXU matmuls.

Run on TPU:  python tools/probe_nd_tpu_cost.py [L]
Run on CPU:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python ...
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import importlib

import multigridbarrier_tpu as mgb

A = importlib.import_module("multigridbarrier_tpu.solver.amgb")
from multigridbarrier_tpu.solver.ndsolve import (
    NDFactorizer,
    NDSymbolic,
    node_coords,
)

L = int(sys.argv[1]) if len(sys.argv) > 1 else 7


def timed(label, fn, *args, n=3):
    """Per-call wall time, min of n, each call synced individually.

    Through the axon tunnel, batching dispatches and blocking once on
    the last result under-reports wildly (the client appears to reuse
    ready buffers for repeated identical dispatches: measured 0.02ms
    for a matmul whose true chained cost is 9.4ms).  Per-call
    block_until_ready measures device + ~30ms dispatch RTT — fine for
    the production programs (100ms-seconds); use chained_rate for
    sub-RTT primitives.
    """
    out = fn(*args)  # compile
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    allts = " ".join(f"{t*1e3:.1f}" for t in ts)
    print(f"{label:46s} {dt*1e3:9.2f} ms   [{allts}]")
    return dt


def chained_rate(label, op, x0, n=50):
    """Amortize dispatch RTT: n dependent applications of op inside one
    jitted fori_loop; returns per-application seconds."""
    f = jax.jit(lambda a: jax.lax.fori_loop(
        0, n, lambda i, a: op(a), a))
    jax.block_until_ready(f(x0))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(f(x0))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:46s} {dt*1e3:9.3f} ms/app (chained x{n})")
    return dt


g = mgb.fem2d(L=L)
spec = A._normalize_D(A.default_D(2))
dt_ = g.x.dtype
c0 = jax.vmap(lambda xi: jnp.asarray(A.default_f(2, dt_)(xi), dt_))(g.x)
ctx = A._SolverCtx(g, spec, A.default_Q(2, 1.0).barrier, c0)
level = ctx.levels - 1

# -- f64 vs f32 matmul rate: decides whether the ND factor is
# flop-bound under f64 emulation (padded factor ~2.4 GF at L=7) or
# op-latency bound.
import os as _os

if _os.environ.get("MGB_PROBE_MM", "1") == "1":
    # Measured once on the v5e tunnel (2026-08-19, chained fori_loop,
    # (16,512,512) 4.29 GF matmuls): f64 9.4ms = 457 GF/s, f32 0.64ms =
    # 6.7 TF/s, bf16 0.57ms = 7.5 TF/s.  Skip with MGB_PROBE_MM=0 when
    # the compile queue is slow — the rates are stable device facts.
    rng0 = np.random.default_rng(7)
    M64 = jnp.asarray(rng0.standard_normal((16, 512, 512)) * 0.05)
    M32 = M64.astype(jnp.float32)
    t64 = chained_rate("matmul f64 (16,512,512)^2", lambda a: 0.99 * (a @ M64), M64)
    t32 = chained_rate("matmul f32 (16,512,512)^2", lambda a: 0.99 * (a @ M32), M32)
    Mbf = M64.astype(jnp.bfloat16)
    tbf = chained_rate("matmul bf16 (16,512,512)^2", lambda a: (a @ Mbf), Mbf, n=50)
    from multigridbarrier_tpu.experimental import ozmm

    toz = chained_rate("matmul ozaki-f64 (16,512,512)^2",
                       lambda a: 0.99 * ozmm.matmul(a, M64), M64, n=10)
    gf = 2 * 16 * 512**3 / 1e9
    print(f"  => f64 {gf/t64:.1f} GF/s, f32 {gf/t32:.1f} GF/s, "
          f"bf16 {gf/tbf:.1f} GF/s, ozaki {gf/toz:.2f} GF/s (eff), "
          f"f64/f32 {t64/t32:.1f}x, f64/ozaki {t64/toz:.2f}x")

# -- real solver programs at the fine level: pre (assembly), nd_init
# (pre + factor + solve), nd_step (line search + pre + factor + solve).
# Differences give the per-phase split of the ~2.7 s/Newton-it budget.
# MGB_PROBE_PROGRAMS=0 skips (3 big remote compiles) for knob sweeps
# that only change the factor.
if _os.environ.get("MGB_PROBE_PROGRAMS", "1") == "1":
    z0 = jax.vmap(lambda xi: jnp.asarray(A.default_g(2, dt_)(xi), dt_))(g.x)
    hh = ctx._get_nd(level)
    basis_l = ctx._bases[level]
    Pl = ctx._P[level]
    t1 = jnp.asarray(1.0e3, dt_)
    pre_j = jax.jit(ctx._build_host_pre(level))
    t_pre = timed("pre (assembly)", pre_j, Pl, basis_l, ctx.x, ctx.w, ctx.c,
                  z0, t1, hh["nd_full_ids"])
    gv, y, cy, fy0, dvp = hh["nd_init"](
        Pl, basis_l, ctx.x, ctx.w, ctx.c, z0, t1, hh["nd_full_ids"],
        hh["nd_consts"],
    )
    t_init = timed("nd_init (pre+factor+solve)", hh["nd_init"], Pl, basis_l,
                   ctx.x, ctx.w, ctx.c, z0, t1, hh["nd_full_ids"],
                   hh["nd_consts"])
    t_step = timed("nd_step (post+pre+factor+solve)", hh["nd_step"], Pl,
                   basis_l, basis_l.rloc, ctx.x, ctx.w, ctx.c, z0, t1, y, cy,
                   fy0, gv, dvp, hh["nd_full_ids"], hh["nd_consts"])
    print(f"  => direction (factor+solve) ~ {1e3*(t_init-t_pre):.1f} ms, "
          f"post (line search) ~ {1e3*(t_step-t_init):.1f} ms")
basis = ctx._bases[level]
m, nf = basis.m, 2
import os

LEAF = int(os.environ.get("MGB_ND_LEAF", "16"))
sym = NDSymbolic(
    np.asarray(basis.idx), m, nf,
    node_coords(basis.idx, m, np.asarray(g.x), basis.nq), leaf=LEAF,
)
fz = NDFactorizer(sym, use_inv=True)
cst = fz.consts()
print(f"L={L} m={m} maxd={sym.maxd} groups={sym.ngroups} backend={jax.default_backend()}")

# representative vals: assemble identity-dominant SPD system.  Must be
# SYMMETRIC (vals[f1,f2,pid(i,j)] == vals[f2,f1,pid(j,i)]) like a real
# barrier Hessian: cholesky variants read different triangles of the
# assembled fronts, so an asymmetric test matrix makes their outputs
# incomparable (bit us once: blocked-vs-xla "error" of 8e-4 that
# vanished on symmetric input).
rng = np.random.default_rng(0)
nuniq = sym.nuniq
vals = rng.standard_normal((nf, nf, nuniq)) * 0.01
keys = sym.pair_i_all.astype(np.int64) * (sym.m + 1) + sym.pair_j_all
tkeys = sym.pair_j_all.astype(np.int64) * (sym.m + 1) + sym.pair_i_all
perm = np.searchsorted(keys, tkeys)
perm = np.minimum(perm, nuniq - 1)
has_t = keys[perm] == tkeys
vals_t = np.where(has_t[None, None, :], vals.transpose(1, 0, 2)[:, :, perm], vals)
vals = (0.5 * (vals + vals_t)).reshape(-1)
diag_ids = (
    (np.arange(nf, dtype=np.int64) * (nf + 1))[None, :] * nuniq
    + sym.diag_pid[:, None]
).reshape(-1)
vals[diag_ids] = 4.0
vals_j = jnp.asarray(vals)

factor_j = jax.jit(lambda v, c: fz.factor(v, c))
fac = factor_j(vals_j, cst)
b = jnp.asarray(rng.standard_normal(sym.N))
solve_j = jax.jit(lambda f, b, c: fz.solve(f, b, c))

timed("factor (use_inv)", factor_j, vals_j, cst)
timed("solve", solve_j, fac, b, cst)

if os.environ.get("MGB_PROBE_OZAKI", "0") == "1":
    # 2x2 sweep: mm engine x cholesky engine.  On TPU the native f64
    # batched Cholesky is software-emulated AND sequential, so ozaki
    # matmuls only pay off if the chol panels go blocked too.
    x_nat = np.asarray(solve_j(fac, b, cst))
    for mm_mode, chol_mode in [
        ("native", "blocked"),
        ("ozaki", "xla"),
        ("ozaki", "blocked"),
    ]:
        os.environ["MGB_ND_MM"] = mm_mode
        os.environ["MGB_ND_CHOL"] = chol_mode
        fz_v = NDFactorizer(sym, use_inv=True)
        factor_v = jax.jit(lambda v, c: fz_v.factor(v, c))
        fac_v = factor_v(vals_j, cst)
        timed(f"factor (use_inv, mm={mm_mode}, chol={chol_mode})",
              factor_v, vals_j, cst)
        x_v = np.asarray(solve_j(fac_v, b, cst))
        rel = np.linalg.norm(x_v - x_nat) / np.linalg.norm(x_nat)
        print(f"  vs native solve rel diff {rel:.2e}")
    os.environ["MGB_ND_MM"] = "native"
    os.environ.pop("MGB_ND_CHOL", None)

if os.environ.get("MGB_PROBE_SUB", "0") == "1":
    fz_sub = NDFactorizer(sym, use_inv=False)
    factor_s = jax.jit(lambda v, c: fz_sub.factor(v, c))
    fac_s = factor_s(vals_j, cst)
    solve_s = jax.jit(lambda f, b, c: fz_sub.solve(f, b, c))
    timed("factor (substitution)", factor_s, vals_j, cst)
    timed("solve (substitution)", solve_s, fac_s, b, cst)

if os.environ.get("MGB_PROBE_STAGES", "0") == "1":
    # Stage attribution of the production factor: time truncated factor
    # programs (assembly only / +chol / +trisolve / full) and report the
    # deltas.  sb_flat is a runtime ARGUMENT in the truncated programs so
    # XLA cannot constant-fold the extend-add gathers of an all-zero
    # buffer away; later-group fronts therefore assemble without child
    # Schur data, which changes values but not memory traffic or shapes.
    fzs = NDFactorizer(sym, use_inv=False)
    Fn_ = [sym.s_pad[d] + sym.b_pad[d] for d in range(sym.ngroups)]
    n_asm = sum(int(c.shape[0]) for c in cst["asm_pid"])
    n_ea = sum(int(c.shape[0]) for c in cst["ea_tsrc"])
    n_front = sum(
        len(sym.by_depth[d]) * (Fn_[d] * nf) ** 2 for d in range(sym.ngroups)
    )
    print(
        f"\nstage attribution: asm entries {n_asm/1e6:.2f}M, extend-add "
        f"{n_ea/1e6:.2f}M, padded front slots {n_front/1e6:.2f}M, "
        f"sb buffer {int(sym.sb_off[-1])/1e6:.2f}M"
    )

    def _stage(upto):
        def run(v, c, sb0):
            vflat = v.astype(fzs.dtype)
            sb_flat = sb0
            acc = jnp.zeros((), fzs.dtype)
            for d in range(sym.ngroups - 1, -1, -1):
                n_d = len(sym.by_depth[d])
                F = Fn_[d] * nf
                s = sym.s_pad[d] * nf
                data = vflat[c["asm_pid"][d]]
                npad = len(sym.pad_ids[d])
                parts = [data]
                if c["ea_tsrc"][d].shape[0]:
                    parts.append(sb_flat[c["ea_tsrc"][d]])
                if npad:
                    parts.append(jnp.ones(npad, fzs.dtype))
                blocks = jax.ops.segment_sum(
                    jnp.concatenate(parts) if len(parts) > 1 else parts[0],
                    c["asm_dst"][d],
                    num_segments=n_d * F * F,
                )
                fronts = blocks.reshape(n_d, F, F)
                if upto == "asm":
                    acc = acc + fronts[:, 0, 0].sum()
                    continue
                Ls = jnp.linalg.cholesky(fronts[:, :s, :s])
                if upto == "chol":
                    acc = acc + Ls[:, 0, 0].sum()
                    continue
                Lsb = jax.scipy.linalg.solve_triangular(
                    Ls, fronts[:, :s, s:], lower=True
                )
                if upto == "tri":
                    acc = acc + Lsb.sum()
                    continue
                if sym.b_pad[d]:
                    schur = fronts[:, s:, s:] - jnp.swapaxes(Lsb, -1, -2) @ Lsb
                    sb_flat = jax.lax.dynamic_update_slice(
                        sb_flat, schur.reshape(-1), (int(sym.sb_off[d]),)
                    )
                    acc = acc + schur.sum()
            return acc, sb_flat

        return jax.jit(run)

    sb0 = jnp.zeros(int(sym.sb_off[-1]), fzs.dtype)
    t_prev = 0.0
    for upto in ("asm", "chol", "tri", "full"):
        t_u = timed(f"factor stages upto={upto}", _stage(upto), vals_j, cst, sb0)
        print(f"    delta {upto}: {1e3*(t_u - t_prev):8.2f} ms")
        t_prev = t_u

if os.environ.get("MGB_PROBE_DEPTH", "0") != "1":
    sys.exit(0)  # per-depth section: ~33 remote compiles, opt-in

# per-depth primitive costs
print("\nper-depth primitives (chol / trisolve-eye / matmul Lsb):")
for d in range(sym.ngroups):
    n_d = len(sym.by_depth[d])
    s = sym.s_pad[d] * nf
    bn = sym.b_pad[d] * nf
    M = rng.standard_normal((n_d, s, s)) * 0.01
    M = M @ np.transpose(M, (0, 2, 1)) + 4 * np.eye(s)[None]
    Mj = jnp.asarray(M)
    Bj = jnp.asarray(rng.standard_normal((n_d, s, max(bn, 1))))
    chol = jax.jit(jnp.linalg.cholesky)
    tri = jax.jit(
        lambda L_, E: jax.scipy.linalg.solve_triangular(L_, E, lower=True)
    )
    mm = jax.jit(lambda A_, B_: A_ @ B_)
    Ls = chol(Mj)
    eye = jnp.broadcast_to(jnp.eye(s, dtype=Mj.dtype), Mj.shape)
    t_c = timed(f"  d={d} ({n_d},{s},{s}) chol", chol, Mj)
    t_t = timed(f"  d={d} trisolve eye", tri, Ls, eye)
    t_m = timed(f"  d={d} matmul (s x b={bn})", mm, Ls, Bj)
