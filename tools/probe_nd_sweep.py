"""Sweep ND factor knob variants on the live backend in ONE process
(one geometry build, sequential remote compiles): chol engine, split
scatter, leaf size.  Prints min-of-3 per-call times (timed semantics of
probe_nd_tpu_cost).

Run on TPU:  python tools/probe_nd_sweep.py [L]
"""

import os
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
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    allts = " ".join(f"{t*1e3:.1f}" for t in ts)
    print(f"{label:52s} {dt*1e3:9.2f} ms   [{allts}]", flush=True)
    return dt


g = mgb.fem2d(L=L)
basis_idx = None
# reach the fine-level basis without building solver kernels
spec = A._normalize_D(A.default_D(2))
dt_ = g.x.dtype
c0 = jax.vmap(lambda xi: jnp.asarray(A.default_f(2, dt_)(xi), dt_))(g.x)
ctx = A._SolverCtx(g, spec, A.default_Q(2, 1.0).barrier, c0)
basis = ctx._bases[ctx.levels - 1]
m, nf = basis.m, 2
coords = node_coords(basis.idx, m, np.asarray(g.x), basis.nq)


def sym_for(leaf):
    return NDSymbolic(np.asarray(basis.idx), m, nf, coords, leaf=leaf)


def vals_for(sym, rng):
    nuniq = sym.nuniq
    vals = rng.standard_normal((nf, nf, nuniq)) * 0.01
    keys = sym.pair_i_all.astype(np.int64) * (sym.m + 1) + sym.pair_j_all
    tkeys = sym.pair_j_all.astype(np.int64) * (sym.m + 1) + sym.pair_i_all
    perm = np.searchsorted(keys, tkeys)
    perm = np.minimum(perm, nuniq - 1)
    has_t = keys[perm] == tkeys
    vals_t = np.where(
        has_t[None, None, :], vals.transpose(1, 0, 2)[:, :, perm], vals
    )
    vals = (0.5 * (vals + vals_t)).reshape(-1)
    diag_ids = (
        (np.arange(nf, dtype=np.int64) * (nf + 1))[None, :] * nuniq
        + sym.diag_pid[:, None]
    ).reshape(-1)
    vals[diag_ids] = 4.0
    return jnp.asarray(vals)


CASES_ALL = {
    "knobs": [
        # (label, leaf, env overrides)
        ("leaf16 baseline", 16, {"MGB_ND_CHOL": "xla"}),
        ("leaf16 chol=blocked", 16, {"MGB_ND_CHOL": "blocked"}),
        ("leaf16 splitsum", 16, {"MGB_ND_CHOL": "xla", "MGB_ND_SPLITSUM": "1"}),
        ("leaf64", 64, {"MGB_ND_CHOL": "xla"}),
        ("leaf64 chol=blocked", 64, {"MGB_ND_CHOL": "blocked"}),
        ("leaf128 chol=blocked", 128, {"MGB_ND_CHOL": "blocked"}),
    ],
    "relay": [
        ("leaf16 relay", 16, {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "xla"}),
        ("leaf16 relay cols=gather", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "xla",
          "MGB_ND_RELAY_COLS": "gather"}),
        ("leaf64 relay", 64, {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "xla"}),
        ("leaf64 relay chol=blocked", 64,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked"}),
        ("leaf128 relay chol=blocked", 128,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked"}),
        # f32 factor rate (the MGB_ND_F32PC preconditioner lever)
        ("leaf64 relay f32", 64,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "xla", "_F32": "1"}),
    ],
    "relay_stages": [
        ("stage asm", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "xla", "_UPTO": "asm"}),
        ("stage ea", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "xla", "_UPTO": "ea"}),
        ("stage chol", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "xla", "_UPTO": "chol"}),
        ("stage full", 16, {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "xla"}),
    ],
    # Session-9 verdict: the v5e factor is f64-EMULATION-bound, not
    # latency-bound — bigger leaves measured WORSE (leaf64 relay 995ms
    # vs leaf16 relay 632ms: the padded-front f64 flops swamp the two
    # saved depths).  Set kept as the negative-result record.
    "leafscan": [
        ("leaf64 relay", 64, {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "xla"}),
        ("leaf128 relay", 128, {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "xla"}),
        ("leaf256 relay", 256, {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "xla"}),
        ("leaf256 relay chol=blocked", 256,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked"}),
    ],
    # round-3 decision set: (a) true-f32 preconditioner factor cost at
    # each matmul-precision tier (the bf16-default broke f32pc
    # certification in situ); (b) ozaki f64 factor remeasure under the
    # session-9 emulation-bound verdict (session-8 dismissed it on the
    # wrong premise).  All relay + blocked chol (the production config).
    "r3tpu": [
        ("f64 native", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked"}),
        ("f64 ozaki s8", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked",
          "MGB_ND_MM": "ozaki", "MGB_ND_MM_SLICES": "8"}),
        ("f64 ozaki s6", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked",
          "MGB_ND_MM": "ozaki", "MGB_ND_MM_SLICES": "6"}),
        ("f32 prec=default", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked", "_F32": "1",
          "MGB_ND_F32_MM_PREC": "default"}),
        ("f32 prec=high", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked", "_F32": "1",
          "MGB_ND_F32_MM_PREC": "high"}),
        ("f32 prec=highest", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked", "_F32": "1",
          "MGB_ND_F32_MM_PREC": "highest"}),
    ],
    # round-4 decision set: panel width for the blocked chol/inverse.
    # MEASURED (v5e, L=7 leaf16 relay): panel32 601.7ms / panel64
    # 626.3 / panel128 663.4 / panel256 662.5; panel128 f32 53.7ms.
    # Verdict: panel32 stays — the padded-panel f64-emulation flops
    # grow faster than the saved sequential stages (same shape as the
    # leaf64 rejection).  The 457 GF/s "chained matmul" rate does not
    # transfer to the factor's small batched panels.
    "panel": [
        ("panel32 relay chol=blocked (prod)", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked"}),
        ("panel64 relay chol=blocked", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked",
          "MGB_ND_PANEL": "64"}),
        ("panel128 relay chol=blocked", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked",
          "MGB_ND_PANEL": "128"}),
        ("panel256 relay chol=blocked", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked",
          "MGB_ND_PANEL": "256"}),
        ("panel128 f32", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked",
          "MGB_ND_PANEL": "128", "_F32": "1"}),
    ],
    # round-4 follow-ups: (a) ozaki s6 retry (the s8 factor program was
    # SIGKILLed by the remote compile helper); (b) substitution
    # application (use_inv=0) — the explicit inverse is invert-once-
    # use-once on the f64 fallback leg, so if the substitution solve
    # costs < inverse-formation savings (~141ms) it wins the endgame.
    "r4inv": [
        ("f64 inv (prod)", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked"}),
        ("f64 subst", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked", "_INV": "0"}),
        ("f64 ozaki s6", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked",
          "MGB_ND_MM": "ozaki", "MGB_ND_MM_SLICES": "6"}),
    ],
    # round-4: top-groups-only ozaki (full-program ozaki OOMs the
    # compile helper; standalone root-shape ozaki compiles fine).
    # minf=640 hits only the root group at fem2d L=7 leaf16 (F=694);
    # minf=256 the top ~3 groups.
    "oztop": [
        ("f64 native (prod)", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked"}),
        ("f64 ozaki minf=640", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked",
          "MGB_ND_MM": "ozaki", "MGB_ND_MM_MINF": "640"}),
        ("f64 ozaki minf=256", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked",
          "MGB_ND_MM": "ozaki", "MGB_ND_MM_MINF": "256"}),
    ],
    "relay2": [
        ("leaf16 relay chol=blocked", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked"}),
        ("leaf16 relay chol=blocked bucket", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked",
          "MGB_ND_BUCKET": "1"}),
        ("leaf16 relay f32", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "xla", "_F32": "1"}),
        ("leaf16 relay f32 chol=blocked", 16,
         {"MGB_ND_EA": "relay", "MGB_ND_CHOL": "blocked", "_F32": "1"}),
    ],
}
CASES = CASES_ALL[os.environ.get("MGB_SWEEP_SET", "knobs")]

syms = {}
rng = np.random.default_rng(0)
x_ref = {}
for label, leaf, envs in CASES:
    bkt = envs.get("MGB_ND_BUCKET", "")
    skey = (leaf, bkt)
    if skey not in syms:
        sav = os.environ.get("MGB_ND_BUCKET")
        if bkt:
            os.environ["MGB_ND_BUCKET"] = bkt
        t0 = time.perf_counter()
        syms[skey] = sym_for(leaf)
        if sav is None:
            os.environ.pop("MGB_ND_BUCKET", None)
        else:
            os.environ["MGB_ND_BUCKET"] = sav
        print(f"# symbolic leaf={leaf} bucket={bkt or 'default'}: "
              f"{time.perf_counter()-t0:.1f}s maxd={syms[skey].maxd} "
              f"groups={syms[skey].ngroups}", flush=True)
    sym = syms[skey]
    saved = {}
    f32 = envs.pop("_F32", None) == "1"
    upto = envs.pop("_UPTO", None)
    use_inv = envs.pop("_INV", "1") != "0"
    # MGB_ND_CHOL's default is backend-dependent (blocked on
    # accelerators since 5b7d501); pin every case that doesn't set it
    # to the xla engine so sweep numbers stay comparable with the
    # pre-flip data the defaults decisions were made from (ADVICE r2).
    envs.setdefault("MGB_ND_CHOL", "xla")
    for k, v in envs.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        fz = NDFactorizer(sym, use_inv=use_inv)
        cst = fz.consts()
        vals_j = vals_for(sym, np.random.default_rng(0))
        if upto:
            factor_j = jax.jit(lambda v, c: fz.factor(v, c, upto=upto))
            timed(f"factor [{label}]", factor_j, vals_j, cst)
            continue
        if f32:
            factor_j = jax.jit(
                lambda v, c: fz.factor(v, c, dtype=jnp.float32)
            )
            timed(f"factor [{label}]", factor_j, vals_j, cst)
            continue
        factor_j = jax.jit(lambda v, c: fz.factor(v, c))
        fac = factor_j(vals_j, cst)
        b = jnp.asarray(np.random.default_rng(1).standard_normal(sym.N))
        solve_j = jax.jit(lambda f, b, c: fz.solve(f, b, c))
        x = np.asarray(solve_j(fac, b, cst))
        if leaf not in x_ref:
            x_ref[leaf] = x
        rel = np.linalg.norm(x - x_ref[leaf]) / np.linalg.norm(x_ref[leaf])
        timed(f"factor [{label}]", factor_j, vals_j, cst)
        timed(f"solve  [{label}]", solve_j, fac, b, cst)
        if rel > 0:
            print(f"  solve rel diff vs leaf-ref {rel:.2e}", flush=True)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
