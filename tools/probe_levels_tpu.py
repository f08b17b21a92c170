"""Serially exercise each level's Newton kernel on the TPU to isolate
worker 'kernel fault' crashes (run with default env = tunneled TPU)."""

import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import multigridbarrier_tpu as mgb

A = importlib.import_module("multigridbarrier_tpu.solver.amgb")

L = int(os.environ.get("MGB_PROBE_L", "7"))
print(f"# devices {jax.devices()}", file=sys.stderr)
g = mgb.fem2d(L=L)
dtype = g.x.dtype
spec = A._normalize_D(A.default_D(g.dim))
Q = A.default_Q(g.dim, 1.0)
ffun, gfun = A.default_f(g.dim, dtype), A.default_g(g.dim, dtype)
c = jax.vmap(lambda xi: jnp.asarray(ffun(xi), dtype=dtype))(g.x)
z = jax.vmap(lambda xi: jnp.asarray(gfun(xi), dtype=dtype))(g.x)
ctx = A._get_ctx(g, spec, Q.barrier, c, subspace="dirichlet", x=g.x)

for lvl in range(ctx.levels):
    t0 = time.perf_counter()
    print(f"level {lvl}: compiling+running...", flush=True)
    z_out, its, code, tr = ctx.run_level(lvl, z, 0.1, 0.0625)
    print(
        f"level {lvl}: its={its} code={code} "
        f"cg={tr['cgits'][:its].tolist()} "
        f"wall={time.perf_counter() - t0:.1f}s",
        flush=True,
    )
print("ALL LEVELS OK", flush=True)

# mimic the bench's path-following: evolve z through full sweeps at
# increasing t (the bench crashes where single per-level runs pass)
t = 0.1
for sweep in range(int(os.environ.get("MGB_PROBE_SWEEPS", "4"))):
    t0 = time.perf_counter()
    for lvl in range(ctx.levels):
        z, its, code, tr = ctx.run_level(lvl, z, t, 0.0625)
        print(
            f"sweep t={t:.1e} level {lvl}: its={its} code={code} "
            f"cg_max={int(tr['cgits'][:its].max()) if its else 0}",
            flush=True,
        )
    print(f"sweep t={t:.1e} done in {time.perf_counter() - t0:.1f}s", flush=True)
    t *= 10.0
print("SWEEPS OK", flush=True)
