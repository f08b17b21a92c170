"""Per-phase wall-time breakdown of a barrier solve (the reference's
tools/profile_solve.jl / profile_barrier.jl analogue, using
block_until_ready timing instead of MPI-rank timers).

Usage:  python tools/profile_solve.py [--L 4] [--dim 2] [--p 1.0]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=4)
    ap.add_argument("--dim", type=int, default=2, choices=(1, 2, 3))
    ap.add_argument("--p", type=float, default=1.0)
    ap.add_argument("--tol", type=float, default=None)
    args = ap.parse_args()

    import multigridbarrier_tpu as mgb
    from multigridbarrier_tpu.solver.amgb import (
        _get_ctx, _normalize_D, default_D, default_f, default_g, default_Q,
    )

    build = {1: mgb.fem1d, 2: mgb.fem2d, 3: mgb.fem3d}[args.dim]
    t0 = time.perf_counter()
    g = build(L=args.L)
    print(f"geometry: {time.perf_counter()-t0:.2f}s  n={g.n} levels={g.levels}")

    dtype = g.x.dtype
    spec = _normalize_D(default_D(g.dim))
    Q = default_Q(g.dim, args.p)
    c = jax.vmap(lambda xi: jnp.asarray(default_f(g.dim, dtype)(xi), dtype=dtype))(g.x)
    z0 = jax.vmap(lambda xi: jnp.asarray(default_g(g.dim, dtype)(xi), dtype=dtype))(g.x)
    ctx = _get_ctx(g, spec, Q.barrier, c)

    # compile (parallel) then measure per-level Newton-loop latency
    t0 = time.perf_counter()
    ctx.warmup(z0, 0.1)
    print(f"warmup (all level kernels): {time.perf_counter()-t0:.2f}s")

    for lvl in range(ctx.levels):
        z, its, code, tr = ctx.run_level(lvl, z0, 0.1, 0.0625)
        t0 = time.perf_counter()
        z, its, code, tr = ctx.run_level(lvl, z0, 0.1, 0.0625)
        dt = time.perf_counter() - t0
        m = ctx._bases[lvl].m
        print(
            f"level {lvl}: m={m:7d} run_level={dt*1e3:9.1f}ms "
            f"({its} its, {dt/max(its,1)*1e3:7.1f}ms/it) code={code}"
        )

    t0 = time.perf_counter()
    sol = mgb.amgb(g, p=args.p, tol=args.tol)
    jax.block_until_ready(sol.z)
    total = time.perf_counter() - t0
    its = int(sol.SOL_main.its.sum())
    print(f"full solve: {total:.2f}s  its={sol.SOL_main.its.tolist()} (sum {its})")
    print(f"per-Newton-step: {total/max(its,1)*1e3:.1f}ms")


if __name__ == "__main__":
    main()
