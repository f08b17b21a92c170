"""AOT-compile the fine-level fused ND programs into the persistent cache.

The axon remote compile service is an externally-queued single resource with
30s-40min latency per program; a cold-cache L=8 bench warmup pays its two
giant fine-level programs (nd_step_auto ~2300s, nd_init_auto ~1500s observed)
SERIALLY at the end of the warmup solve, after every coarse-level compile.
This helper runs in a SEPARATE process concurrently with the bench: it builds
the identical solver context (same geometry, same env knobs -> same
SolverOptions snapshot -> identical traced programs), fabricates
correctly-shaped arguments via jax.eval_shape (values are irrelevant to
compilation), and calls the fine step/init programs once each -- populating
the shared persistent compile cache (multigridbarrier_tpu/__init__.py) so the
bench's warmup loads them as disk hits instead of queue waits.

Exact-match requirements (any mismatch silently degrades to a duplicate
compile, never a wrong result):
  * run with the SAME MGB_* env as the bench (the options snapshot and e.g.
    MGB_ND_INV shape the traced program);
  * argument avals must match the real loop's calls in _run_level_nd_auto
    (python bools stay python bools, caps are jnp.int32, t is a strong-f64
    scalar) -- mirrored verbatim below.

Usage (background, while a bench warms up):
  MGB_AOT_L=8 [MGB_ND_INV=0 ...] python -u tools/aot_fine_compile.py

Compiles nd_step_auto FIRST (the biggest program, needed last by the bench),
then nd_init_auto: if the bench's serial warmup reaches the fine level while
the step compile is still in flight, it compiles init itself in parallel and
the two processes converge with no wasted queue entry.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    L = int(os.environ.get("MGB_AOT_L", "8"))

    import jax
    import jax.numpy as jnp

    import importlib

    import multigridbarrier_tpu as mgb

    # the solver package re-exports the amgb FUNCTION under the module name
    A = importlib.import_module("multigridbarrier_tpu.solver.amgb")

    dtype = jnp.float64
    backend = mgb.backend_cpu(dtype=dtype)
    t0 = time.time()
    g = mgb.fem2d(L=L, backend=backend)
    print(f"# aot: geometry L={L} n={g.n} built {time.time() - t0:.1f}s",
          flush=True)

    dim = g.dim
    spec = A._normalize_D(A.default_D(dim))
    ffun = A.default_f(dim, dtype)
    gfun = A.default_g(dim, dtype)
    Qset = A.default_Q(dim, 1.0)
    x = g.x
    c = jax.vmap(lambda xi: jnp.asarray(ffun(xi), dtype=dtype))(x)
    z0 = jax.vmap(lambda xi: jnp.asarray(gfun(xi), dtype=dtype))(x)
    z0 = g.backend.shard_rows(z0)

    ctx = A._get_ctx(
        g, spec, Qset.barrier, c,
        subspace="dirichlet", linear_solver=None, x=x, newton_cap=200,
    )
    level = g.levels - 1
    t0 = time.time()
    h = ctx._get_nd(level)
    print(f"# aot: _get_nd(level={level}) traced {time.time() - t0:.1f}s",
          flush=True)

    init, step = h["nd_init_auto"], h["nd_step_auto"]
    full_ids, cst = h["nd_full_ids"], h["nd_consts"]
    basis = ctx._bases[level]
    Pl = ctx._P[level]
    rloc = basis.rloc
    t_arr = jnp.asarray(0.1, dtype=dtype)
    delta_pc = jnp.asarray(
        A._nd_cheap_delta(),
        jnp.float64 if A._nd_cheap_engine() == "df" else jnp.float32,
    )
    cap = jnp.int32(8)

    # shapes of the step's loop-carried inputs, without compiling init
    sh = jax.eval_shape(
        init, Pl, basis, ctx.x, ctx.w, ctx.c, z0, t_arr, full_ids, cst,
        True, cap, delta_pc,
    )
    gv_s, y_s, cy_s, fy0_s, dvp_s = sh[0], sh[1], sh[2], sh[3], sh[4]
    gv, y, cy, fy0, dvp = (
        jnp.zeros(s.shape, s.dtype) for s in (gv_s, y_s, cy_s, fy0_s, dvp_s)
    )

    t0 = time.time()
    outs = step(
        Pl, basis, rloc, ctx.x, ctx.w, ctx.c, z0, t_arr, y, cy, fy0, gv,
        dvp, full_ids, cst, True, cap, delta_pc,
    )
    jax.block_until_ready(outs[1])
    print(f"# aot: nd_step_auto compiled+ran {time.time() - t0:.1f}s",
          flush=True)

    t0 = time.time()
    outs2 = init(
        Pl, basis, ctx.x, ctx.w, ctx.c, z0, t_arr, full_ids, cst,
        True, cap, delta_pc,
    )
    jax.block_until_ready(outs2[3])
    print(f"# aot: nd_init_auto compiled+ran {time.time() - t0:.1f}s",
          flush=True)
    print("# aot: done", flush=True)


if __name__ == "__main__":
    main()
