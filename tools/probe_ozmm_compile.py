"""Minimal ozaki-matmul compile probe for the axon remote compile
service.

Both full ND-factor ozaki programs (s8 and s6, fem2d L=7) were
SIGKILLed by the remote tpu_compile_helper (HTTP 500, compile-side
OOM).  This probe compiles ONE ozaki matmul at a few shapes/slice
counts to decide whether the construct itself kills the compiler or
only the fully-unrolled factor program does — the decision input for
a "ozaki only on the top-group Schur updates" hybrid.

Run on TPU:  python tools/probe_ozmm_compile.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from multigridbarrier_tpu.experimental import ozmm

rng = np.random.default_rng(0)


def timed(label, fn, *args, n=3):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    # NOTE: per-call block_until_ready run times are RTT-bound (~30-35ms,
    # CLAUDE.md session-8) for sub-RTT kernels — at small shapes the run
    # column measures tunnel latency, not device rate; only compile+1st
    # (and run deltas well above ~35ms) inform the ozaki-vs-native call.
    print(f"{label:44s} compile+1st {tc:7.1f}s   run {min(ts)*1e3:8.2f} ms"
          " (RTT-bound below ~35ms)",
          flush=True)
    return out


for (b, mdim, k, ndim), ns in [
    ((1, 694, 694, 694), 8),     # root-front Schur shape, s8
    ((1, 694, 694, 694), 6),
    ((16, 512, 512, 512), 8),    # the chained-rate probe shape
    ((64, 80, 80, 80), 8),       # mid-tree batched front shape
]:
    A = jnp.asarray(rng.standard_normal((b, mdim, k)))
    B = jnp.asarray(rng.standard_normal((b, k, ndim)))
    try:
        f = jax.jit(lambda a, bb, ns=ns: ozmm.matmul(a, bb, nslice=ns))
        out = timed(f"ozaki s{ns} ({b},{mdim},{k})@({b},{k},{ndim})", f, A, B)
        ref = np.asarray(A, dtype=np.float64) @ np.asarray(B, np.float64)
        rel = np.linalg.norm(np.asarray(out) - ref) / np.linalg.norm(ref)
        print(f"  rel err vs f64 {rel:.2e}", flush=True)
        g = jax.jit(lambda a, bb: a @ bb)
        timed(f"native f64 ({b},{mdim},{k})@({b},{k},{ndim})", g, A, B)
    except Exception as e:  # noqa: BLE001 - probe records and continues
        print(f"  FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
