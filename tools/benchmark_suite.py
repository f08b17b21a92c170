"""Benchmark the BASELINE.json configuration list:

  1. 2D p-Laplace fem2d_solve(L=3, p=1.0)   (README quickstart)
  2. 1D p-Laplace fem1d L=8, p=1.0 and p=2.0
  3. 3D hexahedral p-Laplace fem3d L=4 (k=2)
  4. Parabolic time-dependent p-Laplace (test_parabolic workload)
  5. (separate) fem2d L=7 strong scaling — see bench.py / tools/scaling.py

Prints one JSON line per config (warm solve, compile excluded).
Select with --only 1,2 etc.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def _timed(fn):
    import jax

    out = fn()
    jax.block_until_ready(getattr(out, "z", getattr(out, "u", out)))
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(getattr(out, "z", getattr(out, "u", out)))
    return time.perf_counter() - t0, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    import jax
    import multigridbarrier_tpu as mgb

    def run(tag, fn, **extra):
        dt, sol = _timed(fn)
        its = (
            int(sol.SOL_main.its.sum())
            if hasattr(sol, "SOL_main")
            else sum(int(s.SOL_main.its.sum()) for s in getattr(sol, "sols", []))
        )
        print(json.dumps(dict(config=tag, seconds=round(dt, 3), its=its, **extra)))

    if only is None or "1" in only:
        g = mgb.fem2d(L=3)
        run("fem2d L=3 p=1 (quickstart)", lambda: mgb.amgb(g, p=1.0), n=g.n)
    if only is None or "2" in only:
        g1 = mgb.fem1d(L=8)
        run("fem1d L=8 p=1", lambda: mgb.amgb(g1, p=1.0), n=g1.n)
        run("fem1d L=8 p=2", lambda: mgb.amgb(g1, p=2.0), n=g1.n)
    if only is None or "3" in only:
        g3 = mgb.fem3d(L=4, k=2)
        run("fem3d L=4 k=2 p=1", lambda: mgb.amgb(g3, p=1.0), n=g3.n)
    if only is None or "4" in only:
        g2 = mgb.fem2d(L=3)
        run(
            "parabolic fem2d L=3 h=0.5 t1=1",
            lambda: mgb.parabolic_solve(g2, h=0.5, t1=1.0, p=1.0),
            n=g2.n,
        )


if __name__ == "__main__":
    main()
