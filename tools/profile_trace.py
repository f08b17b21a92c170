"""Capture a jax.profiler trace of the barrier solve for TensorBoard /
Perfetto (the reference's Profile.@profile statistical runs,
tools/julia_profile.jl analogue).

Usage:  python tools/profile_trace.py [--L 3] [--dim 2] [--out /tmp/mgb_trace]
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=3)
    ap.add_argument("--dim", type=int, default=2, choices=(1, 2, 3))
    ap.add_argument("--p", type=float, default=1.0)
    ap.add_argument("--out", default="/tmp/mgb_trace")
    args = ap.parse_args()

    import jax
    import multigridbarrier_tpu as mgb

    build = {1: mgb.fem1d, 2: mgb.fem2d, 3: mgb.fem3d}[args.dim]
    g = build(L=args.L)
    # warm up (compile) outside the trace
    sol = mgb.amgb(g, p=args.p, tol=1e-5)
    jax.block_until_ready(sol.z)

    with jax.profiler.trace(args.out):
        sol = mgb.amgb(g, p=args.p, tol=1e-5)
        jax.block_until_ready(sol.z)
    print(f"trace written to {args.out} (view with TensorBoard or Perfetto)")


if __name__ == "__main__":
    main()
