"""Strong-scaling sweep over virtual (or real) device counts — the
multi-rank scaling measurement the reference never published
(SURVEY.md §6: "No multi-rank scaling numbers are published anywhere").

Run on CPU with virtual devices:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/scaling.py --L 4 --devices 1,2,4,8
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=4)
    ap.add_argument("--dim", type=int, default=2, choices=(1, 2, 3))
    ap.add_argument("--p", type=float, default=1.0)
    ap.add_argument("--devices", default="1,2,4,8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import multigridbarrier_tpu as mgb
    from multigridbarrier_tpu.backend import Backend, make_mesh

    build = {1: mgb.fem1d, 2: mgb.fem2d, 3: mgb.fem3d}[args.dim]
    avail = len(jax.devices())
    base = None
    for nd in [int(s) for s in args.devices.split(",")]:
        if nd > avail:
            print(f"# skipping {nd} devices ({avail} available)")
            continue
        backend = (
            Backend(dtype=jnp.float64)
            if nd == 1
            else Backend(dtype=jnp.float64, mesh=make_mesh(nd))
        )
        g = build(L=args.L, backend=backend)
        sol = mgb.amgb(g, p=args.p)  # warmup/compile
        jax.block_until_ready(sol.z)
        t0 = time.perf_counter()
        sol = mgb.amgb(g, p=args.p)
        jax.block_until_ready(sol.z)
        dt = time.perf_counter() - t0
        if base is None:
            base = dt
        print(
            json.dumps(
                dict(
                    devices=nd,
                    seconds=round(dt, 3),
                    speedup=round(base / dt, 2),
                    efficiency=round(base / dt / nd, 2),
                    its=int(sol.SOL_main.its.sum()),
                )
            )
        )


if __name__ == "__main__":
    main()
