"""Headline benchmark: fem2d p-Laplace (p=1) barrier solve.

Reference baseline (BASELINE.md, /root/reference/docs/src/guide.md:252):
fem2d L=7 (n = 57,344 broken dofs), Float64 — native 96.694 s / MPI+MUMPS
118.070 s on an M4 MacBook Pro (1 rank, 10 BLAS threads).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
value is the solve wall-time in seconds (after a warm-up solve that pays
all jit compilation — mirroring BenchmarkTools medians which exclude Julia
compilation) and vs_baseline = reference_native_seconds / our_seconds
(>1 means faster than the reference).

Env overrides: MGB_BENCH_L (default 7), MGB_BENCH_DTYPE (f64|f32),
MGB_BENCH_PROBLEM (fem2d|fem3d; fem3d uses MGB_BENCH_K, default 3, and
has no published reference number — the reference benchmarks only fem2d),
MGB_BENCH_REPS (timed-solve repetitions; default 3 for L<=6, 2 at L=7,
1 at L=8 — the JSON reports the median and the min-max spread).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_NATIVE_S = {1: 0.018, 2: 0.028, 3: 0.074, 4: 0.480, 5: 2.508, 6: 26.384, 7: 96.694, 8: 659.276}


def _run_in_subprocess() -> int:
    """The shared TPU worker occasionally crashes mid-run (UNAVAILABLE) or —
    worse — the tunnel RPC hangs forever in a futex wait after a worker
    restart; a crashed PJRT client cannot recover in-process, so the
    measurement runs in a child process with a hard wall-clock timeout and
    is retried once on failure."""
    env = dict(os.environ, MGB_BENCH_SUBPROCESS="1")
    timeout_s = float(os.environ.get("MGB_BENCH_TIMEOUT", "5400"))
    # The axon tunnel can wedge so hard that even creating the PJRT
    # client blocks forever (observed: >1h).  Probe it with a trivial
    # op before committing to a full bench attempt; if it stays dead,
    # fall back to a local-CPU measurement — an honest (slower) number
    # beats a driver timeout with no number at all.
    if env.get("PALLAS_AXON_POOL_IPS") and not env.get("MGB_BENCH_NO_PROBE"):
        for probe in range(3):
            try:
                # block_until_ready on a non-scalar: the FIRST scalar
                # device_get of a process can stall 100s+ on a healthy
                # tunnel (axon quirk, CLAUDE.md session-3) — a scalar-get
                # probe declares a live tunnel dead and falls back to CPU.
                rc = subprocess.run(
                    [
                        sys.executable,
                        "-c",
                        "import jax, jax.numpy as jnp;"
                        "x = jnp.ones((128, 128));"
                        "jax.block_until_ready(x @ x);"
                        "print('ok')",
                    ],
                    env=env,
                    stdout=subprocess.DEVNULL,
                    stderr=subprocess.DEVNULL,
                    timeout=180,
                ).returncode
            except subprocess.TimeoutExpired:
                rc = -1
            if rc == 0:
                break
            print(
                f"# tpu tunnel probe {probe + 1}/3 failed", file=sys.stderr
            )
            time.sleep(60)
        else:
            print(
                "# tpu tunnel dead; falling back to local CPU",
                file=sys.stderr,
            )
            env.pop("PALLAS_AXON_POOL_IPS", None)
            env["JAX_PLATFORMS"] = "cpu"
            env["MGB_BENCH_PLATFORM_NOTE"] = "cpu-fallback"
    def _to_cpu_fallback():
        """A failed/timed-out tunnel attempt is not retried on the
        tunnel: remote-compile latency is externally queued (30s-10min
        per kernel) and a second attempt usually meets the same fate —
        an honest local-CPU number beats a driver timeout with none."""
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["MGB_BENCH_PLATFORM_NOTE"] = "cpu-fallback"

    for attempt in range(3):
        try:
            res = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)],
                env=env,
                stdout=subprocess.PIPE,
                text=True,
                timeout=timeout_s,
            )
        except subprocess.TimeoutExpired:
            print(
                f"# bench attempt {attempt + 1} timed out after {timeout_s:.0f}s; "
                + ("retrying" if attempt < 2 else "giving up"),
                file=sys.stderr,
            )
            if env.get("PALLAS_AXON_POOL_IPS"):
                _to_cpu_fallback()
            continue
        out = res.stdout or ""
        line = next(
            (l for l in reversed(out.splitlines()) if l.startswith("{")), None
        )
        if res.returncode == 0 and line:
            print(line)
            return 0
        print(
            f"# bench attempt {attempt + 1} failed (rc={res.returncode}); "
            + ("retrying" if attempt < 2 else "giving up"),
            file=sys.stderr,
        )
        if attempt == 1 and env.get("PALLAS_AXON_POOL_IPS"):
            # two tunnel attempts failed (worker crash loop): final
            # attempt runs local CPU
            _to_cpu_fallback()
    return 1


def main():
    # `kill -USR1 <pid>` dumps all thread stacks — the only way to see where
    # a hung tunnel RPC is blocked (py-spy is not in the image).
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1, all_threads=True)

    problem = os.environ.get("MGB_BENCH_PROBLEM", "fem2d")
    L = int(os.environ.get("MGB_BENCH_L", "7" if problem == "fem2d" else "3"))
    dtype_name = os.environ.get("MGB_BENCH_DTYPE", "f64")

    import jax
    import jax.numpy as jnp
    import multigridbarrier_tpu as mgb

    dtype = jnp.float64 if dtype_name == "f64" else jnp.float32
    backend = mgb.backend_cpu(dtype=dtype)

    t0 = time.perf_counter()
    if problem == "fem3d":
        k = int(os.environ.get("MGB_BENCH_K", "3"))
        g = mgb.fem3d(L=L, k=k, backend=backend)
        metric_name = f"fem3d L={L} k={k} p=1 barrier solve wall-time"
    else:
        g = mgb.fem2d(L=L, backend=backend)
        metric_name = f"fem2d L={L} p=1 barrier solve wall-time"
    t_geom = time.perf_counter() - t0
    print(f"# geometry L={L} n={g.n} built in {t_geom:.1f}s", file=sys.stderr)

    def solve():
        # default tol = sqrt(eps(T)) — the reference amgb default used by
        # its published benchmark runs (tools/benchmark_fem2d.jl)
        sol = mgb.amgb(
            g,
            p=1.0,
            tol=None if dtype_name == "f64" else 1e-4,
            logfile=sys.stderr,
        )
        jax.block_until_ready(sol.z)
        return sol

    # warm-up: pays jit compilation for every level/phase
    t0 = time.perf_counter()
    sol = solve()
    warm = time.perf_counter() - t0
    print(
        f"# warmup {warm:.1f}s its={sol.SOL_main.its.tolist()}", file=sys.stderr
    )

    # Repeated timed solves quantify run noise (the reference's own
    # methodology is BenchmarkTools medians for L<=5, single-run above —
    # SURVEY.md section 6).  Repetition count shrinks with problem size so
    # the bench stays inside the driver budget: median-of-3 through L=7
    # (n=2 cannot distinguish a regression from queue noise at
    # parity-vs-win stakes — round-4 verdict; warmup has paid all
    # compiles, so each extra timed solve is ~100s), 1 at L=8.
    if problem == "fem2d":
        reps_default = 3 if L <= 7 else 1
    else:
        reps_default = 1  # fem3d L=3 k=3 is ~160s/solve on the 1-core host
    reps = int(os.environ.get("MGB_BENCH_REPS", str(reps_default)))
    times = []
    for rep in range(max(1, reps)):
        t0 = time.perf_counter()
        sol = solve()
        times.append(time.perf_counter() - t0)
        print(f"# timed[{rep}] {times[-1]:.3f}s", file=sys.stderr)
    times.sort()
    elapsed = times[len(times) // 2] if len(times) % 2 else 0.5 * (
        times[len(times) // 2 - 1] + times[len(times) // 2]
    )
    spread = times[-1] - times[0]

    base = BASELINE_NATIVE_S.get(L) if problem == "fem2d" else None
    dofs_per_sec = g.n / elapsed
    print(
        f"# timed median {elapsed:.3f}s of {len(times)} "
        f"(min {times[0]:.3f} max {times[-1]:.3f} spread {spread:.3f})  "
        f"DOFs/s/chip {dofs_per_sec:.3e}  "
        f"iters {int(sol.SOL_main.its.sum())}",
        file=sys.stderr,
    )
    note = os.environ.get("MGB_BENCH_PLATFORM_NOTE")
    tag = f"{dtype_name}, {note}" if note else dtype_name
    # final objective: the honesty check (round-2 finding — any speedup
    # claim must be validated against the converged c_dot_Dz; recorded
    # floor bands live in tests/test_ground_truth.py)
    objective = float(sol.SOL_main.c_dot_Dz[-1]) if sol.SOL_main.c_dot_Dz else None
    print(
        json.dumps(
            {
                "metric": f"{metric_name} ({tag})",
                "value": round(elapsed, 4),
                "unit": "s",
                "vs_baseline": round(base / elapsed, 3) if base else None,
                "n_timed": len(times),
                "spread_s": round(spread, 4),
                "objective": objective,
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("MGB_BENCH_SUBPROCESS") or os.environ.get("MGB_BENCH_NO_FORK"):
        main()
    else:
        sys.exit(_run_in_subprocess())
