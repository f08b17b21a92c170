"""IO utilities: rank-0 stream parity + solution/geometry persistence.

The reference's `io0()` returns a stream that prints only on MPI rank 0
(/root/reference/docs/src/api.md:105-115).  Single-controller JAX has one
Python process regardless of device count, so io0 is the identity — kept
for API parity and for scripts ported from the reference.

Persistence exceeds the reference capability (its nearest feature is
`mpi_to_native` for host gather, SURVEY.md §5.4): solutions and geometry
data round-trip through a single .npz archive.
"""

from __future__ import annotations

import sys

import numpy as np


def io0():
    """Stream that prints on the controller (reference io0 parity)."""
    return sys.stdout


def _flatten_log(log):
    if not log:
        return {}
    keys = sorted(log[0].keys())
    out = {}
    for k in keys:
        vals = [rec.get(k) for rec in log]
        if isinstance(vals[0], str):
            out[f"log_{k}"] = np.asarray(vals, dtype="U16")
        else:
            out[f"log_{k}"] = np.asarray(vals, dtype=np.float64)
    return out


def save_solution(fname: str, sol) -> None:
    """Save an AMGBSOL or ParabolicSOL to an .npz archive (host arrays)."""
    from ..solver.amgb import AMGBSOL
    from ..solver.parabolic import ParabolicSOL

    if isinstance(sol, AMGBSOL):
        data = dict(
            kind="amgb",
            z=np.asarray(sol.z),
            x=np.asarray(sol.geometry.x),
            w=np.asarray(sol.geometry.w),
            main_ts=np.asarray(sol.SOL_main.ts),
            main_its=np.asarray(sol.SOL_main.its),
            main_c_dot_Dz=np.asarray(sol.SOL_main.c_dot_Dz),
            main_t_elapsed=np.asarray(sol.SOL_main.t_elapsed),
            **_flatten_log(sol.log),
        )
    elif isinstance(sol, ParabolicSOL):
        data = dict(
            kind="parabolic",
            ts=np.asarray(sol.ts),
            x=np.asarray(sol.geometry.x),
            w=np.asarray(sol.geometry.w),
        )
        for i, u in enumerate(sol.u):
            data[f"u_{i}"] = np.asarray(u)
    else:
        raise TypeError(f"cannot save {type(sol)}")
    np.savez_compressed(fname, **data)


def load_solution(fname: str):
    """Load a saved solution as a dict of numpy arrays."""
    with np.load(fname, allow_pickle=False) as f:
        return {k: f[k] for k in f.files}
