"""parabolic_solve — implicit time stepping for time-dependent problems.

The reference drives time-dependent p-Laplace diffusion by solving one
barrier problem per implicit-Euler step, reusing the same distributed
geometry (call stack SURVEY.md §3.2; test/test_parabolic.jl:48-104:
signature parabolic_solve(g; h, t1, p, verbose), result has fields
`geometry`, `ts`, `u` with len(u) == len(ts)).

Each step solves

    min_u  int f1*u + |grad u|^p + (u - u_prev)^2 / (2h)

formulated in the linear-cost barrier framework with two slack fields:

    fields (u, s1, s2), D = [u:id, u:dx[, u:dy[, u:dz]], s1:id, s2:id]
    cost c = [f1, 0..., 1, 1/(2h)]
    Q = { ||grad u||^p <= s1 }  ∩  { (u - u_prev)^2 <= s2 }

u_prev enters as an aux data column appended to x (see amgb's `aux`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.geometry import Geometry
from .amgb import AMGBSOL, amgb, default_g
from .convex import convex_Euclidian_power, convex_intersect


@dataclasses.dataclass
class ParabolicSOL:
    geometry: Geometry
    ts: list  # time values, ts[0] = 0
    u: list  # snapshots, one (n, nfields) array per time value
    sols: list  # per-step AMGBSOL (diagnostics)


def parabolic_solve(
    geometry: Geometry,
    *,
    h: float = 0.5,
    t1: float = 1.0,
    p=1.0,
    f1: float | Callable = 0.5,
    g: Optional[Callable] = None,
    verbose: bool = False,
    **kwargs,
):
    dim = geometry.dim
    dtype = geometry.x.dtype
    n = geometry.n

    grads = ["dx", "dy", "dz"][:dim]
    D = (
        [("u", "id")]
        + [("u", g_) for g_ in grads]
        + [("s1", "id"), ("s2", "id")]
    )
    k = len(D)

    def fcost(x):
        f1v = f1(x[:dim]) if callable(f1) else f1
        return jnp.asarray(
            [f1v] + [0.0] * dim + [1.0, 1.0 / (2.0 * h)], dtype=dtype
        )

    # Q1: ||grad u||^p <= s1  (components 1..dim and dim+1)
    Q1 = convex_Euclidian_power(idx=tuple(range(1, dim + 2)), p=p)

    # Q2: (u - u_prev)^2 <= s2 ; u_prev is aux column dim of x.
    def A2(x):
        A = jnp.zeros((2, k), dtype=dtype)
        A = A.at[0, 0].set(1.0).at[1, k - 1].set(1.0)
        return A

    def b2(x):
        return jnp.stack([-x[dim], jnp.asarray(0.0, dtype=dtype)])

    Q2 = convex_Euclidian_power(idx=(0, k - 1), p=2.0, A=A2, b=b2)
    Q = convex_intersect(Q1, Q2)

    # initial data: u component of g (default: |x|^2 with boundary trace).
    ginit = g if g is not None else default_g(dim, dtype)
    u0 = jax.vmap(lambda xi: jnp.asarray(ginit(xi), dtype=dtype)[0])(geometry.x)

    ts = [0.0]
    nf = 3
    z = jnp.concatenate(
        [u0[:, None], jnp.full((n, 2), 100.0, dtype=dtype)], axis=1
    )
    snapshots = [z]
    sols = []

    t = 0.0
    while t < t1 - 1e-12:
        t = min(t + h, t1)
        u_prev = snapshots[-1][:, 0]
        # initial iterate: previous solution with refreshed slack fields
        # (pointwise-feasible by construction; phase 1 then runs trivially).
        sol = amgb(
            geometry,
            D=D,
            f=fcost,
            Q=Q,
            p=p,
            aux=u_prev[:, None],
            z0=jnp.concatenate(
                [u_prev[:, None], jnp.full((n, 2), 100.0, dtype=dtype)], axis=1
            ),
            verbose=verbose,
            **kwargs,
        )
        z = sol.z
        ts.append(t)
        snapshots.append(z)
        sols.append(sol)
        if verbose:
            print(f"[parabolic] t={t:.4f} done")

    return ParabolicSOL(geometry=geometry, ts=ts, u=snapshots, sols=sols)
