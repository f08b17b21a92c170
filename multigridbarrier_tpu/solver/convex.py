"""Convex-set descriptions and their self-concordant barriers.

The solver minimizes a functional that is *linear* in Dz; all convexity
enters through a pointwise convex constraint Dz(x) in Q (the reference's
p-Laplace default keeps (s, grad u) in the cone s >= |grad u|^p,
SURVEY.md §0 "Problem class solved").

Only the scalar barrier F0 is specified here; the per-row gradient (F1)
and Hessian (F2) the reference hand-assembles through `map_rows`
(tools/profile_barrier.jl:44-151) are derived with JAX autodiff inside the
solver.

A `Convex` carries three callables (mirroring the reference's
barrier/cobarrier/slack triple used by the feasibility phase):

  barrier(x, y)      -> scalar; +inf (nan) outside the interior of Q
  cobarrier(x, y, e) -> barrier of the relaxed set where slack components
                        are shifted by e (phase-1 / feasibility problem)
  slack(x, y)        -> a value e0 such that (x, y) with slack shifted by
                        e0 is comfortably interior (phase-1 initialization)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Convex:
    barrier: Callable
    cobarrier: Callable
    slack: Callable


def convex_Euclidian_power(
    idx: Sequence[int],
    p=2.0,
    A: Callable | None = None,
    b: Callable | None = None,
) -> Convex:
    """Pointwise power-cone constraint ||q||^p <= s.

    `idx` selects components of y: idx[:-1] are the q components, idx[-1]
    is the slack component s.  Optional affine map (A, b): the constraint is
    applied to A(x) @ y + b(x) instead of y[idx] (used e.g. by the parabolic
    driver to constrain s2 >= (u - u_prev)^2).

    Barrier: F = -log(s^(2/p) - ||q||^2) - beta * log(s),
    beta = max(0, 2 - 2/p) — for p=1 this is the standard second-order-cone
    barrier -log(s^2 - ||q||^2); for p=2 it is -log(s - ||q||^2) - log(s).
    `p` may be a scalar or a callable p(x).
    """
    idx = tuple(int(i) for i in idx)

    def select(x, y):
        if A is not None:
            Ax = jnp.asarray(A(x))
            bx = jnp.asarray(b(x)) if b is not None else 0.0
            ysel = Ax @ y + bx
        else:
            ysel = y[jnp.array(idx)]
        return ysel[:-1], ysel[-1]

    def pval(x):
        return p(x) if callable(p) else p

    def _barrier_qs(x, q, s):
        pv = pval(x)
        beta = jnp.maximum(0.0, 2.0 - 2.0 / pv)
        margin = s ** (2.0 / pv) - jnp.sum(q * q)
        # INVARIANT: the beta * log(s) term must not be short-circuited at
        # beta == 0.  For p = 1 (beta = 0) the wrong cone branch s <= -|q|
        # has margin > 0, and the only thing rejecting it is
        # 0 * log(negative) = 0 * NaN = NaN here — the solver's
        # "feasible <=> finite barrier" skip check (amgb phase 1) and the
        # line-search isfinite guard both rely on that NaN.
        return -jnp.log(margin) - beta * jnp.log(s)

    def barrier(x, y):
        q, s = select(x, y)
        return _barrier_qs(x, q, s)

    def cobarrier(x, y, e):
        q, s = select(x, y)
        return _barrier_qs(x, q, s + e)

    def slack(x, y):
        q, s = select(x, y)
        pv = pval(x)
        need = jnp.sum(q * q) ** (pv / 2.0)  # = ||q||^p
        return need + 1.0 - s

    return Convex(barrier=barrier, cobarrier=cobarrier, slack=slack)


def convex_linear(
    A: Callable | None = None, b: Callable | None = None
) -> Convex:
    """Pointwise linear constraints A(x) @ y <= b(x), barrier
    -sum(log(b - A y))."""

    def residual(x, y):
        Ax = jnp.asarray(A(x))
        bx = jnp.asarray(b(x))
        return bx - Ax @ y

    def barrier(x, y):
        return -jnp.sum(jnp.log(residual(x, y)))

    def cobarrier(x, y, e):
        return -jnp.sum(jnp.log(residual(x, y) + e))

    def slack(x, y):
        return jnp.max(-residual(x, y)) + 1.0

    return Convex(barrier=barrier, cobarrier=cobarrier, slack=slack)


def convex_intersect(*Qs: Convex) -> Convex:
    """Intersection of convex sets: barriers add, slacks max."""

    def barrier(x, y):
        return sum(Q.barrier(x, y) for Q in Qs)

    def cobarrier(x, y, e):
        return sum(Q.cobarrier(x, y, e) for Q in Qs)

    def slack(x, y):
        vals = jnp.stack([Q.slack(x, y) for Q in Qs])
        return jnp.max(vals)

    return Convex(barrier=barrier, cobarrier=cobarrier, slack=slack)
