"""Solution visualization — the reference's `plot(sol)` capability
(/root/reference/README.md:44-48, PyPlot on rank 0).

Single-controller JAX has no rank-0 gate; `plot` works on any solution
object.  Headless-friendly: pass `fname` to save instead of showing.
"""

from __future__ import annotations

import numpy as np


def _get_u(sol_or_z):
    from ..solver.amgb import AMGBSOL
    from ..solver.parabolic import ParabolicSOL

    if isinstance(sol_or_z, AMGBSOL):
        return sol_or_z.geometry, np.asarray(sol_or_z.z)[:, 0]
    raise TypeError(f"cannot plot {type(sol_or_z)}")


def plot(sol, field: int = 0, fname: str | None = None, ax=None, **kwargs):
    """Plot the `field` component of a solution over the mesh.

    1D: line plot of u(x); 2D: triangulated surface (tripcolor);
    3D: scatter of quadrature values colored by u.  Returns the
    matplotlib Axes.
    """
    import matplotlib

    if fname is not None:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    from ..solver.amgb import AMGBSOL
    from ..solver.parabolic import ParabolicSOL

    if isinstance(sol, ParabolicSOL):
        return plot_parabolic(sol, field=field, fname=fname, **kwargs)

    if isinstance(sol, AMGBSOL):
        g, u = sol.geometry, np.asarray(sol.z)[:, field]
    else:
        raise TypeError(f"cannot plot {type(sol)}")
    nr = getattr(g, "n_real", len(u))  # drop mesh-padding rows
    x = np.asarray(g.x)[:nr]
    u = u[:nr]
    dim = g.dim

    created = ax is None
    if created:
        fig = plt.figure()
        if dim == 2:
            ax = fig.add_subplot(projection="3d")
        else:
            ax = fig.add_subplot()

    if dim == 1:
        order = np.argsort(x[:, 0])
        ax.plot(x[order, 0], u[order], **kwargs)
        ax.set_xlabel("x")
        ax.set_ylabel("u")
    elif dim == 2:
        ax.plot_trisurf(x[:, 0], x[:, 1], u, cmap=kwargs.pop("cmap", "viridis"), **kwargs)
        ax.set_xlabel("x")
        ax.set_ylabel("y")
    else:
        sc = ax.scatter(
            x[:, 0], x[:, 1], c=u, s=8, cmap=kwargs.pop("cmap", "viridis"), **kwargs
        )
        ax.figure.colorbar(sc, ax=ax, label="u")
        ax.set_xlabel("x")
        ax.set_ylabel("y")

    if fname is not None:
        ax.figure.savefig(fname, dpi=120, bbox_inches="tight")
        plt.close(ax.figure)
    return ax


def plot_parabolic(psol, field: int = 0, fname: str | None = None, ncols: int = 3, **kwargs):
    """Grid of snapshots for a time-dependent solution."""
    import matplotlib

    if fname is not None:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    g = psol.geometry
    nr = getattr(g, "n_real", g.x.shape[0])  # drop mesh-padding rows
    x = np.asarray(g.x)[:nr]
    nts = len(psol.ts)
    nrows = -(-nts // ncols)
    fig = plt.figure(figsize=(4 * ncols, 3 * nrows))
    for i, (t, u) in enumerate(zip(psol.ts, psol.u)):
        uu = np.asarray(u)[:nr, field]
        if g.dim == 2:
            ax = fig.add_subplot(nrows, ncols, i + 1, projection="3d")
            ax.plot_trisurf(x[:, 0], x[:, 1], uu, cmap="viridis")
        else:
            ax = fig.add_subplot(nrows, ncols, i + 1)
            if g.dim == 1:
                order = np.argsort(x[:, 0])
                ax.plot(x[order, 0], uu[order])
            else:
                ax.scatter(x[:, 0], x[:, 1], c=uu, s=8, cmap="viridis")
        ax.set_title(f"t = {t:g}")
    if fname is not None:
        fig.savefig(fname, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig
