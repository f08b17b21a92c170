"""Convenience entry points and host<->device conversion.

Mirrors the reference public API (/root/reference/src/MultiGridBarrierMPI.jl:
748-752): fem{1,2,3}d_mpi[_solve] become fem{1,2,3}d_solve with a Backend
argument; native_to_mpi/mpi_to_native become native_to_device /
device_to_native.  Like the reference (src:594-600), each *_solve splats the
same kwargs into both the geometry builder and amgb; both tolerate unknown
keys.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .backend import Backend, backend_auto
from .fem import fem1d, fem2d, fem3d, Geometry
from .solver import amgb, AMGBSOL, ParabolicSOL


def _builder_kwargs(kwargs, keys):
    return {k: v for k, v in kwargs.items() if k in keys}


def fem1d_solve(L: int = 4, backend: Optional[Backend] = None, **kwargs):
    """1D solve (reference fem1d_mpi_solve, src:594-600)."""
    g = fem1d(L=L, backend=backend or backend_auto())
    return amgb(g, **kwargs)


def fem2d_solve(L: int = 2, K=None, backend: Optional[Backend] = None, **kwargs):
    """2D solve (reference fem2d_mpi_solve, src:661-667)."""
    g = fem2d(L=L, K=K, backend=backend or backend_auto())
    return amgb(g, **kwargs)


def fem3d_solve(
    L: int = 2, k: int = 3, K=None, backend: Optional[Backend] = None, **kwargs
):
    """3D solve with the reference's 3D defaults (src:735-745)."""
    g = fem3d(L=L, k=k, K=K, backend=backend or backend_auto())
    return amgb(g, **kwargs)


# ----------------------------------------------------------------------------
# Host <-> device conversion (the native_to_mpi / mpi_to_native pair,
# reference src:224-528)
# ----------------------------------------------------------------------------


def native_to_device(geometry: Geometry, backend: Backend) -> Geometry:
    """Re-home a geometry onto a (possibly meshed) backend."""
    return geometry.with_backend(backend)


def _to_host(obj):
    if isinstance(obj, jnp.ndarray):
        return np.asarray(obj)
    if isinstance(obj, dict):
        return {k: _to_host(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_host(v) for v in obj)
    return obj


def device_to_native(obj):
    """Gather solutions/geometry data to host numpy (reference
    mpi_to_native, src:340-528).  Dispatches on type like the reference."""
    from .solver.amgb import AMGBSOL as _SOL
    from .solver.parabolic import ParabolicSOL as _PSOL

    if isinstance(obj, Geometry):
        return dataclasses.replace(
            obj,
            x=np.asarray(obj.x),
            w=np.asarray(obj.w),
        )
    if isinstance(obj, _SOL):
        return dataclasses.replace(obj, z=np.asarray(obj.z))
    if isinstance(obj, _PSOL):
        return dataclasses.replace(
            obj, u=[np.asarray(u) for u in obj.u]
        )
    return _to_host(obj)
