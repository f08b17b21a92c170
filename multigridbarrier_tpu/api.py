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


@dataclasses.dataclass
class NativeGeometry:
    """Host (numpy/scipy) form of a Geometry — the target of
    device_to_native and the source of native_to_device, mirroring the
    reference's native Geometry of plain Matrix/Vector/SparseMatrixCSC
    (mpi_to_native deep-converts every operator/subspace/refine/coarsen,
    src/MultiGridBarrierMPI.jl:340-407)."""

    discretization: object
    x: np.ndarray  # (n, dim)
    w: np.ndarray  # (n,)
    operators: dict  # name -> scipy CSR
    subspaces: dict  # name -> tuple of scipy CSR
    refine: tuple  # scipy CSR per level transition
    coarsen: tuple
    embed: dict  # name -> tuple of scipy CSR

    @property
    def n(self) -> int:
        return self.x.shape[0]

    @property
    def dim(self) -> int:
        return self.x.shape[1]

    @property
    def levels(self) -> int:
        return len(self.subspaces["dirichlet"])


def _blockdiag_from_scipy(A, nelem: int, nq: int, dtype):
    """scipy block-diagonal CSR -> BlockDiagOp dense element blocks via a
    BSR view (block rows align with elements by construction)."""
    from .runtime import BlockDiagOp

    bsr = A.tobsr(blocksize=(nq, nq))
    blocks = np.zeros((nelem, nq, nq), dtype=dtype)
    for e in range(nelem):
        lo, hi = bsr.indptr[e], bsr.indptr[e + 1]
        for k in range(lo, hi):
            if bsr.indices[k] == e:
                blocks[e] = bsr.data[k]
    return BlockDiagOp.from_blocks(jnp.asarray(blocks, dtype=dtype))


def native_to_device(geometry, backend: Backend) -> Geometry:
    """Re-home a geometry onto a (possibly meshed) backend.

    Accepts either a device Geometry (re-homed via with_backend) or a
    NativeGeometry from device_to_native (rebuilt from host scipy/numpy —
    the reference's native_to_mpi scatter, src:259-338)."""
    if isinstance(geometry, Geometry):
        return geometry.with_backend(backend)

    from .runtime import BlockDiagOp, ell_from_scipy, level_basis_from_csr

    ng: NativeGeometry = geometry
    disc = ng.discretization
    nelem, nq = disc.nelem, disc.nq
    dtype = np.dtype(backend.dtype)
    itype = np.dtype(backend.itype)
    to_ell = lambda A: ell_from_scipy(A, dtype=dtype, itype=itype)  # noqa: E731
    to_lb = lambda R: level_basis_from_csr(  # noqa: E731
        R, nq, dtype=dtype, itype=itype
    )
    operators = {}
    for name, A in ng.operators.items():
        if name == "id":
            operators[name] = BlockDiagOp.identity(nelem, nq, backend.dtype)
        else:
            operators[name] = _blockdiag_from_scipy(A, nelem, nq, dtype)
    return Geometry(
        discretization=disc,
        x=jnp.asarray(ng.x, dtype=backend.dtype),
        w=jnp.asarray(ng.w, dtype=backend.dtype),
        operators=operators,
        subspaces={
            k: tuple(to_ell(R) for R in v) for k, v in ng.subspaces.items()
        },
        refine=tuple(to_ell(R) for R in ng.refine),
        coarsen=tuple(to_ell(R) for R in ng.coarsen),
        embed={k: tuple(to_ell(E) for E in v) for k, v in ng.embed.items()},
        backend=backend,
        bases={
            k: tuple(to_lb(R) for R in v) for k, v in ng.subspaces.items()
        },
    )


def _to_host(obj):
    """Recursive device->host conversion: jax arrays to numpy, containers
    and dataclasses converted field-by-field (the reference's
    convert_namedtuple/convert_value recursion, src:409-474)."""
    if isinstance(obj, jnp.ndarray):
        return np.asarray(obj)
    if isinstance(obj, dict):
        return {k: _to_host(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_host(v) for v in obj)
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return dataclasses.replace(
            obj,
            **{
                f.name: _to_host(getattr(obj, f.name))
                for f in dataclasses.fields(obj)
            },
        )
    return obj


def device_to_native(obj):
    """Gather solutions/geometry data to host numpy/scipy (reference
    mpi_to_native, src:340-528).  Dispatches on type like the reference:
    Geometry -> NativeGeometry with every operator/subspace/refine/coarsen
    as scipy CSR; AMGBSOL/ParabolicSOL -> deep host copies with their
    geometry converted."""
    from .solver.amgb import AMGBSOL as _SOL
    from .solver.parabolic import ParabolicSOL as _PSOL

    if isinstance(obj, Geometry):
        return NativeGeometry(
            discretization=obj.discretization,
            x=np.asarray(obj.x),
            w=np.asarray(obj.w),
            operators={k: op.to_scipy() for k, op in obj.operators.items()},
            subspaces={
                k: tuple(R.to_scipy() for R in v)
                for k, v in obj.subspaces.items()
            },
            refine=tuple(R.to_scipy() for R in obj.refine),
            coarsen=tuple(R.to_scipy() for R in obj.coarsen),
            embed={
                k: tuple(E.to_scipy() for E in v)
                for k, v in obj.embed.items()
            },
        )
    if isinstance(obj, _SOL):
        return _SOL(
            z=np.asarray(obj.z),
            SOL_feasibility=_to_host(obj.SOL_feasibility),
            SOL_main=_to_host(obj.SOL_main),
            log=_to_host(obj.log),
            geometry=device_to_native(obj.geometry),
        )
    if isinstance(obj, _PSOL):
        return _PSOL(
            geometry=device_to_native(obj.geometry),
            ts=_to_host(obj.ts),
            u=[np.asarray(u) for u in obj.u],
            sols=[device_to_native(s) for s in obj.sols],
        )
    return _to_host(obj)
