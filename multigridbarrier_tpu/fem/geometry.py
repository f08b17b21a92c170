"""Geometry — the multigrid FEM hierarchy container.

Mirrors the reference Geometry{T,X,W,M,D} contract
(/root/reference/docs/src/api.md:79-88):

- ``x``: (n, dim) quadrature-node coordinates
- ``w``: (n,) quadrature weights
- ``operators``: dict of differential operators on the broken space
  ('id', 'dx'[, 'dy'][, 'dz']), each an n x n block-diagonal operator
- ``subspaces``: dict name -> per-level inclusion matrices R_l (n x m_l)
  of the conforming FEM subspaces into the broken space (key 'dirichlet'
  observed in the reference, test/test_amg_structure.jl:32-58; 'full' also
  provided)
- ``refine``/``coarsen``: level-transfer operators between broken spaces of
  consecutive levels

plus two internal extras the TPU design wants:

- ``embed``: per-subspace inter-level embeddings E_l (m_{l+1} x m_l) with
  R_{l+1} @ E_l == R_l (spaces are nested); used for multigrid transfers in
  the Newton linear solver.
- ``discretization``: static metadata (element topology, node tables) used
  for plotting, parabolic restarts and re-discretization.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..backend import Backend
from ..runtime import BlockDiagOp, Ell, LevelBasis


@dataclasses.dataclass(frozen=True)
class Discretization:
    """Static mesh metadata. `payload` holds builder-specific host arrays
    (e.g. triangle vertex tables) consumed by plotting and refinement."""

    name: str  # 'fem1d' | 'fem2d' | 'fem3d'
    dim: int
    L: int
    nelem: int
    nq: int  # quadrature/broken points per element
    payload: dict = dataclasses.field(default_factory=dict, repr=False)


@dataclasses.dataclass
class Geometry:
    discretization: Discretization
    x: jnp.ndarray  # (n, dim)
    w: jnp.ndarray  # (n,)
    operators: Dict[str, BlockDiagOp]
    subspaces: Dict[str, Tuple[Ell, ...]]
    refine: Tuple[Ell, ...]
    coarsen: Tuple[Ell, ...]
    embed: Dict[str, Tuple[Ell, ...]]
    backend: Backend
    # Element-local views of `subspaces` (same matrices, MXU-friendly layout;
    # see runtime/elements.py).  The solver's canonical representation.
    bases: Dict[str, Tuple[LevelBasis, ...]] = dataclasses.field(
        default_factory=dict
    )

    @property
    def n(self) -> int:
        return self.x.shape[0]

    @property
    def dim(self) -> int:
        return self.x.shape[1]

    @property
    def levels(self) -> int:
        return len(self.subspaces["dirichlet"])

    def subspace_dims(self, key: str = "dirichlet") -> Tuple[int, ...]:
        return tuple(R.ncols for R in self.subspaces[key])

    def vertex_indices(self) -> np.ndarray:
        """Flat indices (into rows of ``x``) of broken points that sit at
        element vertices (reference: the `vertex_indices` raw-array hook,
        src/MultiGridBarrierMPI.jl:191-192; used for plotting/analysis).
        fem1d uses interior Gauss points, so no broken point is a vertex."""
        name = self.discretization.name
        nq = self.discretization.nq
        nelem = self.discretization.nelem
        if name == "fem2d":
            local = np.array([0, 1, 2])
        elif name == "fem3d":
            k = self.discretization.payload["k"]
            kp1 = k + 1
            corner = np.array([0, k])
            local = (
                corner[None, None, :]
                + kp1 * corner[None, :, None]
                + kp1 * kp1 * corner[:, None, None]
            ).ravel()
        else:
            return np.empty(0, dtype=np.int64)
        return (np.arange(nelem)[:, None] * nq + local[None, :]).ravel()

    def with_backend(self, backend: Backend) -> "Geometry":
        """Re-home the geometry on a different backend (device mesh and/or
        dtype) — the `to_backend` migration of the reference
        (test/test_utils.jl:134-151)."""
        dt = backend.dtype
        cast_ell = lambda e: e.astype(dt)
        return Geometry(
            discretization=self.discretization,
            x=self.x.astype(dt),
            w=self.w.astype(dt),
            operators={k: op.astype(dt) for k, op in self.operators.items()},
            subspaces={
                k: tuple(cast_ell(R) for R in v) for k, v in self.subspaces.items()
            },
            refine=tuple(cast_ell(R) for R in self.refine),
            coarsen=tuple(cast_ell(R) for R in self.coarsen),
            embed={
                k: tuple(cast_ell(E) for E in v) for k, v in self.embed.items()
            },
            backend=backend,
            bases={
                k: tuple(B.astype(dt) for B in v) for k, v in self.bases.items()
            },
        )
