"""fem3d — 3D hexahedral Q_k FEM hierarchy (reference:
fem3d(T; L, k, K) with Q_k elements, default k=3,
/root/reference/src/MultiGridBarrierMPI.jl:680-687).

Implemented in a later milestone of this round; see fem2d.py for the
pattern (tensor-product Gauss-Lobatto nodes are both the broken points and
the quadrature rule — the SEM collocation design).
"""

from __future__ import annotations

from ..backend import Backend


def fem3d(L: int = 2, k: int = 3, K=None, backend: Backend | None = None):
    raise NotImplementedError(
        "fem3d is scheduled later in this build round; fem1d/fem2d are live"
    )
