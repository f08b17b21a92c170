"""FEM geometry builders (the MultiGridBarrier.jl fem1d/fem2d/fem3d
equivalents, reconstructed from /root/reference/docs/src/api.md:66-88 and
the tests that exercise them)."""

from .geometry import Geometry, Discretization
from .fem1d import fem1d
from .fem2d import fem2d
from .fem3d import fem3d

__all__ = ["Geometry", "Discretization", "fem1d", "fem2d", "fem3d"]
