"""map_rows — the SPMD row-map primitive.

The reference's `map_rows(f, A...)` (pipeline dissected in
tools/profile_map_rows_steps.jl:55-150) aligns partitions, runs a Julia
comprehension over local row views, then MPI.Allgathers a 4-int type
descriptor so that empty ranks learn the output shape.  Under jit all of
that collapses to `jax.vmap`: shapes are static, the compute loop fuses
into surrounding ops, and sharding of the row axis propagates through
automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def map_rows(f, *arrays):
    """Apply `f` to corresponding rows of the given arrays.

    Each array has the same leading dimension n; 1-D arrays contribute a
    scalar per row, 2-D arrays a row vector (matching the reference's
    `_local_rows` scalar/view semantics, tools/profile_local_rows.jl:56-62).
    Returns an array of shape (n, *f_output_shape).
    """
    arrays = [jnp.asarray(a) for a in arrays]
    return jax.vmap(f)(*arrays)
