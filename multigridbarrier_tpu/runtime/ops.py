"""Structural sparse-matrix operations on Ell (HPCSparseArrays op parity).

The reference runtime exposes hcat / blockdiag / spdiagm / transpose /
column extraction / global reductions as MPI-collective operations
(SURVEY.md §2.2).  Here hcat/vcat/blockdiag/spdiagm are pure device ops —
static-shape ELL concatenations (padding entries have vals == 0, so a
shifted padding column index stays harmless in matvec AND rmatvec) — and
the reductions are one-liner jnp ops that lower to XLA collectives when
operands are sharded; no plans, no hashes.  `transpose` re-buckets by
column, which needs one host sync for the new static row width.

These exist for API completeness and for building custom problem
operators; the solver's hot path never materializes global sparse
matrices (runtime/elements.py).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from .ell import Ell, ell_from_scipy


def _pad_width(cols: jnp.ndarray, vals: jnp.ndarray, W: int):
    pad = W - cols.shape[1]
    if pad == 0:
        return cols, vals
    return (
        jnp.pad(cols, ((0, 0), (0, pad))),
        jnp.pad(vals, ((0, 0), (0, pad))),
    )


def hcat(*mats: Ell) -> Ell:
    """Horizontal concatenation [A B ...] (reference: hcat of sparse blocks
    for wide operators [D 0], test/test_d0_construction.jl:40-67).  Device
    op: per-row ELL entries concatenate along the width axis with column
    offsets; padding entries (vals == 0) contribute nothing wherever their
    shifted column lands."""
    nrows = mats[0].nrows
    if any(m.nrows != nrows for m in mats):
        raise ValueError("hcat: row counts differ")
    off = 0
    cols_parts, vals_parts = [], []
    for m in mats:
        cols_parts.append(m.cols + jnp.asarray(off, dtype=m.cols.dtype))
        vals_parts.append(m.vals)
        off += m.ncols
    return Ell(
        cols=jnp.concatenate(cols_parts, axis=1),
        vals=jnp.concatenate(vals_parts, axis=1),
        shape=(nrows, off),
    )


def vcat(*mats: Ell) -> Ell:
    """Vertical concatenation [A; B; ...] (device op: row-wise ELL concat,
    widths padded to the max)."""
    ncols = mats[0].ncols
    if any(m.ncols != ncols for m in mats):
        raise ValueError("vcat: column counts differ")
    W = max(m.width for m in mats)
    parts = [_pad_width(m.cols, m.vals, W) for m in mats]
    return Ell(
        cols=jnp.concatenate([p[0] for p in parts], axis=0),
        vals=jnp.concatenate([p[1] for p in parts], axis=0),
        shape=(sum(m.nrows for m in mats), ncols),
    )


def blockdiag(*mats: Ell) -> Ell:
    """Block-diagonal concatenation (reference: amgb_blockdiag for
    multi-field restrictions [R 0; 0 R], src/MultiGridBarrierMPI.jl:149).
    Device op: row-wise concat with per-block column offsets."""
    W = max(m.width for m in mats)
    off = 0
    cols_parts, vals_parts = [], []
    for m in mats:
        c, v = _pad_width(m.cols, m.vals, W)
        cols_parts.append(c + jnp.asarray(off, dtype=c.dtype))
        vals_parts.append(v)
        off += m.ncols
    return Ell(
        cols=jnp.concatenate(cols_parts, axis=0),
        vals=jnp.concatenate(vals_parts, axis=0),
        shape=(sum(m.nrows for m in mats), off),
    )


def spdiagm(v) -> Ell:
    """Diagonal sparse matrix from a vector (reference: amgb_diag /
    spdiagm(n, n, 0 => v), src/MultiGridBarrierMPI.jl:135-147)."""
    v = jnp.asarray(v)
    n = v.shape[0]
    cols = jnp.arange(n, dtype=jnp.int32)[:, None]
    return Ell(cols=cols, vals=v[:, None], shape=(n, n))


def transpose(m: Ell) -> Ell:
    """Materialized transpose (reference: materialize_transpose /
    HPCSparseMatrix(transpose(A)), test/test_transpose_only.jl)."""
    return ell_from_scipy(
        m.to_scipy().T.tocsr(), dtype=np.asarray(m.vals).dtype
    )


def getcol(m: Ell, j: int) -> jnp.ndarray:
    """Extract column j as a dense vector (reference: M[:, j] -> HPCVector,
    test/test_column_extract.jl:49-57)."""
    mask = (m.cols == j) & (m.vals != 0)
    return jnp.sum(jnp.where(mask, m.vals, 0.0), axis=1)


def all_isfinite(*arrays) -> jnp.ndarray:
    """Global finiteness check (reference: amgb_all_isfinite with an MPI
    Allreduce, src/MultiGridBarrierMPI.jl:119-133; under jit + GSPMD the
    reduction over sharded operands lowers to a psum)."""
    out = jnp.asarray(True)
    for a in arrays:
        out = out & jnp.all(jnp.isfinite(jnp.asarray(a)))
    return out


def zeros_like_operator(proto: Ell, m: int, n: int) -> Ell:
    """Empty sparse matrix with a given shape (reference: amgb_zeros,
    src/MultiGridBarrierMPI.jl:64-117)."""
    cols = jnp.zeros((m, 1), dtype=proto.cols.dtype)
    vals = jnp.zeros((m, 1), dtype=proto.vals.dtype)
    return Ell(cols=cols, vals=vals, shape=(m, n))


def clear_caches(geometry=None) -> None:
    """Drop compiled solver kernels (reference: clear_plan_cache!,
    tools/benchmark_cpu_vs_gpu.jl:44-50 — there it resets communication
    plans; here it resets the geometry-attached jit context cache)."""
    if geometry is not None and hasattr(geometry, "_ctx_cache"):
        object.__setattr__(geometry, "_ctx_cache", {})
