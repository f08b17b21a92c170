"""Pallas TPU kernels for the element-local hot path.

The Newton step's heaviest contraction is the batched element-Hessian
assembly He = P^T W P (amgb._assemble_He): for every element, two small
matmuls through the (nq*k)-long quadrature axis.  XLA lowers the batched
einsum well, but pads each tiny (12x28)x(28x12) matmul to full MXU tiles;
this kernel packs a block of elements per grid step so the lane dimension
is shared, and fuses the weighting multiply (T = W @ P) with the outer
product (He = P^T T) in VMEM — one HBM read of P per element instead of
two.

float32 only (Mosaic has no f64); the f64 path keeps the XLA einsums.
Enable with backend dtype float32 + MGB_PALLAS=1 (or pass use_pallas=True
to assemble_he).  Correctness is pinned against the XLA einsum in
tests/test_pallas.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_he_kernel(BE, nq, k, C):
    def kernel(p_ref, w_ref, out_ref):
        # p_ref: (BE, nq*k, C)  w_ref: (BE, nq, k*k)  out_ref: (BE, C, C)
        # T[(q,j), c] = sum_l W[q, j*k+l] * P[(q,l), c] — unrolled over the
        # static (j, l) pairs as VPU broadcasts; final P^T T on the MXU.
        def body(e, _):
            P = p_ref[e]  # (nq*k, C)
            W = w_ref[e]  # (nq, k*k)
            P3 = P.reshape(nq, k, C)
            rows = []
            for j in range(k):
                acc = None
                for l in range(k):
                    term = W[:, j * k + l][:, None] * P3[:, l, :]
                    acc = term if acc is None else acc + term
                rows.append(acc)  # (nq, C)
            # interleave back to (nq*k, C) with j fastest: T[q*k+j] = rows[j][q]
            T = jnp.stack(rows, axis=1).reshape(nq * k, C)
            out_ref[e] = jax.lax.dot_general(
                P,
                T,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(0, BE, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("block_e", "interpret"))
def assemble_he_pallas(P, Y2w_e, block_e: int = 32, interpret: bool = False):
    """He = P^T blockdiag(Y2w) P, batched over elements.

    P: (nelem, nq, k, C) f32;  Y2w_e: (nelem, nq, k, k) f32
    -> (nelem, C, C) f32.  nelem must be divisible by block_e (the callers
    pad element counts; fall back to XLA otherwise)."""
    nelem, nq, k, C = P.shape
    be = min(block_e, nelem)
    while nelem % be:
        be -= 1
    grid = (nelem // be,)
    Pm = P.reshape(nelem, nq * k, C)
    Wm = Y2w_e.reshape(nelem, nq, k * k)
    return pl.pallas_call(
        _make_he_kernel(be, nq, k, C),
        out_shape=jax.ShapeDtypeStruct((nelem, C, C), P.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (be, nq * k, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (be, nq, k * k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (be, C, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(Pm, Wm)


def pallas_enabled(dtype) -> bool:
    """Pallas path policy: opt-in, f32 only, TPU backend."""
    if os.environ.get("MGB_PALLAS", "") != "1":
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    return jax.default_backend() == "tpu"
