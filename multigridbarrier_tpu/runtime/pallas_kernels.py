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


def _make_he_kernel(nq, k, C, kk_p):
    def kernel(p_ref, w_ref, out_ref):
        # one element per program:
        # p_ref: (1, k*nq, C) with contiguous per-j row blocks
        # w_ref: (1, nq, kk_p);  out_ref: (1, C, C)
        # He = sum_{j,l} (W[:, j*k+l] * P_j)^T @ P_l, unrolled over the
        # static (j, l) pairs — VPU broadcasts + k^2 small MXU dots.
        P = p_ref[0]  # (k*nq, C)
        W = w_ref[0]  # (nq, k*k)
        acc = jnp.zeros((C, C), dtype=jnp.float32)
        for j in range(k):
            Pj = P[j * nq : (j + 1) * nq, :]
            for l in range(k):
                Pl = P[l * nq : (l + 1) * nq, :]
                wjl = W[:, j * k + l]
                acc = acc + jax.lax.dot_general(
                    Pj * wjl[:, None],
                    Pl,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        out_ref[0] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("block_e", "interpret"))
def assemble_he_pallas(P, Y2w_e, block_e: int = 32, interpret: bool = False):
    """He = P^T blockdiag(Y2w) P, batched over elements.

    P: (nelem, nq, k, C) f32;  Y2w_e: (nelem, nq, k, k) f32
    -> (nelem, C, C) f32.  One element per grid program; any nelem works."""
    nelem, nq, k, C = P.shape
    del block_e  # one element per program (grid-parallel)
    # Mosaic wants (8, 128)-aligned f32 tiles: pad the quadrature axis to a
    # sublane multiple and the coefficient axis to the lane width.  The
    # padded rows/cols are zero, so they contribute nothing to the dots.
    nq_p = -(-nq // 8) * 8
    C_p = -(-C // 128) * 128
    kk_p = -(-(k * k) // 128) * 128
    # contiguous per-j row blocks: (nelem, k, nq, C) -> (nelem, k*nq_p, C_p)
    Pm = jnp.zeros((nelem, k, nq_p, C_p), dtype=P.dtype)
    Pm = Pm.at[:, :, :nq, :C].set(P.transpose(0, 2, 1, 3))
    Pm = Pm.reshape(nelem, k * nq_p, C_p)
    Wm = jnp.zeros((nelem, nq_p, kk_p), dtype=P.dtype)
    Wm = Wm.at[:, :nq, : k * k].set(Y2w_e.reshape(nelem, nq, k * k))
    nq, C_out = nq_p, C
    C = C_p
    out = pl.pallas_call(
        _make_he_kernel(nq, k, C, kk_p),
        out_shape=jax.ShapeDtypeStruct((nelem, C, C), P.dtype),
        grid=(nelem,),
        in_specs=[
            pl.BlockSpec(
                (1, k * nq, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, nq, kk_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, C, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(Pm, Wm)
    return out[:, :C_out, :C_out]


_PROBE_OK = None


def _probe_compiles() -> bool:
    """One-shot compile probe: Mosaic kernels go through the remote
    compile service on the axon tunnel, which has failed independently
    of XLA compiles — a production default must degrade to the XLA
    einsum path instead of taking the solve down."""
    global _PROBE_OK
    if _PROBE_OK is None:
        try:
            P = jnp.zeros((2, 4, 3, 6), jnp.float32)
            W = jnp.zeros((2, 4, 3, 3), jnp.float32)
            jax.block_until_ready(assemble_he_pallas(P, W))
            _PROBE_OK = True
        except Exception as e:  # pragma: no cover - tunnel-dependent
            import sys

            print(
                f"# pallas probe failed ({type(e).__name__}); "
                "falling back to XLA einsum assembly",
                file=sys.stderr,
            )
            _PROBE_OK = False
    return _PROBE_OK


def pallas_enabled(dtype) -> bool:
    """Pallas assembly policy: DEFAULT ON for float32 on a real TPU
    backend (opt out with MGB_PALLAS=0; force with MGB_PALLAS=1), with
    a compile-probe fallback to the XLA einsums.  f64 stays on XLA —
    Mosaic has no f64."""
    env = os.environ.get("MGB_PALLAS", "")
    if env == "0":
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if jax.default_backend() != "tpu":
        return False
    return _probe_compiles() if env != "1" else True
