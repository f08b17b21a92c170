"""Near-f64 batched matmul from EXACT bf16 MXU passes (Ozaki scheme).

TPUs have no float64 hardware: XLA emulates f64 arithmetic in software,
and the ND multifrontal factor (solver/ndsolve.py) — whose flops are
batched dense matmuls — pays that emulation on every Schur update.  The
reference sidesteps the issue by running MUMPS on the host CPU
(/root/reference/src/MultiGridBarrierMPI.jl:233-266 routes every Newton
system through a host direct solver); a TPU-native design wants those
flops on the MXU instead.

This module implements the error-free-splitting approach (Ozaki et al.,
"Error-free transformations of matrix multiplication", 2012; the same
scheme used for DGEMM on GPU tensor cores): each f64 operand is split
into P signed base-2^d digit matrices whose entries are small integers,
every digit-pair product is computed by a bf16 matmul with f32
accumulation — EXACTLY, because products of integers <= 2^(d-1) summed
over k <= 2^(24-2(d-1)) terms stay inside the f32 integer range — and
the exact per-pair integer results are combined in f64 with power-of-2
scales.  The only approximation is the truncation of the digit
expansion itself: with P=8, d=8 the operands are quantized at 2^-57
relative to their row/column maxima and dropped cross terms are below
2^-64, i.e. the result carries full f64-rounding quality while every
cubic flop runs at MXU bf16 rate.

Cost model: P(P+1)/2 = 36 bf16 passes + O(P^2) f64 elementwise combine.
Worth it exactly when emulated-f64 matmul is >> 36x slower than bf16 —
measured by tools/probe_nd_tpu_cost.py.  RETIRED from the ND factor in
round 5 (root-fronts-only config measured 583 vs 608ms at fem2d L=7 on
the v5e — matmuls are latency-bound there; the pair-f32 base-kernel
engine supersedes it); kept as the documented negative result.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# digit width: products of two signed d-bit digits are <= 2^(2d-2), so a
# k-term f32 accumulation is exact while k <= 2^(24-(2d-2)).  d=8 ->
# k_max = 1024 per matmul chunk; larger contractions are chunked.
_D = 8
_KMAX = 1 << (24 - (2 * _D - 2))


def _split(A, nslice: int, axis: int):
    """Error-free digit split of f64 `A` along scaling `axis`.

    Returns (digits, scale): `digits` is a list of `nslice` bf16 arrays
    of A's shape holding signed integers |D| <= 2^(d-1), and `scale` a
    f64 array (A's shape with `axis` reduced to 1) such that

        A = scale * sum_p digits[p] * 2^(-(p+1)*d)  +  O(2^(-nslice*d))

    exactly (the digits are exact integers; only the tail is dropped).
    Rows/columns that are all-zero get scale 1 and zero digits.
    """
    amax = jnp.max(jnp.abs(A), axis=axis, keepdims=True)
    # scale = 2^(floor(log2(amax)) + 2) so |A/scale| <= 1/2: the first
    # rounded digit then obeys the same 2^(d-1) bound as the rest.
    # NOTE: jnp.frexp lowers to an s64 bitcast-convert that XLA:TPU's
    # x64-rewriting pass cannot handle (HTTP-500 from the remote compile
    # service), so the exponent is extracted arithmetically.  log2 may
    # round either way at exact powers of two; the subsequent fix-up
    # comparison is exact (division by a power of two), making the
    # |A/scale| <= 1/2 invariant independent of log2 rounding.
    e = jnp.floor(jnp.log2(jnp.where(amax > 0, amax, 1.0)))
    scale = jnp.exp2(e + 2.0)
    scale = jnp.where(amax / scale > 0.5, 2.0 * scale, scale)
    scale = jnp.where(amax > 0, scale, 1.0)
    r = A / scale
    digits = []
    for _ in range(nslice):
        r = r * (1 << _D)
        dgt = jnp.round(r)
        digits.append(dgt.astype(jnp.bfloat16))
        r = r - dgt
    return digits, scale


def _pair_matmul(Da, Db):
    """Exact integer product of one digit pair: bf16 x bf16 -> f32."""
    nb = Da.ndim - 2
    dnums = (((Da.ndim - 1,), (Db.ndim - 2,)), (tuple(range(nb)), tuple(range(nb))))
    return jax.lax.dot_general(
        Da, Db, dnums, preferred_element_type=jnp.float32
    )


def matmul(A, B, nslice: int = 8):
    """Batched near-f64 matmul (..., m, k) @ (..., k, n) via exact bf16
    MXU passes.  Result error ~2^(-nslice*d) relative to the row/column
    magnitude scales — full f64-rounding quality at the default
    nslice=8 (57 retained bits)."""
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    k = A.shape[-1]
    if k > _KMAX:
        # chunk the contraction so each bf16 pass stays exact; the
        # chunk results are themselves near-exact f64 and sum stably
        nch = -(-k // _KMAX)
        out = None
        for c in range(nch):
            lo, hi = c * _KMAX, min((c + 1) * _KMAX, k)
            part = matmul(A[..., :, lo:hi], B[..., lo:hi, :], nslice)
            out = part if out is None else out + part
        return out
    da, sa = _split(A, nslice, axis=-1)   # row scales (..., m, 1)
    db, sb = _split(B, nslice, axis=-2)   # col scales (..., 1, n)
    acc = None
    # pairs with p+q >= nslice sit below the quantization floor already
    # paid by the split — drop them (keeps P(P+1)/2 of P^2 passes)
    for tot in range(nslice):
        # digit-pair products at the same level share a scale; their f32
        # integer sum is exact while every partial sum fits in 2^24
        f32_exact = (tot + 1) * k * (1 << (2 * _D - 2)) <= (1 << 24)
        lvl64 = None
        lvl32 = None
        for p in range(tot + 1):
            pr = _pair_matmul(da[p], db[tot - p])
            if f32_exact:
                lvl32 = pr if lvl32 is None else lvl32 + pr
            else:
                pr64 = pr.astype(A.dtype)
                lvl64 = pr64 if lvl64 is None else lvl64 + pr64
        lvl = lvl32.astype(A.dtype) if lvl32 is not None else lvl64
        term = lvl * jnp.exp2(jnp.asarray(-(tot + 2) * _D, A.dtype))
        acc = term if acc is None else acc + term
    return acc * sa * sb


def matmul_nt(A, B, nslice: int = 8):
    """A @ B^T (syrk-like form used by the ND Schur update)."""
    return matmul(A, jnp.swapaxes(B, -1, -2), nslice)
