"""Unit tests for experimental/ozmm.py — the error-free-split (Ozaki-scheme)
bf16 matmul engine used by the ND factor on TPU (MGB_ND_MM=ozaki).

The contract: matmul(A, B) matches the f64 product to ~1e-15 relative
to the magnitude bound |A|@|B|, across wide dynamic range, badly scaled
rows/columns, and contractions long enough to trigger k-chunking.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from multigridbarrier_tpu.experimental import ozmm


def _relerr(out, A, B):
    ref = A @ B
    bound = np.abs(A) @ np.abs(B) + 1e-300
    return np.max(np.abs(np.asarray(out) - ref) / bound)


@pytest.mark.parametrize(
    "shape",
    [(4, 64, 64, 48), (2, 128, 96, 33), (1, 7, 5, 3)],
)
def test_ozmm_matches_f64(shape):
    b, m, k, n = shape
    rng = np.random.default_rng(shape[1])
    A = rng.standard_normal((b, m, k)) * np.exp(rng.uniform(-8, 8, (b, m, 1)))
    B = rng.standard_normal((b, k, n)) * np.exp(rng.uniform(-8, 8, (b, 1, n)))
    err = _relerr(ozmm.matmul(jnp.asarray(A), jnp.asarray(B)), A, B)
    assert err < 5e-15, err


def test_ozmm_kchunking():
    # k > _KMAX exercises the chunked contraction path
    k = ozmm._KMAX + 37
    rng = np.random.default_rng(7)
    A = rng.standard_normal((1, 8, k))
    B = rng.standard_normal((1, k, 8))
    err = _relerr(ozmm.matmul(jnp.asarray(A), jnp.asarray(B)), A, B)
    assert err < 5e-15, err


def test_ozmm_zero_rows_and_dynamic_range():
    rng = np.random.default_rng(3)
    A = rng.standard_normal((2, 16, 16))
    A[:, ::3] = 0.0  # all-zero rows hit the scale=1 guard
    A[0] *= 1e150  # extreme magnitudes must not overflow the split
    B = rng.standard_normal((2, 16, 16)) * 1e-140
    err = _relerr(ozmm.matmul(jnp.asarray(A), jnp.asarray(B)), A, B)
    assert err < 5e-15, err


def test_blocked_factor_kernels_with_ozaki_mm():
    """The composition the TPU factor runs: panel-blocked Cholesky and
    block-doubling triangular inverse with every matmul routed through
    the ozaki engine must match the native-f64 kernels to ~1e-12."""
    from multigridbarrier_tpu.solver.ndsolve import (
        _chol_blocked,
        _tri_inv_blocked,
    )

    rng = np.random.default_rng(17)
    for n_d, s in [(3, 40), (1, 130)]:
        B = rng.standard_normal((n_d, s, s))
        A = B @ np.swapaxes(B, -1, -2) + s * np.eye(s)[None]
        L_ref = np.linalg.cholesky(A)
        L_b = np.asarray(_chol_blocked(jnp.asarray(A), mm=ozmm.matmul))
        rel = np.linalg.norm(L_b - L_ref, axis=(1, 2)) / np.linalg.norm(
            L_ref, axis=(1, 2)
        )
        assert rel.max() < 1e-12, (s, rel.max())
        Li = np.asarray(
            _tri_inv_blocked(jnp.asarray(L_ref), mm=ozmm.matmul)
        )
        err = np.linalg.norm(Li @ L_ref - np.eye(s)[None], axis=(1, 2))
        assert err.max() < 1e-10, (s, err.max())


def test_ozmm_nt_form():
    rng = np.random.default_rng(11)
    A = rng.standard_normal((3, 24, 40))
    B = rng.standard_normal((3, 24, 40))
    ref = A @ np.swapaxes(B, -1, -2)
    out = np.asarray(ozmm.matmul_nt(jnp.asarray(A), jnp.asarray(B)))
    bound = np.abs(A) @ np.abs(np.swapaxes(B, -1, -2)) + 1e-300
    assert np.max(np.abs(out - ref) / bound) < 5e-15
