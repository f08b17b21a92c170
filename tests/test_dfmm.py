"""Accuracy pins for the pair-f32 (double-float) kernels
(experimental/dfmm.py): the format must deliver ~2^-45 or better
relative accuracy — far beyond f32's 2^-24, close enough to f64 that a
df factor can serve as a certified-PCG preconditioner deep into the
barrier endgame (round-4 verdict item 1)."""

import numpy as np
import jax.numpy as jnp

from multigridbarrier_tpu.experimental import dfmm

EPS_DF = 2.0 ** -44  # sloppy pair arithmetic keeps ~44-48 bits


def _rand_df(rng, shape, scale=1.0):
    x = rng.standard_normal(shape) * scale
    return x, dfmm.from_f64(jnp.asarray(x))


def test_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1000) * np.exp(rng.uniform(-30, 30, 1000))
    d = dfmm.from_f64(jnp.asarray(x))
    back = np.asarray(dfmm.to_f64(d))
    # f64 -> pair keeps 48+ bits; pair -> f64 -> pair is bit-stable
    assert np.max(np.abs(back - x) / np.abs(x)) < 2.0 ** -48
    d2 = dfmm.from_f64(dfmm.to_f64(d))
    assert np.array_equal(np.asarray(d2[0]), np.asarray(d[0]))
    assert np.array_equal(np.asarray(d2[1]), np.asarray(d[1]))


def test_add_mul_accuracy():
    rng = np.random.default_rng(1)
    x, dx = _rand_df(rng, 4096)
    y, dy = _rand_df(rng, 4096)
    s = np.asarray(dfmm.to_f64(dfmm.add(dx, dy)))
    p = np.asarray(dfmm.to_f64(dfmm.mul(dx, dy)))
    # sloppy-add error is bounded relative to the OPERANDS (cancellation
    # can inflate it relative to a near-zero result — standard df caveat)
    assert np.max(np.abs(s - (x + y)) / (np.abs(x) + np.abs(y))) < EPS_DF
    assert np.max(np.abs(p - x * y) / np.maximum(np.abs(x * y), 1e-30)) < EPS_DF


def test_recip_rsqrt_accuracy():
    rng = np.random.default_rng(2)
    x = np.exp(rng.uniform(-20, 20, 4096))
    dx = dfmm.from_f64(jnp.asarray(x))
    r = np.asarray(dfmm.to_f64(dfmm.recip(dx)))
    q = np.asarray(dfmm.to_f64(dfmm.rsqrt(dx)))
    assert np.max(np.abs(r * x - 1.0)) < EPS_DF
    assert np.max(np.abs(q * np.sqrt(x) - 1.0)) < EPS_DF


def test_matmul_through_f64_dot():
    rng = np.random.default_rng(3)
    A, dA = _rand_df(rng, (3, 24, 40))
    B, dB = _rand_df(rng, (3, 40, 16))
    C = np.asarray(dfmm.to_f64(dfmm.matmul(dA, dB)))
    ref = A @ B
    bound = np.abs(A) @ np.abs(B) + 1e-30
    assert np.max(np.abs(C - ref) / bound) < 1e-15  # f64-dot quality


def test_chol_unrolled_matches_f64():
    rng = np.random.default_rng(4)
    for n_d, n in [(8, 8), (4, 16), (2, 32)]:
        B = rng.standard_normal((n_d, n, n))
        A = B @ np.swapaxes(B, -1, -2) + n * np.eye(n)[None]
        L_ref = np.linalg.cholesky(A)
        L = np.asarray(
            dfmm.to_f64(dfmm.chol_unrolled(dfmm.from_f64(jnp.asarray(A)), n))
        )
        rel = np.max(
            np.linalg.norm(L - L_ref, axis=(1, 2))
            / np.linalg.norm(L_ref, axis=(1, 2))
        )
        assert rel < EPS_DF * n, (n, rel)


def test_chol_unrolled_ill_conditioned():
    """The regime that killed direct-f32 (round-2): equilibrated
    barrier blocks with min eig ~ 1e-9 << eps32.  Pair-f32 must factor
    them to a residual far below eps32."""
    rng = np.random.default_rng(5)
    n = 16
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.logspace(0, -9, n)
    A = (Q * eigs) @ Q.T
    A = 0.5 * (A + A.T)
    L = np.asarray(
        dfmm.to_f64(dfmm.chol_unrolled(dfmm.from_f64(jnp.asarray(A[None])), n))
    )[0]
    res = np.linalg.norm(L @ L.T - A) / np.linalg.norm(A)
    assert res < 1e-11, res  # f32 would give ~1e-7 at best


def test_chol_unrolled_negative_pivot_nans():
    A = -np.eye(4)[None]
    L = np.asarray(
        dfmm.to_f64(dfmm.chol_unrolled(dfmm.from_f64(jnp.asarray(A)), 4))
    )
    assert not np.all(np.isfinite(L))


def test_looped_kernels_match_unrolled():
    """fori_loop forms (O(1) program size — the shapes the ND factor
    embeds) must match the unrolled forms to df accuracy."""
    rng = np.random.default_rng(9)
    n_d, n = 4, 32
    B = rng.standard_normal((n_d, n, n))
    A = B @ np.swapaxes(B, -1, -2) + n * np.eye(n)[None]
    dA = dfmm.from_f64(jnp.asarray(A))
    L_ref = np.linalg.cholesky(A)
    Ll = np.asarray(dfmm.to_f64(dfmm.chol_looped(dA, n)))
    rel = np.max(
        np.linalg.norm(Ll - L_ref, axis=(1, 2))
        / np.linalg.norm(L_ref, axis=(1, 2))
    )
    assert rel < EPS_DF * n, rel
    dL = dfmm.from_f64(jnp.asarray(L_ref))
    Xl = np.asarray(dfmm.to_f64(dfmm.tri_lower_inv_looped(dL, n)))
    err = np.max(np.linalg.norm(Xl @ L_ref - np.eye(n)[None], axis=(1, 2)))
    assert err < EPS_DF * n * 4, err


def test_looped_chol_negative_pivot_nans():
    A = -np.eye(8)[None]
    L = np.asarray(
        dfmm.to_f64(dfmm.chol_looped(dfmm.from_f64(jnp.asarray(A)), 8))
    )
    assert not np.all(np.isfinite(L))


def test_tri_inv_unrolled_matches_f64():
    rng = np.random.default_rng(6)
    for n_d, n in [(4, 8), (2, 32)]:
        B = rng.standard_normal((n_d, n, n))
        A = B @ np.swapaxes(B, -1, -2) + n * np.eye(n)[None]
        L = np.linalg.cholesky(A)
        X = np.asarray(
            dfmm.to_f64(
                dfmm.tri_lower_inv_unrolled(dfmm.from_f64(jnp.asarray(L)), n)
            )
        )
        err = np.max(
            np.linalg.norm(X @ L - np.eye(n)[None], axis=(1, 2))
        )
        assert err < EPS_DF * n * 4, (n, err)
