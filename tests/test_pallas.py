"""Pallas kernel correctness (interpret mode on CPU; compiled on TPU).

Pins the fused element-Hessian kernel against the XLA einsum reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multigridbarrier_tpu.runtime.pallas_kernels import assemble_he_pallas


@pytest.mark.parametrize("nelem,nq,k,C", [(8, 7, 4, 12), (16, 4, 3, 6)])
def test_assemble_he_pallas_matches_einsum(nelem, nq, k, C):
    rng = np.random.default_rng(0)
    P = jnp.asarray(rng.standard_normal((nelem, nq, k, C)), dtype=jnp.float32)
    W = rng.standard_normal((nelem, nq, k, k))
    W = jnp.asarray(W + W.transpose(0, 1, 3, 2), dtype=jnp.float32)

    interpret = jax.default_backend() != "tpu"
    out = assemble_he_pallas(P, W, block_e=4, interpret=interpret)

    T = jnp.einsum("eqjl,eqlc->eqjc", W, P)
    ref = jnp.einsum("eqjc,eqjd->ecd", P, T)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_pallas_policy():
    from multigridbarrier_tpu.runtime.pallas_kernels import pallas_enabled

    # default ON for f32 on a real TPU (with compile-probe fallback);
    # always off for f64 (Mosaic has no f64) and off-TPU backends; this
    # CPU test can only pin the off-TPU and opt-out branches.
    import os

    old = os.environ.pop("MGB_PALLAS", None)
    try:
        assert not pallas_enabled(jnp.float32)  # cpu backend
        os.environ["MGB_PALLAS"] = "1"
        assert not pallas_enabled(jnp.float64)  # f64 unsupported by Mosaic
        assert not pallas_enabled(jnp.float32)  # still cpu backend
        os.environ["MGB_PALLAS"] = "0"
        assert not pallas_enabled(jnp.float32)  # explicit opt-out
    finally:
        if old is None:
            os.environ.pop("MGB_PALLAS", None)
        else:
            os.environ["MGB_PALLAS"] = old
