"""Structural op parity tests (reference distributed linear-algebra
conformance suite, SURVEY.md §4 layer 2: hcat/blockdiag/spdiagm/transpose/
column extraction vs plain scipy)."""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from multigridbarrier_tpu.runtime import (
    all_isfinite,
    blockdiag,
    ell_from_scipy,
    getcol,
    hcat,
    map_rows,
    map_rows_gpu,
    spdiagm,
    transpose,
    vcat,
    zeros_like_operator,
)


def _rand(m, n, seed, density=0.3):
    rng = np.random.default_rng(seed)
    A = sp.random(m, n, density=density, random_state=rng, format="csr")
    return A


def test_hcat_vcat():
    A, B = _rand(6, 4, 0), _rand(6, 3, 1)
    ea, eb = ell_from_scipy(A), ell_from_scipy(B)
    assert abs(hcat(ea, eb).to_scipy() - sp.hstack([A, B])).max() < 1e-14
    C = _rand(5, 4, 2)
    assert (
        abs(vcat(ea, ell_from_scipy(C)).to_scipy() - sp.vstack([A, C])).max()
        < 1e-14
    )


def test_blockdiag():
    A, B = _rand(4, 3, 3), _rand(2, 5, 4)
    out = blockdiag(ell_from_scipy(A), ell_from_scipy(B))
    assert abs(out.to_scipy() - sp.block_diag([A, B])).max() < 1e-14


def test_spdiagm_matvec():
    v = np.arange(1.0, 6.0)
    D = spdiagm(jnp.asarray(v))
    x = np.linspace(0, 1, 5)
    np.testing.assert_allclose(np.asarray(D.matvec(jnp.asarray(x))), v * x)


def test_transpose():
    A = _rand(7, 4, 5)
    out = transpose(ell_from_scipy(A))
    assert abs(out.to_scipy() - A.T).max() < 1e-14


def test_getcol():
    A = _rand(6, 5, 6)
    e = ell_from_scipy(A)
    for j in range(5):
        np.testing.assert_allclose(
            np.asarray(getcol(e, j)), A[:, j].toarray().ravel(), atol=1e-14
        )


def test_all_isfinite():
    assert bool(all_isfinite(jnp.ones(3), jnp.zeros(2)))
    assert not bool(all_isfinite(jnp.array([1.0, np.nan])))
    assert not bool(all_isfinite(jnp.ones(3), jnp.array([np.inf])))


def test_zeros_like_operator():
    proto = ell_from_scipy(_rand(3, 3, 7))
    z = zeros_like_operator(proto, 4, 6)
    assert z.shape == (4, 6)
    assert abs(z.to_scipy()).max() == 0.0


def test_map_rows_shapes():
    # reference output-kind contract: scalar -> vector, row -> matrix
    # (test/test_helpers.jl:123-152)
    x = jnp.arange(12.0).reshape(4, 3)
    out = map_rows(lambda r: jnp.sum(r), x)
    assert out.shape == (4,)
    out2 = map_rows(lambda r: r * 2.0, x)
    assert out2.shape == (4, 3)
    assert map_rows_gpu is map_rows
