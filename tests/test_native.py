"""Native C++ geometry kernels: availability + differential equivalence
with the pure-Python fallbacks (the reference's native substrate is binary
dependencies, SURVEY.md §2.4; ours is native/mgb_native.cpp)."""

import subprocess
import sys

import numpy as np
import pytest
import scipy.sparse as sp

from multigridbarrier_tpu.runtime import native, ell_from_scipy, level_basis_from_csr


def test_native_builds():
    assert native.available(), "native library failed to build/load"


def _random_csr(rng, nelem=17, nq=5, m=33, per_row=4):
    rows, cols, vals = [], [], []
    for e in range(nelem):
        ecols = rng.permutation(m)[: per_row + 2]
        for q in range(nq):
            sel = rng.permutation(ecols)[:per_row]
            rows.extend([e * nq + q] * len(sel))
            cols.extend(sel.tolist())
            vals.extend(rng.standard_normal(len(sel)).tolist())
    return sp.csr_matrix(
        (vals, (rows, cols)), shape=(nelem * nq, m)
    )


def test_csr_to_ell_matches_python():
    rng = np.random.default_rng(0)
    A = _random_csr(rng)
    counts = np.diff(A.indptr)
    K = int(counts.max())
    res = native.csr_to_ell(A.indptr, A.indices, A.data, A.shape[0], K)
    assert res is not None
    cols_n, vals_n = res
    dense_n = np.zeros(A.shape)
    for r in range(A.shape[0]):
        for k in range(K):
            dense_n[r, cols_n[r, k]] += vals_n[r, k]
    np.testing.assert_allclose(dense_n, A.toarray(), atol=1e-14)


def test_level_basis_native_vs_python(monkeypatch):
    rng = np.random.default_rng(1)
    A = _random_csr(rng)
    lb_native = level_basis_from_csr(A, nq=5)
    # force the fallback
    monkeypatch.setattr(native, "csr_to_level_basis", lambda *a, **k: None)
    lb_py = level_basis_from_csr(A, nq=5)
    assert (
        abs(lb_native.to_scipy() - lb_py.to_scipy()).max() < 1e-14
    )
    assert lb_native.nl == lb_py.nl


def test_tri_edge_tables_vs_python(monkeypatch):
    from multigridbarrier_tpu.fem.fem2d import _Mesh, _default_coarse

    m_native = _default_coarse().refined().refined()
    monkeypatch.setattr(native, "tri_edge_tables", lambda *a: None)
    m_py = _Mesh(m_native.verts, m_native.tris)
    assert m_native.n_edges == m_py.n_edges
    # both implementations number edges in first-seen order -> identical
    np.testing.assert_array_equal(m_native.tri_edges, m_py.tri_edges)
    np.testing.assert_array_equal(m_native.edge_pairs, m_py.edge_pairs)
    np.testing.assert_array_equal(
        np.sort(m_native.boundary_edges), np.sort(m_py.boundary_edges)
    )


def test_geometry_native_vs_python_equal():
    # full builder differential: identical Geometry content either way
    import multigridbarrier_tpu as mgb

    g1 = mgb.fem2d(L=3)
    code = (
        "import os; os.environ['MGB_NO_NATIVE']='1';\n"
        "import numpy as np, multigridbarrier_tpu as mgb\n"
        "g = mgb.fem2d(L=3)\n"
        "np.save('/tmp/mgb_py_x.npy', np.asarray(g.x))\n"
        "R = g.subspaces['dirichlet'][-1].to_scipy()\n"
        "import scipy.sparse as sp; sp.save_npz('/tmp/mgb_py_R.npz', R)\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, timeout=300)
    x_py = np.load("/tmp/mgb_py_x.npy")
    R_py = sp.load_npz("/tmp/mgb_py_R.npz")
    np.testing.assert_array_equal(np.asarray(g1.x), x_py)
    assert abs(g1.subspaces["dirichlet"][-1].to_scipy() - R_py).max() < 1e-14
