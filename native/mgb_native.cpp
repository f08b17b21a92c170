// mgb_native — host-side geometry kernels for multigridbarrier_tpu.
//
// The reference's geometry construction is pure Julia (replicated on every
// MPI rank, /root/reference/src/MultiGridBarrierMPI.jl:224-338); its speed
// relies on Julia's compiled loops.  The Python builders here would pay
// interpreter cost per element, so the per-element extraction/packing
// loops live in C++ (ctypes ABI, no pybind11 dependency):
//
//   * csr_to_ell:          pad a CSR matrix to fixed row width (runtime/ell.py)
//   * csr_to_level_basis:  extract element-local subspace blocks
//                          (runtime/elements.py: idx + rloc tensors)
//   * tri_edge_tables:     triangle-mesh edge numbering + boundary flags
//                          (fem/fem2d.py _Mesh)
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <utility>
#include <vector>

extern "C" {

// Pad CSR (indptr/indices/data) to ELL (cols/vals) with row width K.
// cols/vals must be zero-initialized by the caller, shapes (nrows, K).
// Returns 0 on success, -1 if any row exceeds K.
int csr_to_ell(int64_t nrows, const int64_t* indptr, const int32_t* indices,
               const double* data, int64_t K, int32_t* cols, double* vals) {
  for (int64_t r = 0; r < nrows; ++r) {
    int64_t lo = indptr[r], hi = indptr[r + 1];
    if (hi - lo > K) return -1;
    for (int64_t k = lo; k < hi; ++k) {
      cols[r * K + (k - lo)] = indices[k];
      vals[r * K + (k - lo)] = data[k];
    }
  }
  return 0;
}

// Max number of distinct columns referenced by any element's nq rows.
int64_t element_max_cols(int64_t nelem, int64_t nq, const int64_t* indptr,
                         const int32_t* indices) {
  int64_t nl = 0;
  std::vector<int32_t> cols;
  for (int64_t e = 0; e < nelem; ++e) {
    cols.clear();
    int64_t lo = indptr[e * nq], hi = indptr[(e + 1) * nq];
    cols.assign(indices + lo, indices + hi);
    std::sort(cols.begin(), cols.end());
    cols.erase(std::unique(cols.begin(), cols.end()), cols.end());
    if ((int64_t)cols.size() > nl) nl = (int64_t)cols.size();
  }
  return nl < 1 ? 1 : nl;
}

// Extract element-local basis blocks from CSR: for each element (nq
// consecutive rows), idx (nelem, nl) holds the distinct global columns
// (padded with `m`), rloc (nelem, nq, nl) the per-row values.
// idx must be pre-filled with m, rloc zero-initialized.
// Returns 0 on success, -1 if an element exceeds nl columns.
int csr_to_level_basis(int64_t nelem, int64_t nq, int64_t m,
                       const int64_t* indptr, const int32_t* indices,
                       const double* data, int64_t nl, int32_t* idx,
                       double* rloc) {
  std::vector<int32_t> cols;
  std::vector<int64_t> pos(m + 1);
  for (int64_t e = 0; e < nelem; ++e) {
    cols.clear();
    int64_t lo = indptr[e * nq], hi = indptr[(e + 1) * nq];
    cols.assign(indices + lo, indices + hi);
    std::sort(cols.begin(), cols.end());
    cols.erase(std::unique(cols.begin(), cols.end()), cols.end());
    if ((int64_t)cols.size() > nl) return -1;
    for (size_t a = 0; a < cols.size(); ++a) {
      idx[e * nl + (int64_t)a] = cols[a];
      pos[cols[a]] = (int64_t)a;
    }
    for (int64_t q = 0; q < nq; ++q) {
      int64_t r = e * nq + q;
      for (int64_t k = indptr[r]; k < indptr[r + 1]; ++k) {
        rloc[(e * nq + q) * nl + pos[indices[k]]] += data[k];
      }
    }
  }
  return 0;
}

// Triangle-mesh edge tables: for tris (nt, 3) vertex ids, emit
//   tri_edges (nt, 3): edge id per local edge (01, 12, 20)
//   edge_pairs (ne, 2): sorted vertex pair per edge (ne returned)
//   edge_count (ne,):   #triangles sharing each edge (1 = boundary)
// Caller passes capacity ne_cap = 3*nt for edge arrays.
int64_t tri_edge_tables(int64_t nt, const int64_t* tris, int64_t* tri_edges,
                        int64_t* edge_pairs, int32_t* edge_count) {
  std::map<std::pair<int64_t, int64_t>, int64_t> ids;
  int64_t ne = 0;
  for (int64_t t = 0; t < nt; ++t) {
    const int64_t v[3] = {tris[t * 3], tris[t * 3 + 1], tris[t * 3 + 2]};
    const int64_t pairs[3][2] = {{v[0], v[1]}, {v[1], v[2]}, {v[2], v[0]}};
    for (int e = 0; e < 3; ++e) {
      int64_t a = pairs[e][0], b = pairs[e][1];
      if (a > b) std::swap(a, b);
      auto key = std::make_pair(a, b);
      auto it = ids.find(key);
      int64_t id;
      if (it == ids.end()) {
        id = ne++;
        ids.emplace(key, id);
        edge_pairs[id * 2] = a;
        edge_pairs[id * 2 + 1] = b;
        edge_count[id] = 0;
      } else {
        id = it->second;
      }
      tri_edges[t * 3 + e] = id;
      edge_count[id] += 1;
    }
  }
  return ne;
}

}  // extern "C"
