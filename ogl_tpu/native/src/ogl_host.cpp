// Native host-side runtime for ogl_tpu.
//
// The reference implements its host conversion layer in C++
// (HostMatrix/HostMatrixFreeFunctions.C) and delegates factorisations to
// Ginkgo's native kernels; this library is the equivalent for the TPU
// framework's host side: one-time setup paths that are latency-sensitive
// on production meshes (many millions of cells) — LDU->row-major sparsity
// construction, incomplete factorisations, and AMG aggregation.  The
// device hot path stays JAX/Pallas; Python falls back to NumPy
// implementations when this library is unavailable.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in the image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// LDU -> row-major sorted local sparsity (semantics of
// ogl_tpu.core.ldu.init_local_sparsity; cf. reference
// HostMatrixFreeFunctions.C:105-201).  Arrays sized nnz = 2*nf + n.
// permute indexes the source layout [upper | (lower) | diag].
void ogl_init_local_sparsity(int64_t n, int64_t nf, int symmetric,
                             const int64_t* lower_addr,
                             const int64_t* upper_addr, int32_t* rows,
                             int32_t* cols, int32_t* permute) {
  const int64_t nnz = 2 * nf + n;
  const int64_t after_nbrs = symmetric ? nf : 2 * nf;

  // counting sort by row
  std::vector<int64_t> count(n + 1, 0);
  for (int64_t f = 0; f < nf; ++f) {
    ++count[lower_addr[f] + 1];  // upper entry in row lower_addr[f]
    ++count[upper_addr[f] + 1];  // lower entry in row upper_addr[f]
  }
  for (int64_t r = 0; r < n; ++r) ++count[r + 1];  // diagonal
  for (int64_t r = 0; r < n; ++r) count[r + 1] += count[r];

  std::vector<int64_t> cursor(count.begin(), count.end() - 1);
  // place entries unsorted-within-row first
  for (int64_t f = 0; f < nf; ++f) {
    int64_t p = cursor[lower_addr[f]]++;
    rows[p] = static_cast<int32_t>(lower_addr[f]);
    cols[p] = static_cast<int32_t>(upper_addr[f]);
    permute[p] = static_cast<int32_t>(f);
    p = cursor[upper_addr[f]]++;
    rows[p] = static_cast<int32_t>(upper_addr[f]);
    cols[p] = static_cast<int32_t>(lower_addr[f]);
    permute[p] = static_cast<int32_t>(symmetric ? f : nf + f);
  }
  for (int64_t r = 0; r < n; ++r) {
    int64_t p = cursor[r]++;
    rows[p] = static_cast<int32_t>(r);
    cols[p] = static_cast<int32_t>(r);
    permute[p] = static_cast<int32_t>(after_nbrs + r);
  }
  // sort within each row by column (rows are short: insertion sort)
  for (int64_t r = 0; r < n; ++r) {
    const int64_t s = count[r], e = count[r + 1];
    for (int64_t i = s + 1; i < e; ++i) {
      int32_t c = cols[i], pm = permute[i];
      int64_t j = i - 1;
      while (j >= s && cols[j] > c) {
        cols[j + 1] = cols[j];
        permute[j + 1] = permute[j];
        --j;
      }
      cols[j + 1] = c;
      permute[j + 1] = pm;
    }
  }
  (void)nnz;
}

// ILU(0), IKJ order, on CSR with row-major sorted columns
// (cf. Ginkgo factorization::Ilu used at reference Preconditioner.H:106).
// vals is overwritten with the combined L\U factors (unit-lower implicit).
// Returns 0 on success, -1 on zero pivot.
int ogl_ilu0(int64_t n, const int64_t* indptr, const int32_t* cols,
             double* vals) {
  // position of the diagonal in each row
  std::vector<int64_t> diag_pos(n, -1);
  for (int64_t i = 0; i < n; ++i)
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p)
      if (cols[p] == i) diag_pos[i] = p;

  std::vector<int64_t> colmap(n, -1);
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) colmap[cols[p]] = p;
    for (int64_t kk = indptr[i]; kk < indptr[i + 1]; ++kk) {
      const int32_t k = cols[kk];
      if (k >= i) break;
      const int64_t dk = diag_pos[k];
      if (dk < 0 || vals[dk] == 0.0) return -1;
      const double lik = vals[kk] / vals[dk];
      vals[kk] = lik;
      for (int64_t jj = dk + 1; jj < indptr[k + 1]; ++jj) {
        const int64_t tgt = colmap[cols[jj]];
        if (tgt >= 0) vals[tgt] -= lik * vals[jj];
      }
    }
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) colmap[cols[p]] = -1;
  }
  return 0;
}

// IC(0): A ~= L L^T on the lower pattern of A (cf. Ginkgo
// factorization::Ic).  Input: CSR of the LOWER triangle incl. diagonal
// (row-major sorted).  vals overwritten with L.  Returns 0 / -1.
int ogl_ic0(int64_t n, const int64_t* indptr, const int32_t* cols,
            double* vals) {
  std::vector<int64_t> diag_pos(n, -1);
  std::vector<double> work(n, 0.0);
  for (int64_t i = 0; i < n; ++i) {
    // scatter row i into work
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) work[cols[p]] = vals[p];
    // columns ascend, so when entry (i,j) is processed every work[k] with
    // k < j already holds the finalised L[i,k] (zero where not in pattern)
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      const int32_t j = cols[p];
      if (j < i) {
        double s = 0.0;  // sum_{k<j} L[i,k] * L[j,k] via row j of L
        for (int64_t q = indptr[j]; q < indptr[j + 1]; ++q) {
          const int32_t k = cols[q];
          if (k >= j) break;
          s += work[k] * vals[q];
        }
        const int64_t dj = diag_pos[j];
        if (dj < 0 || vals[dj] == 0.0) return -1;
        const double lij = (work[j] - s) / vals[dj];
        work[j] = lij;
        vals[p] = lij;
      } else if (j == i) {
        double d = work[i];
        for (int64_t q = indptr[i]; q < p; ++q) {
          const double l = vals[q];
          d -= l * l;
        }
        if (d <= 0.0) d = 1e-300;
        vals[p] = std::sqrt(d);
        diag_pos[i] = p;
      }
    }
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) work[cols[p]] = 0.0;
  }
  return 0;
}

// Greedy deterministic pairwise aggregation (semantics of
// ogl_tpu.precond.amg.pgm_aggregate; cf. Ginkgo amgx_pgm at reference
// Preconditioner.H:286).  Returns the number of aggregates.
int64_t ogl_pgm_aggregate(int64_t n, const int64_t* indptr,
                          const int32_t* cols, const double* absvals,
                          int32_t* agg) {
  std::fill(agg, agg + n, -1);
  int64_t nc = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] >= 0) continue;
    int64_t best = -1;
    double best_w = 0.0;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      const int32_t j = cols[p];
      if (j != i && agg[j] < 0 && absvals[p] > best_w) {
        best = j;
        best_w = absvals[p];
      }
    }
    if (best >= 0) {
      agg[i] = agg[best] = static_cast<int32_t>(nc++);
    }
  }
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] >= 0) continue;
    int64_t best = -1;
    double best_w = 0.0;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      const int32_t j = cols[p];
      if (j != i && agg[j] >= 0 && absvals[p] > best_w) {
        best = j;
        best_w = absvals[p];
      }
    }
    agg[i] = (best >= 0) ? agg[best] : static_cast<int32_t>(nc++);
  }
  return nc;
}

// Row-major (row, col) lexicographic sort of COO triplets with a source
// permutation output — the general-case merge used when local interfaces
// are present (reference HostMatrix.C:506-586).  O(nnz + n) counting sort.
void ogl_sort_coo(int64_t nnz, int64_t n, const int64_t* in_rows,
                  const int64_t* in_cols, int32_t* out_rows,
                  int32_t* out_cols, int32_t* out_perm) {
  std::vector<int64_t> count(n + 1, 0);
  for (int64_t e = 0; e < nnz; ++e) ++count[in_rows[e] + 1];
  for (int64_t r = 0; r < n; ++r) count[r + 1] += count[r];
  std::vector<int64_t> cursor(count.begin(), count.end() - 1);
  for (int64_t e = 0; e < nnz; ++e) {
    const int64_t p = cursor[in_rows[e]]++;
    out_rows[p] = static_cast<int32_t>(in_rows[e]);
    out_cols[p] = static_cast<int32_t>(in_cols[e]);
    out_perm[p] = static_cast<int32_t>(e);
  }
  for (int64_t r = 0; r < n; ++r) {
    const int64_t s = count[r], e = count[r + 1];
    for (int64_t i = s + 1; i < e; ++i) {
      int32_t c = out_cols[i], pm = out_perm[i];
      int64_t j = i - 1;
      while (j >= s && out_cols[j] > c) {
        out_cols[j + 1] = out_cols[j];
        out_perm[j + 1] = out_perm[j];
        --j;
      }
      out_cols[j + 1] = c;
      out_perm[j + 1] = pm;
    }
  }
}

}  // extern "C"
