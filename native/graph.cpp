// Native graph runtime for spline initialization.
//
// The reference does all graph work in Python: a 40,000-iteration Python loop
// building a lil_matrix (src/init_splines_ensemble.py:61-66,78-81) and one
// scipy Dijkstra call per pair (:167) — serial and allocation-heavy.  This
// module provides the host-side runtime equivalents, built for throughput:
//
//  - vlg_grid_knn_graph: k-nearest-neighbour CSR graph over a regular 2-D
//    latent grid.  Exploits the grid structure directly (candidate window
//    search) instead of a general KD-tree: O(n * w^2) with a tiny window,
//    cache-friendly, no tree build.
//  - vlg_dijkstra_multi: binary-heap Dijkstra from many sources in parallel
//    (OpenMP threads over sources), emitting distances + predecessors.
//  - vlg_extract_paths: walk predecessor arrays into padded path-index
//    matrices, ready for the batched least-squares spline fit on device.
//
// Exposed with a plain C ABI for ctypes; scipy remains as a pure-Python
// fallback when the shared library has not been built.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <utility>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Build a kNN graph over a regular nx x ny grid with spacings (dx, dy).
// Nodes are indexed row-major: node = ix * ny + iy (matching meshgrid 'ij'
// flattening).  For each node, the k nearest other nodes by Euclidean
// distance in (x, y) space; symmetric edges are NOT added twice here — the
// caller treats the graph as directed-with-both-arcs like scipy's kNN CSR.
//
// out_indptr:  (n+1)        out_indices: (n*k)        out_dists: (n*k)
// Returns number of edges written (== n*k).
int64_t vlg_grid_knn_graph(int32_t nx, int32_t ny, float dx, float dy,
                           int32_t k, int64_t* out_indptr,
                           int32_t* out_indices, float* out_dists) {
  const int64_t n = static_cast<int64_t>(nx) * ny;
  // window radius: k neighbours always live within a (2r+1)^2 patch where
  // r covers k cells along the tighter-spaced axis.
  int32_t r = 1;
  while ((2 * r + 1) * (2 * r + 1) - 1 < k + 8) ++r;
  const float min_sp = std::min(dx, dy), max_sp = std::max(dx, dy);
  // anisotropy can push true neighbours further out along the cheap axis
  int32_t r_cheap = static_cast<int32_t>(
      std::ceil(r * max_sp / std::max(min_sp, 1e-30f)));
  const int32_t rx = (dx <= dy) ? r_cheap : r;
  const int32_t ry = (dy <= dx) ? r_cheap : r;

  out_indptr[0] = 0;
#pragma omp parallel for schedule(static)
  for (int64_t node = 0; node < n; ++node) {
    const int32_t ix = static_cast<int32_t>(node / ny);
    const int32_t iy = static_cast<int32_t>(node % ny);
    std::vector<std::pair<float, int32_t>> cand;
    cand.reserve((2 * rx + 1) * (2 * ry + 1));
    for (int32_t ox = -rx; ox <= rx; ++ox) {
      const int32_t jx = ix + ox;
      if (jx < 0 || jx >= nx) continue;
      for (int32_t oy = -ry; oy <= ry; ++oy) {
        const int32_t jy = iy + oy;
        if (jy < 0 || jy >= ny || (ox == 0 && oy == 0)) continue;
        const float ddx = ox * dx, ddy = oy * dy;
        cand.emplace_back(std::sqrt(ddx * ddx + ddy * ddy),
                          jx * ny + jy);
      }
    }
    const int32_t kk = std::min<int64_t>(k, cand.size());
    std::partial_sort(cand.begin(), cand.begin() + kk, cand.end());
    for (int32_t j = 0; j < kk; ++j) {
      out_indices[node * k + j] = cand[j].second;
      out_dists[node * k + j] = cand[j].first;
    }
    for (int32_t j = kk; j < k; ++j) {  // boundary deficit: self-loop w/ 0
      out_indices[node * k + j] = static_cast<int32_t>(node);
      out_dists[node * k + j] = 0.0f;
    }
  }
  for (int64_t i = 0; i < n; ++i) out_indptr[i + 1] = (i + 1) * k;
  return n * k;
}

// Multi-source Dijkstra over a CSR graph, parallel over sources.
// indptr: (n+1) int64, indices: (nnz) int32, weights: (nnz) float
// sources: (m) int32
// out_dist: (m, n) float, out_pred: (m, n) int32 (-1 = unreachable/self)
void vlg_dijkstra_multi(int64_t n, const int64_t* indptr,
                        const int32_t* indices, const float* weights,
                        const int32_t* sources, int64_t m, float* out_dist,
                        int32_t* out_pred) {
  const float INF = std::numeric_limits<float>::infinity();
#pragma omp parallel for schedule(dynamic)
  for (int64_t s = 0; s < m; ++s) {
    float* dist = out_dist + s * n;
    int32_t* pred = out_pred + s * n;
    std::fill(dist, dist + n, INF);
    std::fill(pred, pred + n, -1);
    using QE = std::pair<float, int32_t>;
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
    const int32_t src = sources[s];
    dist[src] = 0.0f;
    pq.emplace(0.0f, src);
    while (!pq.empty()) {
      const auto [d, u] = pq.top();
      pq.pop();
      if (d > dist[u]) continue;  // stale entry
      for (int64_t e = indptr[u]; e < indptr[u + 1]; ++e) {
        const int32_t v = indices[e];
        const float nd = d + weights[e];
        if (nd < dist[v]) {
          dist[v] = nd;
          pred[v] = u;
          pq.emplace(nd, v);
        }
      }
    }
  }
}

// Walk predecessor chains from each (source_row, target) pair into a padded
// index matrix.  paths: (m, max_len) int32 filled with -1; lengths: (m,).
// A pair whose target is unreachable, or whose path exceeds max_len, gets
// length 0 (the caller skips it — reference skip logic at
// src/init_splines_ensemble.py:164-170).
void vlg_extract_paths(int64_t n, const int32_t* preds, const int32_t* sources,
                       const int32_t* source_rows, const int32_t* targets,
                       int64_t num_pairs, int32_t max_len, int32_t* paths,
                       int32_t* lengths) {
#pragma omp parallel for schedule(static)
  for (int64_t p = 0; p < num_pairs; ++p) {
    const int32_t row = source_rows[p];
    const int32_t src = sources[row];
    const int32_t* pred = preds + static_cast<int64_t>(row) * n;
    int32_t* path = paths + static_cast<int64_t>(p) * max_len;
    std::fill(path, path + max_len, -1);
    // walk backwards target -> source
    std::vector<int32_t> rev;
    int32_t node = targets[p];
    bool ok = true;
    while (node != src) {
      if (node < 0 || static_cast<int64_t>(rev.size()) >= max_len) {
        ok = false;
        break;
      }
      rev.push_back(node);
      node = pred[node];
    }
    if (!ok || static_cast<int64_t>(rev.size()) + 1 > max_len) {
      lengths[p] = 0;
      continue;
    }
    rev.push_back(src);
    const int32_t L = static_cast<int32_t>(rev.size());
    for (int32_t i = 0; i < L; ++i) path[i] = rev[L - 1 - i];
    lengths[p] = L;
  }
}

}  // extern "C"
