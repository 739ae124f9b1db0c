// Native mesh/topology kernels (setup-time host work).
//
// Replaces the dolfinx C++ mesh machinery the reference leans on
// (SURVEY.md §2.2: mesh topology, dofmaps, sparsity construction): edge
// extraction + dedup, CSR sparsity pattern construction, and reverse
// Cuthill-McKee reordering. These run once per mesh on the host; the numpy
// fallbacks in topology.py implement identical semantics.
//
// Build: g++ -O3 -march=native -shared -fPIC meshops.cpp -o libmeshops.so
// Interface: plain C ABI consumed via ctypes (no pybind11 dependency).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <queue>
#include <vector>

extern "C" {

// Extract unique edges from cells.
// conn: (n_cells * nv) int32; local_edges: (n_le * 2) int32 (local vertex
// pairs). Outputs written into caller-allocated buffers:
//   edges_out: (max_edges * 2) int32   (unique, sorted-vertex pairs, lex order)
//   cell_edges_out: (n_cells * n_le) int32  (edge id per cell slot)
//   counts_out: (max_edges) int32      (cells incident to each edge)
// Returns the number of unique edges (<= n_cells * n_le).
int64_t build_edges(const int32_t* conn, int64_t n_cells, int32_t nv,
                    const int32_t* local_edges, int32_t n_le,
                    int32_t* edges_out, int32_t* cell_edges_out,
                    int32_t* counts_out) {
  const int64_t total = n_cells * n_le;
  // key = (vmin << 32) | vmax, remember source slot
  std::vector<std::pair<uint64_t, int64_t>> keys(total);
  for (int64_t c = 0; c < n_cells; ++c) {
    for (int32_t e = 0; e < n_le; ++e) {
      int32_t a = conn[c * nv + local_edges[2 * e]];
      int32_t b = conn[c * nv + local_edges[2 * e + 1]];
      if (a > b) std::swap(a, b);
      keys[c * n_le + e] = {((uint64_t)(uint32_t)a << 32) |
                            (uint64_t)(uint32_t)b,
                            c * n_le + e};
    }
  }
  std::sort(keys.begin(), keys.end());
  int64_t n_edges = -1;
  uint64_t prev = ~0ull;
  for (int64_t i = 0; i < total; ++i) {
    if (keys[i].first != prev) {
      ++n_edges;
      prev = keys[i].first;
      edges_out[2 * n_edges] = (int32_t)(keys[i].first >> 32);
      edges_out[2 * n_edges + 1] = (int32_t)(keys[i].first & 0xffffffffu);
      counts_out[n_edges] = 0;
    }
    cell_edges_out[keys[i].second] = (int32_t)n_edges;
    counts_out[n_edges] += 1;
  }
  return n_edges + 1;
}

// CSR sparsity of the dofmap product graph.
// dofmap: (n_cells * nd) int32. Outputs:
//   perm_out: (n_cells*nd*nd) int32  — sort order of flattened (row, col)
//   seg_out:  (n_cells*nd*nd) int32  — unique-slot id per sorted entry
//   rows_out/cols_out: (nnz) int32  — unique (row, col) pairs, row-major
// Returns nnz.
int64_t build_csr_pattern(const int32_t* dofmap, int64_t n_cells, int32_t nd,
                          int64_t n_dofs, int32_t* perm_out, int32_t* seg_out,
                          int32_t* rows_out, int32_t* cols_out) {
  const int64_t total = n_cells * nd * nd;
  std::vector<std::pair<uint64_t, int64_t>> keys(total);
  for (int64_t c = 0; c < n_cells; ++c) {
    const int32_t* dm = dofmap + c * nd;
    for (int32_t i = 0; i < nd; ++i) {
      for (int32_t j = 0; j < nd; ++j) {
        uint64_t key = (uint64_t)(uint32_t)dm[i] * (uint64_t)n_dofs +
                       (uint64_t)(uint32_t)dm[j];
        keys[c * nd * nd + i * nd + j] = {key, c * nd * nd + i * nd + j};
      }
    }
  }
  std::sort(keys.begin(), keys.end());
  int64_t nnz = -1;
  uint64_t prev = ~0ull;
  for (int64_t i = 0; i < total; ++i) {
    if (keys[i].first != prev) {
      ++nnz;
      prev = keys[i].first;
      rows_out[nnz] = (int32_t)(keys[i].first / (uint64_t)n_dofs);
      cols_out[nnz] = (int32_t)(keys[i].first % (uint64_t)n_dofs);
    }
    perm_out[i] = (int32_t)keys[i].second;
    seg_out[i] = (int32_t)nnz;
  }
  return nnz + 1;
}

// Reverse Cuthill-McKee ordering of the node graph given unique edges.
// Returns permutation perm_out (n_nodes int32): new_id -> old_id.
void rcm_order(const int32_t* edges, int64_t n_edges, int64_t n_nodes,
               int32_t* perm_out) {
  std::vector<int64_t> deg(n_nodes, 0), off(n_nodes + 1, 0);
  for (int64_t e = 0; e < n_edges; ++e) {
    deg[edges[2 * e]]++;
    deg[edges[2 * e + 1]]++;
  }
  for (int64_t i = 0; i < n_nodes; ++i) off[i + 1] = off[i] + deg[i];
  std::vector<int32_t> adj(off[n_nodes]);
  std::vector<int64_t> cur(off.begin(), off.end() - 1);
  for (int64_t e = 0; e < n_edges; ++e) {
    int32_t a = edges[2 * e], b = edges[2 * e + 1];
    adj[cur[a]++] = b;
    adj[cur[b]++] = a;
  }
  std::vector<char> seen(n_nodes, 0);
  int64_t out = 0;
  std::vector<int32_t> order;
  order.reserve(n_nodes);
  for (int64_t start = 0; start < n_nodes; ++start) {
    if (seen[start]) continue;
    // find min-degree node in this component via BFS from `start`
    std::queue<int32_t> q;
    q.push((int32_t)start);
    seen[start] = 1;
    order.push_back((int32_t)start);
    size_t head = order.size() - 1;
    while (head < order.size()) {
      int32_t v = order[head++];
      std::vector<int32_t> nb;
      for (int64_t k = off[v]; k < off[v] + deg[v]; ++k)
        if (!seen[adj[k]]) nb.push_back(adj[k]);
      std::sort(nb.begin(), nb.end(), [&](int32_t x, int32_t y) {
        return deg[x] < deg[y];
      });
      for (int32_t u : nb) {
        seen[u] = 1;
        order.push_back(u);
      }
    }
  }
  // reverse
  for (int64_t i = 0; i < n_nodes; ++i)
    perm_out[i] = order[n_nodes - 1 - i];
  (void)out;
}

}  // extern "C"
