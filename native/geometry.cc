// Native host-side geometry plans for the sparse-3D data pipeline.
//
// The framework's TPU design keeps all combinatorial geometry (voxel
// dedup, window partition, pooling maps, conv neighbor lookup, KNN
// graphs, ball-query + BFS clustering) on the host as index "plans" and
// feeds the device pure dense math. The reference implements the same
// primitives natively (softgroup_ops C++/CUDA: voxelize.cpp,
// bfs_cluster.cpp; Swin3D coordinate maps via MinkowskiEngine's C++
// hash maps); these are their framework-native equivalents for the
// data-pipeline hot path. Exposed via ctypes
// (msr3d_tpu/ops/host_geometry.py) with NumPy fallbacks.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 (auto-built by the binding).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

struct Key4 {
  int64_t a, b, c, d;
  bool operator==(const Key4 &o) const {
    return a == o.a && b == o.b && c == o.c && d == o.d;
  }
};

struct Key4Hash {
  size_t operator()(const Key4 &k) const {
    // splitmix-style mix of the four lanes
    uint64_t h = 0x9e3779b97f4a7c15ull;
    for (uint64_t v : {(uint64_t)k.a, (uint64_t)k.b, (uint64_t)k.c, (uint64_t)k.d}) {
      v ^= v >> 30;
      v *= 0xbf58476d1ce4e5b9ull;
      v ^= v >> 27;
      h ^= v + 0x9e3779b97f4a7c15ull + (h << 6) + (h >> 2);
    }
    return (size_t)h;
  }
};

}  // namespace

extern "C" {

// Group rows of an (n, 4) int64 key array; group ids assigned in
// first-occurrence order (the voxel/window ordering every plan uses).
// Returns the number of groups; group_of must hold n int32.
int64_t msr3d_group_rows(const int64_t *keys, int64_t n, int32_t *group_of) {
  std::unordered_map<Key4, int32_t, Key4Hash> table;
  table.reserve((size_t)n * 2);
  int32_t next_id = 0;
  for (int64_t i = 0; i < n; ++i) {
    Key4 k{keys[i * 4], keys[i * 4 + 1], keys[i * 4 + 2], keys[i * 4 + 3]};
    auto it = table.find(k);
    if (it == table.end()) {
      table.emplace(k, next_id);
      group_of[i] = next_id++;
    } else {
      group_of[i] = it->second;
    }
  }
  return next_id;
}

// For each of n voxels (int64 (n,4) [batch,x,y,z]) and n_off integer
// offsets ((n_off,3), already scaled by the tensor stride), the index of
// the voxel at coords+offset, or -1. out is (n, n_off) int32.
void msr3d_conv_neighbors(const int64_t *coords, int64_t n,
                          const int64_t *offsets, int64_t n_off,
                          int32_t *out) {
  std::unordered_map<Key4, int32_t, Key4Hash> table;
  table.reserve((size_t)n * 2);
  for (int64_t i = 0; i < n; ++i)
    table.emplace(
        Key4{coords[i * 4], coords[i * 4 + 1], coords[i * 4 + 2], coords[i * 4 + 3]},
        (int32_t)i);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t *c = coords + i * 4;
    for (int64_t t = 0; t < n_off; ++t) {
      const int64_t *o = offsets + t * 3;
      Key4 k{c[0], c[1] + o[0], c[2] + o[1], c[3] + o[2]};
      auto it = table.find(k);
      out[i * n_off + t] = it == table.end() ? -1 : it->second;
    }
  }
}

// Brute-force per-batch KNN over 3-d points, nearest first (stable:
// ties keep lower support index). Short batches repeat the nearest.
// out is (nq, k) int32 indices into the support array.
void msr3d_knn(const float *q, const int32_t *q_batch, int64_t nq,
               const float *s, const int32_t *s_batch, int64_t ns,
               int64_t k, int32_t *out) {
  // bucket support indices by batch
  std::unordered_map<int32_t, std::vector<int32_t>> buckets;
  for (int64_t j = 0; j < ns; ++j) buckets[s_batch[j]].push_back((int32_t)j);

  std::vector<std::pair<float, int32_t>> heap;  // max-heap of k best
  for (int64_t i = 0; i < nq; ++i) {
    const auto &cand = buckets[q_batch[i]];
    heap.clear();
    const float qx = q[i * 3], qy = q[i * 3 + 1], qz = q[i * 3 + 2];
    for (int32_t j : cand) {
      const float dx = s[j * 3] - qx, dy = s[j * 3 + 1] - qy, dz = s[j * 3 + 2] - qz;
      const float d = dx * dx + dy * dy + dz * dz;
      if ((int64_t)heap.size() < k) {
        heap.emplace_back(d, j);
        std::push_heap(heap.begin(), heap.end());
      } else if (d < heap.front().first ||
                 (d == heap.front().first && j < heap.front().second)) {
        std::pop_heap(heap.begin(), heap.end());
        heap.back() = {d, j};
        std::push_heap(heap.begin(), heap.end());
      }
    }
    std::sort_heap(heap.begin(), heap.end());
    // stable tie order: among equal distances prefer lower index
    for (size_t a = 1; a < heap.size(); ++a)
      if (heap[a].first == heap[a - 1].first && heap[a].second < heap[a - 1].second)
        std::swap(heap[a], heap[a - 1]);
    const int64_t got = (int64_t)heap.size();
    for (int64_t a = 0; a < k; ++a)
      out[i * k + a] = got ? heap[a < got ? a : 0].second : -1;
  }
}

// Ball query over a packed batch (softgroup ballquery_batch_p
// semantics: all same-batch points with d^2 < r^2, in index order,
// self included). Two-phase: pass count_only=1 to get nActive, then
// call again with idx sized accordingly. start_len is (n, 2) int32.
int64_t msr3d_ballquery(const float *xyz, const int32_t *batch, int64_t n,
                        const int64_t *batch_offsets, int64_t n_batches,
                        float radius, int32_t count_only, int32_t *idx,
                        int32_t *start_len) {
  const float r2 = radius * radius;
  int64_t cursor = 0;
  for (int64_t b = 0; b < n_batches; ++b) {
    const int64_t s = batch_offsets[b], e = batch_offsets[b + 1];
    for (int64_t i = s; i < e; ++i) {
      const float qx = xyz[i * 3], qy = xyz[i * 3 + 1], qz = xyz[i * 3 + 2];
      int32_t cnt = 0;
      for (int64_t j = s; j < e; ++j) {
        const float dx = xyz[j * 3] - qx, dy = xyz[j * 3 + 1] - qy,
                    dz = xyz[j * 3 + 2] - qz;
        if (dx * dx + dy * dy + dz * dz < r2) {
          if (!count_only) idx[cursor + cnt] = (int32_t)j;
          ++cnt;
        }
      }
      if (!count_only) {
        start_len[i * 2] = (int32_t)cursor;
        start_len[i * 2 + 1] = cnt;
      }
      cursor += cnt;
    }
  }
  (void)batch;
  return cursor;
}

// BFS connected components over a CSR neighbor graph (softgroup
// bfs_cluster.cpp:34-90 semantics): seeds scan 0..n-1, members recorded
// in BFS dequeue order. Outputs: order (n) int32 — all points in
// discovery order; comp_offsets (n+1) int32 — component boundaries
// (only the first n_comps+1 entries meaningful). Returns n_comps.
int64_t msr3d_bfs_components(const int32_t *nbr_idx, const int32_t *start_len,
                             int64_t n, int32_t *order, int32_t *comp_offsets) {
  std::vector<uint8_t> visited(n, 0);
  int64_t n_comps = 0, cursor = 0;
  std::queue<int32_t> q;
  comp_offsets[0] = 0;
  for (int64_t seed = 0; seed < n; ++seed) {
    if (visited[seed]) continue;
    visited[seed] = 1;
    order[cursor++] = (int32_t)seed;
    q.push((int32_t)seed);
    while (!q.empty()) {
      const int32_t cur = q.front();
      q.pop();
      const int32_t s = start_len[cur * 2], l = start_len[cur * 2 + 1];
      for (int32_t t = s; t < s + l; ++t) {
        const int32_t j = nbr_idx[t];
        if (!visited[j]) {
          visited[j] = 1;
          order[cursor++] = j;
          q.push(j);
        }
      }
    }
    comp_offsets[++n_comps] = (int32_t)cursor;
  }
  return n_comps;
}

}  // extern "C"
