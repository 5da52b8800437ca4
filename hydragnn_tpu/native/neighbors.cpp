// Native neighbor search + batch assembly for the host data path.
//
// TPU-native counterpart of the reference's external native dependencies:
// torch_cluster's C++ radius search (used via PyG RadiusGraph, ref:
// hydragnn/preprocess/graph_samples_checks_and_updates.py:109-138) and ASE's
// C neighbor list for PBC (ref: :152-176). Exposed through ctypes
// (hydragnn_tpu/native/__init__.py) with a pure-numpy fallback.
//
// Build: python -m hydragnn_tpu.native.build

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <unordered_map>
#include <vector>

extern "C" {

// Cell-list radius graph. Edges j->i for |p_i - p_j| <= r, per-target cap
// max_nb keeping nearest first. Returns edge count, or -1 on overflow of
// max_edges capacity.
int64_t radius_graph(const float* pos, int64_t n, float r, int64_t max_nb,
                     int loop, int64_t* senders, int64_t* receivers,
                     int64_t max_edges) {
  if (n == 0) return 0;
  const float cell = std::max(r, 1e-12f);
  const float inv_cell = 1.0f / cell;

  auto key_of = [&](int64_t i) -> uint64_t {
    // 21-bit signed packing per axis
    int64_t cx = (int64_t)std::floor(pos[3 * i + 0] * inv_cell) + (1 << 20);
    int64_t cy = (int64_t)std::floor(pos[3 * i + 1] * inv_cell) + (1 << 20);
    int64_t cz = (int64_t)std::floor(pos[3 * i + 2] * inv_cell) + (1 << 20);
    return ((uint64_t)cx << 42) | ((uint64_t)cy << 21) | (uint64_t)cz;
  };

  std::unordered_map<uint64_t, std::vector<int64_t>> buckets;
  buckets.reserve(n * 2);
  for (int64_t i = 0; i < n; ++i) buckets[key_of(i)].push_back(i);

  const float r2 = r * r;
  std::vector<std::pair<float, int64_t>> cand;
  int64_t ne = 0;
  for (int64_t i = 0; i < n; ++i) {
    cand.clear();
    int64_t cx = (int64_t)std::floor(pos[3 * i + 0] * inv_cell) + (1 << 20);
    int64_t cy = (int64_t)std::floor(pos[3 * i + 1] * inv_cell) + (1 << 20);
    int64_t cz = (int64_t)std::floor(pos[3 * i + 2] * inv_cell) + (1 << 20);
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          uint64_t k = ((uint64_t)(cx + dx) << 42) |
                       ((uint64_t)(cy + dy) << 21) | (uint64_t)(cz + dz);
          auto it = buckets.find(k);
          if (it == buckets.end()) continue;
          for (int64_t j : it->second) {
            if (!loop && j == i) continue;
            float ddx = pos[3 * j + 0] - pos[3 * i + 0];
            float ddy = pos[3 * j + 1] - pos[3 * i + 1];
            float ddz = pos[3 * j + 2] - pos[3 * i + 2];
            float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
            if (d2 <= r2) cand.emplace_back(d2, j);
          }
        }
    if ((int64_t)cand.size() > max_nb) {
      std::stable_sort(cand.begin(), cand.end());
      cand.resize(max_nb);
    }
    if (ne + (int64_t)cand.size() > max_edges) return -1;
    for (auto& p : cand) {
      senders[ne] = p.second;
      receivers[ne] = i;
      ++ne;
    }
  }
  return ne;
}

// Periodic radius graph: image expansion + per-target cap, nearest first.
// shifts_out[e*3..] = lattice shift such that vec = pos[recv]-pos[send]+shift
// (matches hydragnn/utils/model/operations.py:21-36 sign convention).
int64_t radius_graph_pbc(const float* pos, int64_t n, const float* cell3x3,
                         float r, int64_t max_nb, const int* pbc,
                         int64_t* senders, int64_t* receivers,
                         float* shifts_out, int64_t max_edges) {
  // heights of the cell -> images needed per axis
  // h_a = 1 / |row_a of inverse(cell)^T|
  double c[3][3];
  for (int a = 0; a < 3; ++a)
    for (int b = 0; b < 3; ++b) c[a][b] = cell3x3[3 * a + b];
  // inverse of 3x3
  double det = c[0][0] * (c[1][1] * c[2][2] - c[1][2] * c[2][1]) -
               c[0][1] * (c[1][0] * c[2][2] - c[1][2] * c[2][0]) +
               c[0][2] * (c[1][0] * c[2][1] - c[1][1] * c[2][0]);
  if (std::abs(det) < 1e-12) return -2;
  double inv[3][3];
  inv[0][0] = (c[1][1] * c[2][2] - c[1][2] * c[2][1]) / det;
  inv[0][1] = (c[0][2] * c[2][1] - c[0][1] * c[2][2]) / det;
  inv[0][2] = (c[0][1] * c[1][2] - c[0][2] * c[1][1]) / det;
  inv[1][0] = (c[1][2] * c[2][0] - c[1][0] * c[2][2]) / det;
  inv[1][1] = (c[0][0] * c[2][2] - c[0][2] * c[2][0]) / det;
  inv[1][2] = (c[0][2] * c[1][0] - c[0][0] * c[1][2]) / det;
  inv[2][0] = (c[1][0] * c[2][1] - c[1][1] * c[2][0]) / det;
  inv[2][1] = (c[0][1] * c[2][0] - c[0][0] * c[2][1]) / det;
  inv[2][2] = (c[0][0] * c[1][1] - c[0][1] * c[1][0]) / det;
  int nrep[3];
  for (int a = 0; a < 3; ++a) {
    double norm = std::sqrt(inv[0][a] * inv[0][a] + inv[1][a] * inv[1][a] +
                            inv[2][a] * inv[2][a]);
    double height = 1.0 / std::max(norm, 1e-12);
    nrep[a] = pbc[a] ? (int)std::ceil(r / height) : 0;
  }

  const float r2 = r * r;
  struct Edge { float d2; int64_t j; float sx, sy, sz; };
  std::vector<Edge> cand;
  int64_t ne = 0;
  for (int64_t i = 0; i < n; ++i) {
    cand.clear();
    for (int sx = -nrep[0]; sx <= nrep[0]; ++sx)
      for (int sy = -nrep[1]; sy <= nrep[1]; ++sy)
        for (int sz = -nrep[2]; sz <= nrep[2]; ++sz) {
          float dxs = sx * (float)c[0][0] + sy * (float)c[1][0] +
                      sz * (float)c[2][0];
          float dys = sx * (float)c[0][1] + sy * (float)c[1][1] +
                      sz * (float)c[2][1];
          float dzs = sx * (float)c[0][2] + sy * (float)c[1][2] +
                      sz * (float)c[2][2];
          for (int64_t j = 0; j < n; ++j) {
            if (j == i && sx == 0 && sy == 0 && sz == 0) continue;
            // source image position - target
            float ddx = pos[3 * j + 0] + dxs - pos[3 * i + 0];
            float ddy = pos[3 * j + 1] + dys - pos[3 * i + 1];
            float ddz = pos[3 * j + 2] + dzs - pos[3 * i + 2];
            float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
            if (d2 <= r2)
              cand.push_back({d2, j, -dxs, -dys, -dzs});
          }
        }
    std::stable_sort(cand.begin(), cand.end(),
                     [](const Edge& a, const Edge& b) { return a.d2 < b.d2; });
    if ((int64_t)cand.size() > max_nb) cand.resize(max_nb);
    if (ne + (int64_t)cand.size() > max_edges) return -1;
    for (auto& e : cand) {
      senders[ne] = e.j;
      receivers[ne] = i;
      shifts_out[3 * ne + 0] = e.sx;
      shifts_out[3 * ne + 1] = e.sy;
      shifts_out[3 * ne + 2] = e.sz;
      ++ne;
    }
  }
  return ne;
}

}  // extern "C"
