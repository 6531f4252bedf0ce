// Native mesh-repair kernels: connected components + boundary-edge
// extraction.
//
// C++ counterpart of the MeshLib functionality the reference leans on for
// clean/repair (SURVEY.md §2b N6: components, fillHoleNicely).  The Python
// layer (collab_splats_tpu/meshing/repair.py) implements the same
// operations in numpy; these kernels replace the O(F) Python union-find
// loop for large meshes.  Exposed as a plain C ABI consumed via ctypes.
//
// Build: make -C cpp   (produces libmesh_repair.so)

#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  explicit UnionFind(int32_t n) : parent(n) {
    for (int32_t i = 0; i < n; ++i) parent[i] = i;
  }
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }
  void unite(int32_t a, int32_t b) {
    int32_t ra = find(a), rb = find(b);
    if (ra != rb) parent[rb] = ra;
  }
};

}  // namespace

extern "C" {

// Label faces by connected component (shared vertices connect faces).
// faces: [n_faces * 3] vertex indices; out_labels: [n_faces].
// Returns the number of components.
int32_t face_components(int32_t n_verts, int32_t n_faces,
                        const int32_t* faces, int32_t* out_labels) {
  UnionFind uf(n_verts);
  for (int32_t f = 0; f < n_faces; ++f) {
    uf.unite(faces[3 * f], faces[3 * f + 1]);
    uf.unite(faces[3 * f], faces[3 * f + 2]);
  }
  std::unordered_map<int32_t, int32_t> root_to_label;
  root_to_label.reserve(64);
  int32_t next = 0;
  for (int32_t f = 0; f < n_faces; ++f) {
    int32_t r = uf.find(faces[3 * f]);
    auto it = root_to_label.find(r);
    if (it == root_to_label.end()) {
      it = root_to_label.emplace(r, next++).first;
    }
    out_labels[f] = it->second;
  }
  return next;
}

// Extract directed boundary edges (edges used by exactly one face, in face
// winding order).  out_edges must hold up to n_faces*3*2 ints.
// Returns the number of boundary edges.
int32_t boundary_edges(int32_t n_faces, const int32_t* faces,
                       int32_t* out_edges) {
  // Count undirected edge occurrences.
  std::unordered_map<uint64_t, int32_t> counts;
  counts.reserve(static_cast<size_t>(n_faces) * 3);
  auto key = [](int32_t a, int32_t b) {
    uint64_t lo = static_cast<uint32_t>(a < b ? a : b);
    uint64_t hi = static_cast<uint32_t>(a < b ? b : a);
    return (hi << 32) | lo;
  };
  for (int32_t f = 0; f < n_faces; ++f) {
    const int32_t* v = faces + 3 * f;
    counts[key(v[0], v[1])]++;
    counts[key(v[1], v[2])]++;
    counts[key(v[2], v[0])]++;
  }
  int32_t n_out = 0;
  for (int32_t f = 0; f < n_faces; ++f) {
    const int32_t* v = faces + 3 * f;
    const int32_t pairs[3][2] = {{v[0], v[1]}, {v[1], v[2]}, {v[2], v[0]}};
    for (auto& e : pairs) {
      if (counts[key(e[0], e[1])] == 1) {
        out_edges[2 * n_out] = e[0];
        out_edges[2 * n_out + 1] = e[1];
        ++n_out;
      }
    }
  }
  return n_out;
}

// Vertex-welding by quantized position. points: [n * 3] float32;
// out_remap: [n] -> representative index (first occurrence).
// Returns number of unique vertices.
int32_t weld_vertices(int32_t n, const float* points, double inv_eps,
                      int32_t* out_remap) {
  auto h = [](int64_t x, int64_t y, int64_t z) {
    uint64_t v = static_cast<uint64_t>(x) * 73856093ULL ^
                 static_cast<uint64_t>(y) * 19349663ULL ^
                 static_cast<uint64_t>(z) * 83492791ULL;
    return v;
  };
  // Two-level: hash bucket -> chain of candidate indices compared exactly.
  std::unordered_map<uint64_t, std::vector<int32_t>> buckets;
  buckets.reserve(n);
  int32_t n_unique = 0;
  std::vector<int64_t> qx(n), qy(n), qz(n);
  for (int32_t i = 0; i < n; ++i) {
    // llround: uniform round-to-nearest for negative and positive coords
    // (a +0.5 truncation cast shifts every negative bin and widens the one
    // containing zero).
    qx[i] = std::llround(points[3 * i] * inv_eps);
    qy[i] = std::llround(points[3 * i + 1] * inv_eps);
    qz[i] = std::llround(points[3 * i + 2] * inv_eps);
  }
  for (int32_t i = 0; i < n; ++i) {
    uint64_t hk = h(qx[i], qy[i], qz[i]);
    auto& chain = buckets[hk];
    int32_t rep = -1;
    for (int32_t j : chain) {
      if (qx[j] == qx[i] && qy[j] == qy[i] && qz[j] == qz[i]) {
        rep = j;
        break;
      }
    }
    if (rep < 0) {
      chain.push_back(i);
      out_remap[i] = i;
      ++n_unique;
    } else {
      out_remap[i] = rep;
    }
  }
  return n_unique;
}

}  // extern "C"
