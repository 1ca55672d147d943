// Native SAH BVH builder — C++ drop-in for the hot host-side build loop.
//
// The reference builds its BVH in C++ on the host (reference:
// src/BVH.cpp:13-239); our numpy builder is correct but pays Python
// per-node overhead (~4s for the 10k-triangle bunny).  This translation
// unit implements the same algorithm natively — SAH with 20 centroid
// buckets on the max-extent axis, leaf size 1, preorder flatten with
// parent/left/right — and is loaded through ctypes (no pybind11 in this
// image).  Link building (threaded hit/miss + 6-way MTBVH) stays in
// numpy; the recursive partition is the hot part.
//
// Build: cc -O2 -shared -fPIC -o libbvh.so bvh_builder.cpp (see native.py)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

struct Node {
  float bmin[3], bmax[3];
  int32_t start, end, left, right, parent;
};

struct Builder {
  const float* bmin_tri;  // (T,3)
  const float* bmax_tri;  // (T,3)
  const float* centroid;  // (T,3)
  int64_t* order;         // (T,) permutation, modified in place
  std::vector<Node> nodes;
  int max_prim;
  int buckets;

  double surface_area(const float* lo, const float* hi) const {
    double dx = hi[0] - lo[0], dy = hi[1] - lo[1], dz = hi[2] - lo[2];
    if (dx < 0 || dy < 0 || dz < 0) return 0.0;
    return 2.0 * (dx * dy + dy * dz + dz * dx);
  }

  // preorder recursive build over order[start:end); returns node id
  int32_t build(int32_t start, int32_t end, int32_t parent) {
    int32_t me = (int32_t)nodes.size();
    nodes.push_back(Node{});
    Node& n0 = nodes[me];
    n0.start = start;
    n0.end = end;
    n0.parent = parent;
    n0.left = n0.right = -1;

    float bmin[3] = {1e38f, 1e38f, 1e38f};
    float bmax[3] = {-1e38f, -1e38f, -1e38f};
    float cmin[3] = {1e38f, 1e38f, 1e38f};
    float cmax[3] = {-1e38f, -1e38f, -1e38f};
    for (int32_t i = start; i < end; ++i) {
      const int64_t t = order[i];
      for (int k = 0; k < 3; ++k) {
        bmin[k] = std::min(bmin[k], bmin_tri[t * 3 + k]);
        bmax[k] = std::max(bmax[k], bmax_tri[t * 3 + k]);
        cmin[k] = std::min(cmin[k], centroid[t * 3 + k]);
        cmax[k] = std::max(cmax[k], centroid[t * 3 + k]);
      }
    }
    std::memcpy(nodes[me].bmin, bmin, sizeof bmin);
    std::memcpy(nodes[me].bmax, bmax, sizeof bmax);

    if (end - start <= max_prim) return me;

    // max-extent axis of the centroid bounds (reference: Bounds3::MaxExtent)
    float diag[3] = {cmax[0] - cmin[0], cmax[1] - cmin[1], cmax[2] - cmin[2]};
    int axis = (diag[0] > diag[1] && diag[0] > diag[2]) ? 0 : (diag[1] > diag[2] ? 1 : 2);

    int32_t mid = -1;
    if (diag[axis] > 0) {
      // bucketed SAH (reference: src/BVH.cpp:45-86)
      const int B = buckets;
      std::vector<int32_t> cnt(B, 0);
      std::vector<float> bk_lo(B * 3, 1e38f), bk_hi(B * 3, -1e38f);
      const float inv = 1.0f / diag[axis];
      auto bucket_of = [&](int64_t t) {
        float off = (centroid[t * 3 + axis] - cmin[axis]) * inv;
        off = std::min(std::max(off, 0.0f), 1.0f);
        int b = off >= 1.0f ? B - 1 : (int)(off * B);
        return std::min(b, B - 1);
      };
      for (int32_t i = start; i < end; ++i) {
        const int64_t t = order[i];
        const int b = bucket_of(t);
        cnt[b]++;
        for (int k = 0; k < 3; ++k) {
          bk_lo[b * 3 + k] = std::min(bk_lo[b * 3 + k], bmin_tri[t * 3 + k]);
          bk_hi[b * 3 + k] = std::max(bk_hi[b * 3 + k], bmax_tri[t * 3 + k]);
        }
      }
      double best = std::numeric_limits<double>::infinity();
      int best_b = -1;
      for (int i = 0; i < B - 1; ++i) {
        int32_t nl = 0, nr = 0;
        float llo[3] = {1e38f, 1e38f, 1e38f}, lhi[3] = {-1e38f, -1e38f, -1e38f};
        float rlo[3] = {1e38f, 1e38f, 1e38f}, rhi[3] = {-1e38f, -1e38f, -1e38f};
        for (int j = 0; j <= i; ++j) {
          nl += cnt[j];
          for (int k = 0; k < 3; ++k) {
            llo[k] = std::min(llo[k], bk_lo[j * 3 + k]);
            lhi[k] = std::max(lhi[k], bk_hi[j * 3 + k]);
          }
        }
        for (int j = i + 1; j < B; ++j) {
          nr += cnt[j];
          for (int k = 0; k < 3; ++k) {
            rlo[k] = std::min(rlo[k], bk_lo[j * 3 + k]);
            rhi[k] = std::max(rhi[k], bk_hi[j * 3 + k]);
          }
        }
        if (nl == 0 || nr == 0) continue;
        double loss = nl * surface_area(llo, lhi) + nr * surface_area(rlo, rhi);
        if (loss < best) {
          best = loss;
          best_b = i;
        }
      }
      if (best_b >= 0) {
        // stable partition, matching the numpy builder
        std::stable_partition(order + start, order + end,
                              [&](int64_t t) { return bucket_of(t) <= best_b; });
        int32_t m = start;
        while (m < end && bucket_of(order[m]) <= best_b) ++m;
        mid = m;
      }
    }
    if (mid <= start || mid >= end) {
      // median fallback (degenerate split; reference: src/BVH.cpp:94-118)
      std::stable_sort(order + start, order + end, [&](int64_t a, int64_t b) {
        return centroid[a * 3 + axis] < centroid[b * 3 + axis];
      });
      mid = (start + end) / 2;
    }

    int32_t l = build(start, mid, me);
    int32_t r = build(mid, end, me);
    nodes[me].left = l;
    nodes[me].right = r;
    return me;
  }
};

}  // namespace

extern "C" {

// Returns node count; caller then calls bvh_read to copy results out.
// All arrays are caller-allocated except the internal node vector.
static std::vector<Node>* g_nodes = nullptr;

int32_t bvh_build(const float* bmin_tri, const float* bmax_tri,
                  const float* centroid, int64_t* order, int32_t num_tris,
                  int32_t max_prim, int32_t buckets) {
  delete g_nodes;
  g_nodes = new std::vector<Node>();
  Builder b{bmin_tri, bmax_tri, centroid, order, {}, max_prim, buckets};
  b.nodes.reserve((size_t)num_tris * 2);
  b.build(0, num_tris, -1);
  *g_nodes = std::move(b.nodes);
  return (int32_t)g_nodes->size();
}

void bvh_read(float* bmin, float* bmax, int32_t* start, int32_t* end,
              int32_t* left, int32_t* right, int32_t* parent) {
  const auto& nodes = *g_nodes;
  for (size_t i = 0; i < nodes.size(); ++i) {
    std::memcpy(bmin + i * 3, nodes[i].bmin, 12);
    std::memcpy(bmax + i * 3, nodes[i].bmax, 12);
    start[i] = nodes[i].start;
    end[i] = nodes[i].end;
    left[i] = nodes[i].left;
    right[i] = nodes[i].right;
    parent[i] = nodes[i].parent;
  }
  delete g_nodes;
  g_nodes = nullptr;
}

}  // extern "C"
