// Binned-SAH BVH builder.
//
// Native counterpart of the reference's SAH kd-tree construction
// (include/mitsuba/render/gkdtree.h:740,958-1026 — min-max binning with
// a surface-area heuristic): the build is pointer-chasing, divergent,
// host-side work that belongs in C++, while traversal happens on-device
// over the flattened arrays this builder emits (alvrl_tpu/geometry/bvh.py).
//
// Output layout (flattened, device-friendly):
//   bounds:  n_nodes x 6  (min.xyz, max.xyz)
//   meta:    n_nodes x 4  (left, right, prim_start, prim_count)
//            prim_count > 0 => leaf over prim_order[prim_start ...]
//   prim_order: n_faces    (triangle indices, leaf-contiguous)
//
// Build: top-down, 16-bin SAH over the centroid extent of the widest
// axis, median fallback for degenerate splits, leaves at <= 4 prims.

#include <algorithm>
#include <cfloat>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct AABB {
  float lo[3], hi[3];
  AABB() {
    for (int k = 0; k < 3; ++k) { lo[k] = FLT_MAX; hi[k] = -FLT_MAX; }
  }
  void grow(const float* p) {
    for (int k = 0; k < 3; ++k) {
      lo[k] = std::min(lo[k], p[k]);
      hi[k] = std::max(hi[k], p[k]);
    }
  }
  void grow(const AABB& o) {
    for (int k = 0; k < 3; ++k) {
      lo[k] = std::min(lo[k], o.lo[k]);
      hi[k] = std::max(hi[k], o.hi[k]);
    }
  }
  float area() const {
    float d[3] = {hi[0] - lo[0], hi[1] - lo[1], hi[2] - lo[2]};
    if (d[0] < 0 || d[1] < 0 || d[2] < 0) return 0.f;
    return 2.f * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0]);
  }
};

struct Prim {
  AABB box;
  float centroid[3];
  int index;
};

struct Builder {
  std::vector<Prim> prims;
  std::vector<float> bounds;   // n x 6
  std::vector<int32_t> meta;   // n x 4
  std::vector<int32_t> order;
  int leaf_size;

  int new_node() {
    bounds.insert(bounds.end(), 6, 0.f);
    meta.insert(meta.end(), 4, -1);
    return (int)(meta.size() / 4) - 1;
  }

  void set_bounds(int node, const AABB& b) {
    float* p = &bounds[node * 6];
    p[0] = b.lo[0]; p[1] = b.lo[1]; p[2] = b.lo[2];
    p[3] = b.hi[0]; p[4] = b.hi[1]; p[5] = b.hi[2];
  }

  int build(int begin, int end) {
    int node = new_node();
    AABB box, cbox;
    for (int i = begin; i < end; ++i) {
      box.grow(prims[i].box);
      cbox.grow(prims[i].centroid);
    }
    set_bounds(node, box);
    int count = end - begin;
    if (count <= leaf_size) {
      make_leaf(node, begin, end);
      return node;
    }

    // choose the widest centroid axis
    int axis = 0;
    float ext[3];
    for (int k = 0; k < 3; ++k) ext[k] = cbox.hi[k] - cbox.lo[k];
    if (ext[1] > ext[0]) axis = 1;
    if (ext[2] > ext[axis]) axis = 2;
    if (ext[axis] <= 1e-12f) {  // degenerate: median split by index
      int mid = begin + count / 2;
      split_children(node, begin, mid, end);
      return node;
    }

    // 16-bin SAH
    constexpr int NB = 16;
    AABB bin_box[NB];
    int bin_cnt[NB] = {0};
    float k1 = NB * (1.f - 1e-6f) / ext[axis];
    for (int i = begin; i < end; ++i) {
      int b = (int)(k1 * (prims[i].centroid[axis] - cbox.lo[axis]));
      b = std::min(std::max(b, 0), NB - 1);
      bin_box[b].grow(prims[i].box);
      bin_cnt[b]++;
    }
    float right_area[NB];
    AABB acc;
    int right_cnt[NB];
    int rc = 0;
    for (int b = NB - 1; b >= 1; --b) {
      acc.grow(bin_box[b]);
      rc += bin_cnt[b];
      right_area[b] = acc.area();
      right_cnt[b] = rc;
    }
    AABB lacc;
    int lc = 0;
    float best_cost = FLT_MAX;
    int best_split = -1;
    float inv_area = 1.f / std::max(box.area(), 1e-30f);
    for (int b = 1; b < NB; ++b) {
      lacc.grow(bin_box[b - 1]);
      lc += bin_cnt[b - 1];
      if (lc == 0 || right_cnt[b] == 0) continue;
      float cost =
          (lacc.area() * lc + right_area[b] * right_cnt[b]) * inv_area;
      if (cost < best_cost) { best_cost = cost; best_split = b; }
    }
    int mid;
    if (best_split < 0 || best_cost >= (float)count) {
      mid = begin + count / 2;  // SAH says leaf but count > leaf_size
      std::nth_element(
          prims.begin() + begin, prims.begin() + mid, prims.begin() + end,
          [axis](const Prim& a, const Prim& b) {
            return a.centroid[axis] < b.centroid[axis];
          });
    } else {
      auto it = std::partition(
          prims.begin() + begin, prims.begin() + end,
          [&](const Prim& p) {
            int b = (int)(k1 * (p.centroid[axis] - cbox.lo[axis]));
            b = std::min(std::max(b, 0), NB - 1);
            return b < best_split;
          });
      mid = (int)(it - prims.begin());
      if (mid == begin || mid == end) mid = begin + count / 2;
    }
    split_children(node, begin, mid, end);
    return node;
  }

  void make_leaf(int node, int begin, int end) {
    int32_t* mp = &meta[node * 4];
    mp[0] = -1; mp[1] = -1;
    mp[2] = (int32_t)order.size();
    mp[3] = end - begin;
    for (int i = begin; i < end; ++i) order.push_back(prims[i].index);
  }

  void split_children(int node, int begin, int mid, int end) {
    int l = build(begin, mid);
    int r = build(mid, end);
    int32_t* mp = &meta[node * 4];
    mp[0] = l; mp[1] = r; mp[2] = 0; mp[3] = 0;
  }
};

}  // namespace

extern "C" {

// Returns the node count (<= 2*n_faces). Caller allocates:
//   out_bounds: 2*n_faces * 6 floats
//   out_meta:   2*n_faces * 4 int32
//   out_order:  n_faces int32
int bvh_build(const float* verts, int n_verts, const int32_t* faces,
              int n_faces, int leaf_size, float* out_bounds,
              int32_t* out_meta, int32_t* out_order) {
  (void)n_verts;
  Builder b;
  b.leaf_size = leaf_size > 0 ? leaf_size : 4;
  b.prims.resize(n_faces);
  for (int i = 0; i < n_faces; ++i) {
    Prim& p = b.prims[i];
    p.index = i;
    p.box = AABB();
    for (int v = 0; v < 3; ++v) {
      const float* vp = &verts[faces[i * 3 + v] * 3];
      p.box.grow(vp);
    }
    for (int k = 0; k < 3; ++k)
      p.centroid[k] = 0.5f * (p.box.lo[k] + p.box.hi[k]);
  }
  b.bounds.reserve(n_faces * 12);
  b.meta.reserve(n_faces * 8);
  b.order.reserve(n_faces);
  b.build(0, n_faces);

  int n_nodes = (int)(b.meta.size() / 4);
  std::memcpy(out_bounds, b.bounds.data(), b.bounds.size() * sizeof(float));
  std::memcpy(out_meta, b.meta.data(), b.meta.size() * sizeof(int32_t));
  std::memcpy(out_order, b.order.data(), b.order.size() * sizeof(int32_t));
  return n_nodes;
}

}  // extern "C"
