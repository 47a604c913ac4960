// Double-precision BVH ray tracer for the host oracle path.
//
// The pure-numpy oracle (ops/intersect.py intersect_rays_numpy) tests every
// ray against every face: ~6 minutes per 512^2 view on the 82k-face cat-scale
// mesh. This core builds a binned-SAH BVH once per mesh and traces rays
// through it with the SAME double-precision Moller-Trumbore arithmetic
// (operation-for-operation: pvec = d x e2, det = e1.pvec, u/v/t scaled by
// 1/det) and the same acceptance thresholds, so results agree with the
// oracle to ~1e-13 relative (numpy's einsum/cross reassociate some f64 ops;
// hit/face selection is identical) and exact-t ties break toward the lowest
// face index on both sides.
//
// Replaces what the reference delegates to Embree (reference mesh.py
// ray-mesh intersection via embree/trimesh) for the offline high-precision
// path; the on-device Pallas/XLA tracer (ops/intersect.py) remains the
// production path.
//
// C API (ctypes, see native/__init__.py):
//   bvh_create(F, tris[F*9])            -> opaque handle (nullptr on error)
//   bvh_trace(h, R, origins[R*3], dirs[R*3], t_eps, b_eps, det_eps,
//             out_t[R], out_f[R], out_uv[R*2])
//   bvh_destroy(h)
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

struct Vec3 {
  double x, y, z;
};

static inline Vec3 sub(const Vec3 &a, const Vec3 &b) {
  return {a.x - b.x, a.y - b.y, a.z - b.z};
}
static inline Vec3 cross(const Vec3 &a, const Vec3 &b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
// Same association as numpy's length-3 einsum: (x0*y0 + x1*y1) + x2*y2.
static inline double dot(const Vec3 &a, const Vec3 &b) {
  return (a.x * b.x + a.y * b.y) + a.z * b.z;
}

struct AABB {
  Vec3 lo{kInf, kInf, kInf};
  Vec3 hi{-kInf, -kInf, -kInf};
  void grow(const Vec3 &p) {
    lo.x = std::min(lo.x, p.x); lo.y = std::min(lo.y, p.y);
    lo.z = std::min(lo.z, p.z);
    hi.x = std::max(hi.x, p.x); hi.y = std::max(hi.y, p.y);
    hi.z = std::max(hi.z, p.z);
  }
  void grow(const AABB &b) {
    grow(b.lo);
    grow(b.hi);
  }
  double half_area() const {
    double dx = std::max(0.0, hi.x - lo.x);
    double dy = std::max(0.0, hi.y - lo.y);
    double dz = std::max(0.0, hi.z - lo.z);
    return dx * dy + dy * dz + dz * dx;
  }
};

struct Node {
  AABB box;
  // Leaf: count > 0, start indexes into the reordered face list.
  // Inner: count == 0, left child = this+1 (DFS layout), right = right_child.
  int64_t start = 0;
  int64_t count = 0;
  int64_t right_child = -1;
  int axis = 0;
};

struct BVH {
  std::vector<Node> nodes;
  std::vector<int64_t> face_of;  // BVH order -> original face index
  std::vector<Vec3> v0, e1, e2;  // in BVH order
};

constexpr int kBins = 16;
constexpr int64_t kLeafSize = 4;

struct BuildPrim {
  AABB box;
  Vec3 centroid;
  int64_t face;
};

// Depth cap keeps the traversal stack (128 entries) safe even on
// pathologically uneven SAH splits.
constexpr int kMaxDepth = 100;

static int64_t build_node(BVH &bvh, std::vector<BuildPrim> &prims,
                          int64_t lo, int64_t hi, int depth = 0) {
  int64_t node_id = static_cast<int64_t>(bvh.nodes.size());
  bvh.nodes.emplace_back();
  AABB box, cbox;
  for (int64_t i = lo; i < hi; ++i) {
    box.grow(prims[i].box);
    cbox.grow(prims[i].centroid);
  }
  bvh.nodes[node_id].box = box;

  int64_t n = hi - lo;
  double ext[3] = {cbox.hi.x - cbox.lo.x, cbox.hi.y - cbox.lo.y,
                   cbox.hi.z - cbox.lo.z};
  int axis = 0;
  if (ext[1] > ext[0]) axis = 1;
  if (ext[2] > ext[axis]) axis = 2;

  auto centroid_on = [axis](const BuildPrim &p) {
    return axis == 0 ? p.centroid.x : (axis == 1 ? p.centroid.y : p.centroid.z);
  };

  bool make_leaf = n <= kLeafSize || ext[axis] <= 0.0 || depth >= kMaxDepth;
  int64_t mid = -1;
  if (!make_leaf) {
    // Binned SAH along the widest centroid axis.
    double c_lo = axis == 0 ? cbox.lo.x : (axis == 1 ? cbox.lo.y : cbox.lo.z);
    double scale = kBins / ext[axis];
    AABB bin_box[kBins];
    int64_t bin_n[kBins] = {0};
    for (int64_t i = lo; i < hi; ++i) {
      int b = std::min<int>(kBins - 1,
                            static_cast<int>((centroid_on(prims[i]) - c_lo) * scale));
      bin_box[b].grow(prims[i].box);
      bin_n[b]++;
    }
    double right_area[kBins];
    AABB acc;
    for (int b = kBins - 1; b > 0; --b) {
      acc.grow(bin_box[b]);
      right_area[b] = acc.half_area();
    }
    double best_cost = kInf;
    int best_split = -1;
    acc = AABB();
    int64_t left_n = 0;
    for (int b = 0; b < kBins - 1; ++b) {
      acc.grow(bin_box[b]);
      left_n += bin_n[b];
      int64_t right_n = n - left_n;
      if (left_n == 0 || right_n == 0) continue;
      double cost = acc.half_area() * left_n + right_area[b + 1] * right_n;
      if (cost < best_cost) {
        best_cost = cost;
        best_split = b;
      }
    }
    if (best_split < 0) {
      // All centroids in one bin: median split keeps the tree balanced.
      mid = lo + n / 2;
      std::nth_element(prims.begin() + lo, prims.begin() + mid,
                       prims.begin() + hi,
                       [&](const BuildPrim &a, const BuildPrim &b) {
                         return centroid_on(a) < centroid_on(b);
                       });
    } else {
      double split_pos = c_lo + (best_split + 1) / scale;
      auto it = std::partition(prims.begin() + lo, prims.begin() + hi,
                               [&](const BuildPrim &p) {
                                 return centroid_on(p) < split_pos;
                               });
      mid = it - prims.begin();
      if (mid == lo || mid == hi) mid = lo + n / 2;  // numerical edge
    }
  }

  if (make_leaf) {
    Node &nd = bvh.nodes[node_id];
    nd.start = static_cast<int64_t>(bvh.face_of.size());
    nd.count = n;
    for (int64_t i = lo; i < hi; ++i) bvh.face_of.push_back(prims[i].face);
    return node_id;
  }

  bvh.nodes[node_id].axis = axis;
  build_node(bvh, prims, lo, mid, depth + 1);  // left lands at node_id + 1
  int64_t right = build_node(bvh, prims, mid, hi, depth + 1);
  bvh.nodes[node_id].right_child = right;
  return node_id;
}

// One slab axis: tighten [tmin, tmax] by this axis's entry/exit interval.
// NaN guard: with d==0 the products are 0 * inf = NaN exactly when the
// origin sits ON a slab bound — i.e. the origin is inside the closed slab
// and the ray never leaves it, so the axis imposes no constraint. Without
// the guard the NaN poisons the min/max chain and silently prunes the node
// (a false miss the brute-force oracle does not produce).
static inline void slab_axis(double lo, double hi, double o, double inv,
                             double &tmin, double &tmax) {
  double t0 = (lo - o) * inv, t1 = (hi - o) * inv;
  if (std::isnan(t0) || std::isnan(t1)) return;
  tmin = std::max(tmin, std::min(t0, t1));
  tmax = std::min(tmax, std::max(t0, t1));
}

// Slab test: should the ray visit box b given the current best hit t_cap?
// Non-strict tmin <= t_cap so exact-t ties in a farther box are still
// visited (the lowest-face-index tie-break reproduces numpy argmin).
static inline bool box_visit(const AABB &b, const Vec3 &o, const Vec3 &inv_d,
                             double t_cap) {
  double tmin = -kInf, tmax = kInf;
  slab_axis(b.lo.x, b.hi.x, o.x, inv_d.x, tmin, tmax);
  slab_axis(b.lo.y, b.hi.y, o.y, inv_d.y, tmin, tmax);
  slab_axis(b.lo.z, b.hi.z, o.z, inv_d.z, tmin, tmax);
  // Relative slack on the cap: the slab tmin and the Moller-Trumbore t round
  // independently (a ray through a vertex on a box face can give tmin
  // exactly 2.0 with best_t one ulp below), and a tied lower-index face
  // behind that plane must still be visited for the argmin tie-break to
  // reproduce the numpy oracle. ~450 ulps of slack is geometrically nothing
  // and only admits a handful of extra box visits.
  return tmax >= std::max(tmin, 0.0) && tmin <= t_cap * (1.0 + 1e-13);
}

}  // namespace

extern "C" {

void *bvh_create(int64_t F, const double *tris) {
  if (F <= 0) return nullptr;
  auto *bvh = new BVH();
  std::vector<BuildPrim> prims(F);
  std::vector<Vec3> tv0(F), te1(F), te2(F);
  for (int64_t f = 0; f < F; ++f) {
    Vec3 a{tris[9 * f + 0], tris[9 * f + 1], tris[9 * f + 2]};
    Vec3 b{tris[9 * f + 3], tris[9 * f + 4], tris[9 * f + 5]};
    Vec3 c{tris[9 * f + 6], tris[9 * f + 7], tris[9 * f + 8]};
    tv0[f] = a;
    te1[f] = sub(b, a);
    te2[f] = sub(c, a);
    AABB box;
    box.grow(a);
    box.grow(b);
    box.grow(c);
    prims[f].box = box;
    prims[f].centroid = {(box.lo.x + box.hi.x) * 0.5,
                         (box.lo.y + box.hi.y) * 0.5,
                         (box.lo.z + box.hi.z) * 0.5};
    prims[f].face = f;
  }
  bvh->nodes.reserve(2 * F);
  bvh->face_of.reserve(F);
  build_node(*bvh, prims, 0, F);
  bvh->v0.resize(F);
  bvh->e1.resize(F);
  bvh->e2.resize(F);
  for (int64_t i = 0; i < F; ++i) {
    int64_t f = bvh->face_of[i];
    bvh->v0[i] = tv0[f];
    bvh->e1[i] = te1[f];
    bvh->e2[i] = te2[f];
  }
  return bvh;
}

void bvh_destroy(void *handle) { delete static_cast<BVH *>(handle); }

void bvh_trace(const void *handle, int64_t R, const double *origins,
               const double *dirs, double t_eps, double b_eps, double det_eps,
               double *out_t, int32_t *out_f, double *out_uv) {
  const BVH &bvh = *static_cast<const BVH *>(handle);
  const Node *nodes = bvh.nodes.data();

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 64)
#endif
  for (int64_t r = 0; r < R; ++r) {
    Vec3 o{origins[3 * r], origins[3 * r + 1], origins[3 * r + 2]};
    Vec3 d{dirs[3 * r], dirs[3 * r + 1], dirs[3 * r + 2]};
    // IEEE 1/0 = inf makes the slab test handle axis-parallel rays.
    Vec3 inv_d{1.0 / d.x, 1.0 / d.y, 1.0 / d.z};
    double best_t = kInf, best_u = 0.0, best_v = 0.0;
    int64_t best_f = -1;

    int64_t stack[128];
    int sp = 0;
    stack[sp++] = 0;
    while (sp > 0) {
      const Node &nd = nodes[stack[--sp]];
      if (!box_visit(nd.box, o, inv_d, best_t)) continue;
      if (nd.count > 0) {
        for (int64_t i = nd.start; i < nd.start + nd.count; ++i) {
          const Vec3 &e2v = bvh.e2[i];
          Vec3 pvec = cross(d, e2v);
          double det = dot(bvh.e1[i], pvec);
          if (std::fabs(det) <= det_eps) continue;
          double inv_det = 1.0 / det;
          Vec3 tvec = sub(o, bvh.v0[i]);
          double u = dot(tvec, pvec) * inv_det;
          if (!(u >= -b_eps)) continue;
          Vec3 qvec = cross(tvec, bvh.e1[i]);
          double v = dot(d, qvec) * inv_det;
          if (!(v >= -b_eps) || !(u + v <= 1.0 + b_eps)) continue;
          double t = dot(e2v, qvec) * inv_det;
          if (!(t > t_eps)) continue;
          int64_t f = bvh.face_of[i];
          if (t < best_t || (t == best_t && f < best_f)) {
            best_t = t;
            best_u = u;
            best_v = v;
            best_f = f;
          }
        }
      } else {
        // Near child first (by ray direction sign on the split axis) so the
        // best_t cap tightens as early as possible. The stack bounds the
        // tree depth; 128 is far beyond any SAH/median tree at leaf size 4.
        double dc = nd.axis == 0 ? d.x : (nd.axis == 1 ? d.y : d.z);
        int64_t left = (&nd - nodes) + 1, right = nd.right_child;
        stack[sp++] = dc >= 0.0 ? right : left;   // far
        stack[sp++] = dc >= 0.0 ? left : right;   // near (popped first)
      }
    }
    out_t[r] = best_t;
    out_f[r] = static_cast<int32_t>(best_f);
    out_uv[2 * r] = best_u;
    out_uv[2 * r + 1] = best_v;
  }
}

}  // extern "C"
