// geomcore — native host collision oracle for serial-chain robots.
//
// Plays the role PyBullet's C++ engine plays in the reference
// (environment/kuka_env.py:354-411): fast per-call forward kinematics +
// narrow-phase collision for host-side planners (BIT*, RRT*, LazySP) whose
// control flow issues many small sequential queries where a device round
// trip per query would dominate. The math mirrors the JAX kernels exactly:
// Rodrigues-rotation FK over a kinematic tree (envs/kinematics.py) and the
// exact convex piecewise-quadratic segment-AABB distance
// (envs/geometry.py::seg_box_sq_dist), so host and device oracles agree.
//
// C ABI (ctypes): see runtime/geomcore.py.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
};

static inline Vec3 operator+(Vec3 a, Vec3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline Vec3 operator-(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline Vec3 operator*(double s, Vec3 a) { return {s * a.x, s * a.y, s * a.z}; }

struct Mat3 {
  double m[9];
  Vec3 apply(Vec3 v) const {
    return {m[0] * v.x + m[1] * v.y + m[2] * v.z,
            m[3] * v.x + m[4] * v.y + m[5] * v.z,
            m[6] * v.x + m[7] * v.y + m[8] * v.z};
  }
  Mat3 mul(const Mat3& o) const {
    Mat3 r{};
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) {
        double s = 0;
        for (int k = 0; k < 3; ++k) s += m[3 * i + k] * o.m[3 * k + j];
        r.m[3 * i + j] = s;
      }
    return r;
  }
};

static Mat3 axis_angle(Vec3 u, double a) {
  double c = std::cos(a), s = std::sin(a), C = 1 - c;
  return {{u.x * u.x * C + c, u.x * u.y * C - u.z * s, u.x * u.z * C + u.y * s,
           u.y * u.x * C + u.z * s, u.y * u.y * C + c, u.y * u.z * C - u.x * s,
           u.z * u.x * C - u.y * s, u.z * u.y * C + u.x * s, u.z * u.z * C + c}};
}

// Robot model: kinematic tree (topo order) + capsules, mirrors ChainParams.
struct Chain {
  int n_joints = 0;
  int n_caps = 0;
  int dof = 0;
  std::vector<Mat3> origin_rot;
  std::vector<Vec3> origin_trans;
  std::vector<Vec3> axis;
  std::vector<int> q_index;
  std::vector<int> parent_frame;
  std::vector<int> cap_link;
  std::vector<Vec3> cap_p0, cap_p1;
  std::vector<double> cap_r;
  std::vector<double> lower, upper;
  double rrt_eps = 0.5;
  // scratch
  mutable std::vector<Mat3> R;
  mutable std::vector<Vec3> t;
};

struct Scene {
  std::vector<Vec3> centers;
  std::vector<Vec3> halfs;
};

static std::vector<Chain*> g_chains;
static std::vector<Scene*> g_scenes;

// exact min squared distance between segment [p0,p1] and AABB (center, half)
static double seg_box_sq_dist(Vec3 p0, Vec3 p1, Vec3 c, Vec3 h) {
  const double u[3] = {p0.x - c.x, p0.y - c.y, p0.z - c.z};
  const double v[3] = {p1.x - p0.x, p1.y - p0.y, p1.z - p0.z};
  const double hh[3] = {h.x, h.y, h.z};

  double cand[8] = {0.0, 1.0};
  int n_cand = 2;
  for (int i = 0; i < 3; ++i) {
    if (std::fabs(v[i]) > 1e-12) {
      cand[n_cand++] = std::clamp((hh[i] - u[i]) / v[i], 0.0, 1.0);
      cand[n_cand++] = std::clamp((-hh[i] - u[i]) / v[i], 0.0, 1.0);
    }
  }
  std::sort(cand, cand + n_cand);

  auto f = [&](double s) {
    double d2 = 0;
    for (int i = 0; i < 3; ++i) {
      double p = u[i] + s * v[i];
      double d = std::max(std::fabs(p) - hh[i], 0.0);
      d2 += d * d;
    }
    return d2;
  };

  double best = f(cand[0]);
  for (int k = 1; k < n_cand; ++k) best = std::min(best, f(cand[k]));
  // per-interval quadratic vertex with the midpoint's active set
  for (int k = 0; k + 1 < n_cand; ++k) {
    double a = cand[k], b = cand[k + 1];
    if (b - a < 1e-15) continue;
    double m = 0.5 * (a + b);
    double num = 0, den = 0;
    for (int i = 0; i < 3; ++i) {
      double w = u[i] + m * v[i];
      if (std::fabs(w) > hh[i]) {
        double sgn = w > 0 ? 1.0 : -1.0;
        double alpha = sgn * v[i];
        double beta = sgn * u[i] - hh[i];
        num += alpha * beta;
        den += alpha * alpha;
      }
    }
    if (den > 1e-15) {
      double ts = std::clamp(-num / den, a, b);
      best = std::min(best, f(ts));
    }
  }
  return best;
}

static inline double dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }

// min squared distance between two segments — same closed form (and the
// same always-recompute-s quirk) as envs/geometry.py::seg_seg_sq_dist so
// host and device dual-arm oracles agree
static double seg_seg_sq_dist(Vec3 p0, Vec3 p1, Vec3 q0, Vec3 q1) {
  const double eps = 1e-12;
  Vec3 d1 = p1 - p0, d2 = q1 - q0, r = p0 - q0;
  double a = dot(d1, d1), e = dot(d2, d2), f = dot(d2, r);
  double c = dot(d1, r), b = dot(d1, d2);
  double denom = a * e - b * b;
  double s = denom > eps ? std::clamp((b * f - c * e) / denom, 0.0, 1.0) : 0.0;
  double t = e > eps ? (b * s + f) / e : 0.0;
  double t_cl = std::clamp(t, 0.0, 1.0);
  s = a > eps ? std::clamp((b * t_cl - c) / a, 0.0, 1.0) : 0.0;
  Vec3 cp = p0 + s * d1;
  Vec3 cq = q0 + t_cl * d2;
  Vec3 diff = cp - cq;
  return dot(diff, diff);
}

// Dual-arm robot: the same chain instantiated at two base translations
// (envs/kuka2.py::dual_state_free) — box contact over both arms' capsules
// plus cross-arm capsule-capsule contact.
struct Dual {
  const Chain* ch;
  Vec3 b1, b2;
  mutable std::vector<Vec3> pa0, pa1, pb0, pb1;  // world capsule segments
};

static std::vector<Dual*> g_duals;

static void fk(const Chain& ch, const double* q);

static void dual_capsules(const Dual& du, const double* q) {
  const Chain& ch = *du.ch;
  du.pa0.resize(ch.n_caps);
  du.pa1.resize(ch.n_caps);
  du.pb0.resize(ch.n_caps);
  du.pb1.resize(ch.n_caps);
  fk(ch, q);
  for (int c = 0; c < ch.n_caps; ++c) {
    int L = ch.cap_link[c];
    du.pa0[c] = ch.R[L].apply(ch.cap_p0[c]) + ch.t[L] + du.b1;
    du.pa1[c] = ch.R[L].apply(ch.cap_p1[c]) + ch.t[L] + du.b1;
  }
  fk(ch, q + ch.dof);
  for (int c = 0; c < ch.n_caps; ++c) {
    int L = ch.cap_link[c];
    du.pb0[c] = ch.R[L].apply(ch.cap_p0[c]) + ch.t[L] + du.b2;
    du.pb1[c] = ch.R[L].apply(ch.cap_p1[c]) + ch.t[L] + du.b2;
  }
}

static bool dual_contact(const Dual& du, const Scene& sc, const double* q) {
  const Chain& ch = *du.ch;
  dual_capsules(du, q);
  for (int c = 0; c < ch.n_caps; ++c) {
    double r2 = ch.cap_r[c] * ch.cap_r[c];
    for (size_t b = 0; b < sc.centers.size(); ++b) {
      if (seg_box_sq_dist(du.pa0[c], du.pa1[c], sc.centers[b], sc.halfs[b]) < r2)
        return true;
      if (seg_box_sq_dist(du.pb0[c], du.pb1[c], sc.centers[b], sc.halfs[b]) < r2)
        return true;
    }
  }
  for (int i = 0; i < ch.n_caps; ++i)
    for (int j = 0; j < ch.n_caps; ++j) {
      double rr = ch.cap_r[i] + ch.cap_r[j];
      if (seg_seg_sq_dist(du.pa0[i], du.pa1[i], du.pb0[j], du.pb1[j]) < rr * rr)
        return true;
    }
  return false;
}

static bool dual_valid(const Dual& du, const double* q) {
  const Chain& ch = *du.ch;
  for (int i = 0; i < ch.dof; ++i) {
    if (q[i] < ch.lower[i] || q[i] > ch.upper[i]) return false;
    if (q[ch.dof + i] < ch.lower[i] || q[ch.dof + i] > ch.upper[i]) return false;
  }
  return true;
}

static void fk(const Chain& ch, const double* q) {
  ch.R.resize(ch.n_joints + 1);
  ch.t.resize(ch.n_joints + 1);
  ch.R[0] = {{1, 0, 0, 0, 1, 0, 0, 0, 1}};
  ch.t[0] = {0, 0, 0};
  for (int j = 0; j < ch.n_joints; ++j) {
    int pf = ch.parent_frame[j];
    double angle = ch.q_index[j] >= 0 ? q[ch.q_index[j]] : 0.0;
    Mat3 Rq = axis_angle(ch.axis[j], angle);
    ch.R[j + 1] = ch.R[pf].mul(ch.origin_rot[j]).mul(Rq);
    ch.t[j + 1] = ch.R[pf].apply(ch.origin_trans[j]) + ch.t[pf];
  }
}

static bool state_contact(const Chain& ch, const Scene& sc, const double* q) {
  fk(ch, q);
  for (int cI = 0; cI < ch.n_caps; ++cI) {
    int L = ch.cap_link[cI];
    Vec3 p0 = ch.R[L].apply(ch.cap_p0[cI]) + ch.t[L];
    Vec3 p1 = ch.R[L].apply(ch.cap_p1[cI]) + ch.t[L];
    double r2 = ch.cap_r[cI] * ch.cap_r[cI];
    for (size_t b = 0; b < sc.centers.size(); ++b) {
      if (seg_box_sq_dist(p0, p1, sc.centers[b], sc.halfs[b]) < r2) return true;
    }
  }
  return false;
}

static bool valid(const Chain& ch, const double* q) {
  for (int i = 0; i < ch.dof; ++i)
    if (q[i] < ch.lower[i] || q[i] > ch.upper[i]) return false;
  return true;
}

}  // namespace

extern "C" {

// Create a chain. Arrays are row-major doubles / int32 as noted.
int64_t geom_new_chain(int n_joints, int n_caps, int dof,
                       const double* origin_rot,    // (J, 9)
                       const double* origin_trans,  // (J, 3)
                       const double* axis,          // (J, 3)
                       const int32_t* q_index,      // (J,)
                       const int32_t* parent_frame, // (J,)
                       const int32_t* cap_link,     // (C,)
                       const double* cap_p0,        // (C, 3)
                       const double* cap_p1,        // (C, 3)
                       const double* cap_r,         // (C,)
                       const double* lower,         // (dof,)
                       const double* upper,         // (dof,)
                       double rrt_eps) {
  auto* ch = new Chain();
  ch->n_joints = n_joints;
  ch->n_caps = n_caps;
  ch->dof = dof;
  ch->rrt_eps = rrt_eps;
  for (int j = 0; j < n_joints; ++j) {
    Mat3 m{};
    std::memcpy(m.m, origin_rot + 9 * j, 9 * sizeof(double));
    ch->origin_rot.push_back(m);
    ch->origin_trans.push_back({origin_trans[3 * j], origin_trans[3 * j + 1], origin_trans[3 * j + 2]});
    ch->axis.push_back({axis[3 * j], axis[3 * j + 1], axis[3 * j + 2]});
    ch->q_index.push_back(q_index[j]);
    ch->parent_frame.push_back(parent_frame[j]);
  }
  for (int c = 0; c < n_caps; ++c) {
    ch->cap_link.push_back(cap_link[c]);
    ch->cap_p0.push_back({cap_p0[3 * c], cap_p0[3 * c + 1], cap_p0[3 * c + 2]});
    ch->cap_p1.push_back({cap_p1[3 * c], cap_p1[3 * c + 1], cap_p1[3 * c + 2]});
    ch->cap_r.push_back(cap_r[c]);
  }
  ch->lower.assign(lower, lower + dof);
  ch->upper.assign(upper, upper + dof);
  g_chains.push_back(ch);
  return (int64_t)(g_chains.size() - 1);
}

int64_t geom_new_scene(int n_boxes, const double* centers, const double* halfs) {
  auto* sc = new Scene();
  for (int b = 0; b < n_boxes; ++b) {
    sc->centers.push_back({centers[3 * b], centers[3 * b + 1], centers[3 * b + 2]});
    sc->halfs.push_back({halfs[3 * b], halfs[3 * b + 1], halfs[3 * b + 2]});
  }
  g_scenes.push_back(sc);
  return (int64_t)(g_scenes.size() - 1);
}

void geom_free_chain(int64_t handle) {
  // only free a chain after every Dual referencing it is freed (the Python
  // wrappers guarantee this: GeomDual frees its dual handle before its
  // owned GeomChain is collected)
  if (handle >= 0 && handle < (int64_t)g_chains.size() && g_chains[handle]) {
    delete g_chains[handle];
    g_chains[handle] = nullptr;
  }
}

void geom_free_dual(int64_t handle) {
  if (handle >= 0 && handle < (int64_t)g_duals.size() && g_duals[handle]) {
    delete g_duals[handle];
    g_duals[handle] = nullptr;
  }
}

void geom_free_scene(int64_t handle) {
  if (handle >= 0 && handle < (int64_t)g_scenes.size() && g_scenes[handle]) {
    delete g_scenes[handle];
    g_scenes[handle] = nullptr;
  }
}

// (free?, n_checks) for a batch of configurations.
void geom_states_free(int64_t chain_h, int64_t scene_h, const double* qs, int n,
                      uint8_t* free_out, int32_t* count_out) {
  const Chain& ch = *g_chains[chain_h];
  const Scene& sc = *g_scenes[scene_h];
  for (int i = 0; i < n; ++i) {
    const double* q = qs + i * ch.dof;
    if (!valid(ch, q)) {
      free_out[i] = 0;
      count_out[i] = 0;
      continue;
    }
    count_out[i] = 1;
    free_out[i] = state_contact(ch, sc, q) ? 0 : 1;
  }
}

// Reference kuka edge rule: endpoints + K = int(d/eps) interior from k=0,
// short-circuiting; returns (free?, n_checks).
void geom_edge_free(int64_t chain_h, int64_t scene_h, const double* qa,
                    const double* qb, uint8_t* free_out, int32_t* count_out) {
  const Chain& ch = *g_chains[chain_h];
  const Scene& sc = *g_scenes[scene_h];
  *free_out = 0;
  *count_out = 0;
  if (!valid(ch, qa) || !valid(ch, qb)) return;
  *count_out = 1;
  if (state_contact(ch, sc, qa)) return;
  *count_out = 2;
  if (state_contact(ch, sc, qb)) return;

  double d2 = 0;
  for (int i = 0; i < ch.dof; ++i) {
    double diff = qb[i] - qa[i];
    d2 += diff * diff;
  }
  int K = (int)(std::sqrt(d2) / ch.rrt_eps);
  std::vector<double> c(ch.dof);
  for (int k = 0; k < K; ++k) {
    for (int i = 0; i < ch.dof; ++i)
      c[i] = qa[i] + (double)k / K * (qb[i] - qa[i]);
    ++*count_out;
    if (state_contact(ch, sc, c.data())) return;
  }
  *free_out = 1;
}

// Dual-arm variants (kuka14): chain_h must refer to a live single chain.
int64_t geom_new_dual(int64_t chain_h, const double* base1, const double* base2) {
  auto* du = new Dual();
  du->ch = g_chains[chain_h];
  du->b1 = {base1[0], base1[1], base1[2]};
  du->b2 = {base2[0], base2[1], base2[2]};
  g_duals.push_back(du);
  return (int64_t)(g_duals.size() - 1);
}

void geom_dual_states_free(int64_t dual_h, int64_t scene_h, const double* qs,
                           int n, uint8_t* free_out, int32_t* count_out) {
  const Dual& du = *g_duals[dual_h];
  const Scene& sc = *g_scenes[scene_h];
  int dof2 = 2 * du.ch->dof;
  for (int i = 0; i < n; ++i) {
    const double* q = qs + i * dof2;
    if (!dual_valid(du, q)) {
      free_out[i] = 0;
      count_out[i] = 0;
      continue;
    }
    count_out[i] = 1;
    free_out[i] = dual_contact(du, sc, q) ? 0 : 1;
  }
}

void geom_dual_edge_free(int64_t dual_h, int64_t scene_h, const double* qa,
                         const double* qb, uint8_t* free_out,
                         int32_t* count_out) {
  const Dual& du = *g_duals[dual_h];
  const Scene& sc = *g_scenes[scene_h];
  int dof2 = 2 * du.ch->dof;
  *free_out = 0;
  *count_out = 0;
  if (!dual_valid(du, qa) || !dual_valid(du, qb)) return;
  *count_out = 1;
  if (dual_contact(du, sc, qa)) return;
  *count_out = 2;
  if (dual_contact(du, sc, qb)) return;

  double d2 = 0;
  for (int i = 0; i < dof2; ++i) {
    double diff = qb[i] - qa[i];
    d2 += diff * diff;
  }
  int K = (int)(std::sqrt(d2) / du.ch->rrt_eps);
  std::vector<double> c(dof2);
  for (int k = 0; k < K; ++k) {
    for (int i = 0; i < dof2; ++i)
      c[i] = qa[i] + (double)k / K * (qb[i] - qa[i]);
    ++*count_out;
    if (dual_contact(du, sc, c.data())) return;
  }
  *free_out = 1;
}

}  // extern "C"
