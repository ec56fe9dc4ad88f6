// Native rigid-body dynamics oracle.
//
// Independent C++ implementation of RNEA / mass matrix (CRBA-style) /
// forward kinematics for fixed-base revolute-joint serial chains. Plays
// the role Pinocchio plays for the reference's test suite (the numerical
// oracle the JAX kernels are validated against): a second, independently
// written implementation of the same algorithms, exercised through ctypes
// from tests/test_native_oracle.py.
//
// Spatial vectors are [linear; angular] (Pinocchio convention), matching
// aslr_to_tpu/ops/rigid_body.py's documented semantics but implemented
// with classic per-joint recursion and explicit composite rigid bodies
// rather than unit-acceleration RNEA columns.
//
// Build: g++ -O2 -shared -fPIC -o librbd_oracle.so rbd_oracle.cpp

#include <cmath>
#include <cstring>

namespace {

struct Vec3 {
  double x[3];
};

struct Mat3 {
  double m[9];  // row-major
};

Vec3 vadd(const Vec3& a, const Vec3& b) { return {{a.x[0] + b.x[0], a.x[1] + b.x[1], a.x[2] + b.x[2]}}; }
Vec3 vsub(const Vec3& a, const Vec3& b) { return {{a.x[0] - b.x[0], a.x[1] - b.x[1], a.x[2] - b.x[2]}}; }
Vec3 vscale(double s, const Vec3& a) { return {{s * a.x[0], s * a.x[1], s * a.x[2]}}; }
double vdot(const Vec3& a, const Vec3& b) { return a.x[0] * b.x[0] + a.x[1] * b.x[1] + a.x[2] * b.x[2]; }

Vec3 cross(const Vec3& a, const Vec3& b) {
  return {{a.x[1] * b.x[2] - a.x[2] * b.x[1],
           a.x[2] * b.x[0] - a.x[0] * b.x[2],
           a.x[0] * b.x[1] - a.x[1] * b.x[0]}};
}

Mat3 mmul(const Mat3& a, const Mat3& b) {
  Mat3 r{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += a.m[3 * i + k] * b.m[3 * k + j];
      r.m[3 * i + j] = s;
    }
  return r;
}

Vec3 mvec(const Mat3& a, const Vec3& v) {
  Vec3 r{};
  for (int i = 0; i < 3; ++i)
    r.x[i] = a.m[3 * i + 0] * v.x[0] + a.m[3 * i + 1] * v.x[1] + a.m[3 * i + 2] * v.x[2];
  return r;
}

Vec3 mtvec(const Mat3& a, const Vec3& v) {  // transpose apply
  Vec3 r{};
  for (int i = 0; i < 3; ++i)
    r.x[i] = a.m[0 + i] * v.x[0] + a.m[3 + i] * v.x[1] + a.m[6 + i] * v.x[2];
  return r;
}

// Rodrigues rotation about unit axis by angle.
Mat3 axis_angle(const Vec3& a, double t) {
  const double c = std::cos(t), s = std::sin(t), C = 1.0 - c;
  const double x = a.x[0], y = a.x[1], z = a.x[2];
  return {{c + x * x * C, x * y * C - z * s, x * z * C + y * s,
           y * x * C + z * s, c + y * y * C, y * z * C - x * s,
           z * x * C - y * s, z * y * C + x * s, c + z * z * C}};
}

struct Model {
  int nj;
  const double* joint_rot;  // [nj*9]
  const double* joint_pos;  // [nj*3]
  const double* axis;       // [nj*3]
  const double* mass;       // [nj]
  const double* com;        // [nj*3]
  const double* inertia;    // [nj*9] about CoM, link frame
  const double* gravity;    // [3]
};

Mat3 jrot(const Model& m, int i) {
  Mat3 r;
  std::memcpy(r.m, m.joint_rot + 9 * i, 9 * sizeof(double));
  return r;
}

Vec3 jpos(const Model& m, int i) { return {{m.joint_pos[3 * i], m.joint_pos[3 * i + 1], m.joint_pos[3 * i + 2]}}; }
Vec3 jaxis(const Model& m, int i) { return {{m.axis[3 * i], m.axis[3 * i + 1], m.axis[3 * i + 2]}}; }
Vec3 jcom(const Model& m, int i) { return {{m.com[3 * i], m.com[3 * i + 1], m.com[3 * i + 2]}}; }

Mat3 jinertia(const Model& m, int i) {
  Mat3 r;
  std::memcpy(r.m, m.inertia + 9 * i, 9 * sizeof(double));
  return r;
}

// spatial momentum of body i for local motion (v, w)
void apply_inertia(const Model& mdl, int i, const Vec3& v, const Vec3& w, Vec3* h_lin, Vec3* h_ang) {
  const double mi = mdl.mass[i];
  const Vec3 c = jcom(mdl, i);
  *h_lin = vscale(mi, vadd(v, cross(w, c)));
  // h_ang = m c x v + (I_c - m [c]x[c]x) w ; compute via c x (m(v + w x c)) + I_c w
  const Vec3 Icw = mvec(jinertia(mdl, i), w);
  *h_ang = vadd(Icw, cross(c, *h_lin));
}

// RNEA in local frames, [linear; angular] vectors.
void rnea_impl(const Model& mdl, const double* q, const double* qd, const double* qdd,
               bool with_gravity, double* tau) {
  const int nj = mdl.nj;
  constexpr int MAXJ = 32;
  Mat3 E[MAXJ];
  Vec3 p[MAXJ], v[MAXJ], w[MAXJ], a[MAXJ], al[MAXJ], f[MAXJ], t[MAXJ];

  for (int i = 0; i < nj; ++i) {
    E[i] = mmul(jrot(mdl, i), axis_angle(jaxis(mdl, i), q[i]));
    p[i] = jpos(mdl, i);

    Vec3 vp{}, wp{}, ap{}, alp{};
    if (i == 0) {
      if (with_gravity) ap = vscale(-1.0, {{mdl.gravity[0], mdl.gravity[1], mdl.gravity[2]}});
    } else {
      vp = v[i - 1]; wp = w[i - 1]; ap = a[i - 1]; alp = al[i - 1];
    }

    // transform parent motion into frame i
    const Vec3 vi = mtvec(E[i], vadd(vp, cross(wp, p[i])));
    const Vec3 wi = mtvec(E[i], wp);
    const Vec3 ai = mtvec(E[i], vadd(ap, cross(alp, p[i])));
    const Vec3 ali = mtvec(E[i], alp);

    const Vec3 wJ = vscale(qd[i], jaxis(mdl, i));
    const Vec3 aJ = vscale(qdd[i], jaxis(mdl, i));

    v[i] = vi;
    w[i] = vadd(wi, wJ);
    // velocity-product term (v_i, w_i) x (0, wJ): linear v x wJ, angular w x wJ
    a[i] = vadd(ai, cross(v[i], wJ));
    al[i] = vadd(vadd(ali, aJ), cross(w[i], wJ));

    Vec3 h_lin, h_ang, ha_lin, ha_ang;
    apply_inertia(mdl, i, v[i], w[i], &h_lin, &h_ang);
    apply_inertia(mdl, i, a[i], al[i], &ha_lin, &ha_ang);
    // f = I a + v xf (I v): xf: (w x f_lin, w x tau + v x f_lin)
    f[i] = vadd(ha_lin, cross(w[i], h_lin));
    t[i] = vadd(ha_ang, vadd(cross(w[i], h_ang), cross(v[i], h_lin)));
  }

  for (int i = nj - 1; i >= 0; --i) {
    tau[i] = vdot(jaxis(mdl, i), t[i]);
    if (i > 0) {
      const Vec3 fp = mvec(E[i], f[i]);
      const Vec3 tp = vadd(mvec(E[i], t[i]), cross(p[i], fp));
      f[i - 1] = vadd(f[i - 1], fp);
      t[i - 1] = vadd(t[i - 1], tp);
    }
  }
}

}  // namespace

extern "C" {

void rbd_rnea(int nj, const double* joint_rot, const double* joint_pos, const double* axis,
              const double* mass, const double* com, const double* inertia, const double* gravity,
              const double* q, const double* qd, const double* qdd, int with_gravity, double* tau) {
  Model m{nj, joint_rot, joint_pos, axis, mass, com, inertia, gravity};
  rnea_impl(m, q, qd, qdd, with_gravity != 0, tau);
}

// Mass matrix via nj unit-acceleration inverse-dynamics columns with
// gravity off (equivalent to CRBA for these chains).
void rbd_mass_matrix(int nj, const double* joint_rot, const double* joint_pos, const double* axis,
                     const double* mass, const double* com, const double* inertia,
                     const double* gravity, const double* q, double* M) {
  Model m{nj, joint_rot, joint_pos, axis, mass, com, inertia, gravity};
  constexpr int MAXJ = 32;
  double qd[MAXJ] = {0}, qdd[MAXJ] = {0}, col[MAXJ];
  for (int j = 0; j < nj; ++j) {
    qdd[j] = 1.0;
    rnea_impl(m, q, qd, qdd, false, col);
    qdd[j] = 0.0;
    for (int i = 0; i < nj; ++i) M[i * nj + j] = col[i];
  }
}

// World placements of all joint frames: rots [nj*9], trans [nj*3].
void rbd_fk(int nj, const double* joint_rot, const double* joint_pos, const double* axis,
            const double* q, double* rots, double* trans) {
  Mat3 R_prev{};
  Vec3 p_prev{};
  for (int i = 0; i < nj; ++i) {
    Model m{nj, joint_rot, joint_pos, axis, nullptr, nullptr, nullptr, nullptr};
    Mat3 E = mmul(jrot(m, i), axis_angle(jaxis(m, i), q[i]));
    Vec3 p = jpos(m, i);
    Mat3 Rw;
    Vec3 pw;
    if (i == 0) {
      Rw = E;
      pw = p;
    } else {
      Rw = mmul(R_prev, E);
      pw = vadd(mvec(R_prev, p), p_prev);
    }
    std::memcpy(rots + 9 * i, Rw.m, 9 * sizeof(double));
    std::memcpy(trans + 3 * i, pw.x, 3 * sizeof(double));
    R_prev = Rw;
    p_prev = pw;
  }
}

}  // extern "C"
