"""Lane-layout rigid-body dynamics: scalar-graph kernels over batch lanes.

The generic kernels in :mod:`.rigid_body` operate on per-sample [3]/[3,3]
arrays; under an outer vmap XLA lays the small dims on sublane x lane tiles
and wastes ~16-32x of the vector unit. This module re-expresses the same
algorithms as *scalar graphs*: every 3-vector is a tuple of three [NB]
arrays (the batch on the vector lanes), every matrix a 3-tuple of rows, so
each arithmetic op is a full-width VPU instruction. This is the layout the
Pallas solver kernels (:mod:`..pallas`) run internally — and the functions
here are plain JAX, so they trace inside Pallas kernel bodies and
differentiate with ``jax.jvp`` (used for the in-kernel RNEA partials).

Robot parameters are baked in as Python floats at trace time (the chain
topology is static anyway), mirroring how the reference's C++ dynamics
specialize on the loaded model.

Validated against :mod:`.rigid_body` in tests/test_lanes.py.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# -- tuple-of-lanes linear algebra ------------------------------------------

def v3(x, y, z):
    return (x, y, z)


def v_const(c, like):
    return tuple(jnp.full_like(like, float(ci)) for ci in c)


def v_zero(like):
    z = jnp.zeros_like(like)
    return (z, z, z)


def v_add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def v_sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def v_scale(s, a):
    return (s * a[0], s * a[1], s * a[2])


def v_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def v_cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def m_const(M, like):
    M = np.asarray(M, dtype=np.float64)
    return tuple(v_const(M[i], like) for i in range(3))


def m_vec(A, v):
    """A @ v (rows A[i] are lane Vec3s)."""
    return (v_dot(A[0], v), v_dot(A[1], v), v_dot(A[2], v))


def m_t_vec(A, v):
    """A^T @ v."""
    return (
        A[0][0] * v[0] + A[1][0] * v[1] + A[2][0] * v[2],
        A[0][1] * v[0] + A[1][1] * v[1] + A[2][1] * v[2],
        A[0][2] * v[0] + A[1][2] * v[1] + A[2][2] * v[2],
    )


def m_mul(A, B):
    """A @ B."""
    Bt = ((B[0][0], B[1][0], B[2][0]), (B[0][1], B[1][1], B[2][1]), (B[0][2], B[1][2], B[2][2]))
    return tuple(tuple(v_dot(A[i], Bt[j]) for j in range(3)) for i in range(3))


def rot_axis_angle(axis, q):
    """Rodrigues rotation about a constant unit axis by lane angles q."""
    ax, ay, az = float(axis[0]), float(axis[1]), float(axis[2])
    c, s = jnp.cos(q), jnp.sin(q)
    C = 1.0 - c
    return (
        (c + ax * ax * C, ax * ay * C - az * s, ax * az * C + ay * s),
        (ay * ax * C + az * s, c + ay * ay * C, ay * az * C - ax * s),
        (az * ax * C - ay * s, az * ay * C + ax * s, c + az * az * C),
    )


# -- robot constants ---------------------------------------------------------

class RobotConsts:
    """Numpy snapshot of a RobotModel for trace-time baking."""

    def __init__(self, model):
        self.nj = len(model.parents)
        self.parents = tuple(model.parents)
        self.joint_rot = np.asarray(model.joint_rot, dtype=np.float64)
        self.joint_pos = np.asarray(model.joint_pos, dtype=np.float64)
        self.axis = np.asarray(model.axis, dtype=np.float64)
        self.mass = np.asarray(model.mass, dtype=np.float64)
        self.com = np.asarray(model.com, dtype=np.float64)
        self.inertia = np.asarray(model.inertia, dtype=np.float64)
        self.gravity = np.asarray(model.gravity, dtype=np.float64)
        self.frame_parents = tuple(model.frame_parents)
        self.frame_rot = np.asarray(model.frame_rot, dtype=np.float64)
        self.frame_pos = np.asarray(model.frame_pos, dtype=np.float64)


# -- kinematics & dynamics ---------------------------------------------------

def fk_lanes(rc: RobotConsts, q):
    """World placements of joint frames. q: list of [NB] lane arrays."""
    rots, trans = [], []
    for i in range(rc.nj):
        E = m_mul(m_const(rc.joint_rot[i], q[0]), rot_axis_angle(rc.axis[i], q[i]))
        p = v_const(rc.joint_pos[i], q[0])
        parent = rc.parents[i]
        if parent < 0:
            rots.append(E)
            trans.append(p)
        else:
            rots.append(m_mul(rots[parent], E))
            trans.append(v_add(m_vec(rots[parent], p), trans[parent]))
    return rots, trans


def frame_placement_lanes(rc: RobotConsts, rots, trans, fid: int):
    j = rc.frame_parents[fid]
    R = m_mul(rots[j], m_const(rc.frame_rot[fid], trans[j][0]))
    p = v_add(m_vec(rots[j], v_const(rc.frame_pos[fid], trans[j][0])), trans[j])
    return R, p


def rnea_lanes(rc: RobotConsts, q, v, a, gravity: bool = True):
    """Inverse dynamics; q/v/a lists of [NB] arrays -> tau list of [NB]."""
    like = q[0]
    nj = rc.nj
    Es, ps = [], []
    vs, ws, als, aas = [], [], [], []
    f_lin, f_ang = [None] * nj, [None] * nj

    for i in range(nj):
        E = m_mul(m_const(rc.joint_rot[i], like), rot_axis_angle(rc.axis[i], q[i]))
        p = v_const(rc.joint_pos[i], like)
        Es.append(E)
        ps.append(p)
        parent = rc.parents[i]
        if parent < 0:
            vp, wp = v_zero(like), v_zero(like)
            ap = v_const(-rc.gravity, like) if gravity else v_zero(like)
            alp = v_zero(like)
        else:
            vp, wp = vs[parent], ws[parent]
            ap, alp = als[parent], aas[parent]

        vi = m_t_vec(E, v_add(vp, v_cross(wp, p)))
        wi = m_t_vec(E, wp)
        ai = m_t_vec(E, v_add(ap, v_cross(alp, p)))
        ali = m_t_vec(E, alp)

        axis = rc.axis[i]
        wJ = v_scale(v[i], v_const(axis, like))
        aJ = v_scale(a[i], v_const(axis, like))

        w_tot = v_add(wi, wJ)
        vs.append(vi)
        ws.append(w_tot)
        als.append(v_add(ai, v_cross(vi, wJ)))
        aas.append(v_add(v_add(ali, aJ), v_cross(w_tot, wJ)))

        # momentum h = I * motion ; I from mass/com/inertia constants
        m_i = float(rc.mass[i])
        c = v_const(rc.com[i], like)
        Ic = m_const(rc.inertia[i], like)

        def apply_inertia(vv, ww):
            h_lin = v_scale(m_i, v_add(vv, v_cross(ww, c)))
            h_ang = v_add(m_vec(Ic, ww), v_cross(c, h_lin))
            return h_lin, h_ang

        h_lin, h_ang = apply_inertia(vs[i], ws[i])
        ha_lin, ha_ang = apply_inertia(als[i], aas[i])
        f_lin[i] = v_add(ha_lin, v_cross(ws[i], h_lin))
        f_ang[i] = v_add(ha_ang, v_add(v_cross(ws[i], h_ang), v_cross(vs[i], h_lin)))

    tau = [None] * nj
    for i in range(nj - 1, -1, -1):
        tau[i] = v_dot(v_const(rc.axis[i], like), f_ang[i])
        parent = rc.parents[i]
        if parent >= 0:
            fp = m_vec(Es[i], f_lin[i])
            tp = v_add(m_vec(Es[i], f_ang[i]), v_cross(ps[i], fp))
            f_lin[parent] = v_add(f_lin[parent], fp)
            f_ang[parent] = v_add(f_ang[parent], tp)
    return tau


def mass_nle_lanes(rc: RobotConsts, q, v):
    """(M rows [nj][nj] of lane arrays, nle list) — unit-accel RNEA columns."""
    like = q[0]
    zero = [jnp.zeros_like(like) for _ in range(rc.nj)]
    nle = rnea_lanes(rc, q, v, zero, gravity=True)
    cols = []
    for j in range(rc.nj):
        e = [jnp.zeros_like(like) for _ in range(rc.nj)]
        e[j] = jnp.ones_like(like)
        cols.append(rnea_lanes(rc, q, zero, e, gravity=False))
    M = [[cols[j][i] for j in range(rc.nj)] for i in range(rc.nj)]
    return M, nle


def solve2(M, b):
    """2x2 lane solve: M rows [[a,b],[c,d]], b list of 2 lanes."""
    a, bb = M[0][0], M[0][1]
    c, d = M[1][0], M[1][1]
    det = a * d - bb * c
    inv_det = 1.0 / det
    return (
        (d * b[0] - bb * b[1]) * inv_det,
        (a * b[1] - c * b[0]) * inv_det,
    )


def choln(M):
    """Unrolled n x n lane Cholesky of an SPD matrix given as nested row
    lists of lane arrays; returns the lower factor as nested lists (the
    n-DoF generalization of :func:`solve2`'s closed form — trace-time
    unrolled, Mosaic-safe: no tiny-dim dot_general)."""
    n = len(M)
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = M[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    return L


def choln_solve(L, b):
    """Solve L L^T x = b per lane; b list of n lanes -> list of n lanes."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def solven(M, b):
    """n x n SPD lane solve (Cholesky); M nested rows, b list of n lanes.
    Dispatches to the 2x2 closed form at n=2 (bit-compatibility with the
    existing 2-DoF kernels is NOT preserved by the factored path)."""
    if len(M) == 2:
        return list(solve2(M, b))
    return choln_solve(choln(M), b)


# -- transcendentals Mosaic lacks -------------------------------------------

_ATAN_COEFFS = (  # Abramowitz & Stegun 4.4.49, |err| <= 2e-8 on [0, 1]
    0.9999993329, -0.3332985605, 0.1994653599, -0.1390853351,
    0.0964200441, -0.0559098861, 0.0218612288, -0.0040540580,
)


def atan_lanes(a):
    """atan for a in [0, 1] (polynomial; Mosaic has no inverse trig)."""
    s = a * a
    p = _ATAN_COEFFS[-1]
    for c in _ATAN_COEFFS[-2::-1]:
        p = p * s + c
    return a * p


def atan2_lanes(y, x):
    """atan2 for y >= 0 (the log-map use case): result in [0, pi].

    Polynomial estimate + one Newton correction through sin/cos (which
    Mosaic does lower), pushing the 2e-8 polynomial error to ~1e-15.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    a = lo / jnp.maximum(hi, 1e-30)
    r = atan_lanes(a)
    r = jnp.where(ay > ax, 0.5 * jnp.pi - r, r)
    r = jnp.where(x < 0.0, jnp.pi - r, r)
    # Newton: theta += sin(theta_true - theta_est) = (y cos r - x sin r)/hyp
    hyp = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-30))
    r = r + (y * jnp.cos(r) - x * jnp.sin(r)) / hyp
    return r


# -- SE(3) log on lanes ------------------------------------------------------

def log3_lanes(R):
    """Axis-angle of a lane rotation matrix (sanitized branches, as so3.log3).

    Uses ``theta = atan2(|vee|, cos)`` — ``|vee| = sin(theta)`` exactly for
    theta in [0, pi] — instead of arccos (no Mosaic lowering for acos).

    jvp-safe: every branch's inputs are sanitized (double-where) so the
    forward-mode derivative of the NOT-taken branches stays finite — the
    linearize kernel differentiates the goal cost through this map, and a
    planar arm's EE crosses theta = pi routinely (sqrt(0) in the naive
    near-pi axis formula used to emit NaN tangents that killed whole
    scenarios in f32 solves).
    """
    trace = R[0][0] + R[1][1] + R[2][2]
    cc = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    u = 1.0 - cc
    s = 1.0 + cc
    vee = ((R[2][1] - R[1][2]) * 0.5, (R[0][2] - R[2][0]) * 0.5, (R[1][0] - R[0][1]) * 0.5)

    small = u < 5e-7        # fp32-friendly threshold
    near_pi = s < 5e-5
    generic = ~(small | near_pi)

    # generic branch: sanitize so sqrt/atan2/div derivatives stay finite
    # where the branch is NOT taken (sin_theta >= ~1e-3 where it is)
    vv = v_dot(vee, vee)
    safe_vv = jnp.where(generic, vv, 1.0)
    sin_theta = jnp.sqrt(safe_vv)
    theta = atan2_lanes(jnp.where(generic, sin_theta, 0.0),
                        jnp.where(generic, cc, 1.0))
    fac_gen = theta / sin_theta

    theta2_t = 2.0 * u * (1.0 + u / 6.0)
    fac_small = 1.0 + theta2_t / 6.0

    # near-pi: |w| = theta, direction from sqrt of diagonal (sign from vee);
    # zero-tangent double-where on the sqrt (ratio == 0 on axes orthogonal
    # to the rotation — exactly the planar case)
    theta_pi = jnp.pi - jnp.sqrt(jnp.maximum(2.0 * s, 1e-30)) * (1.0 + s / 12.0)
    diag = (R[0][0], R[1][1], R[2][2])
    ratio = tuple((d - cc) / jnp.maximum(u, 1e-30) for d in diag)
    ax = tuple(
        jnp.where(r > 1e-6, jnp.sqrt(jnp.where(r > 1e-6, r, 1.0)), 0.0)
        for r in ratio)
    sgn = tuple(jnp.where(vi < 0.0, -1.0, 1.0) for vi in vee)
    w_pi = tuple(a * sg * theta_pi for a, sg in zip(ax, sgn))

    fac = jnp.where(small, fac_small, fac_gen)
    w_gen = tuple(fac * vi for vi in vee)
    return tuple(jnp.where(near_pi, wp, wg) for wp, wg in zip(w_pi, w_gen))


def log6_lanes(R, p):
    """SE(3) log: returns 6-tuple [v(3); w(3)] of lane arrays."""
    w = log3_lanes(R)
    theta2 = v_dot(w, w)
    small = theta2 < 1e-12
    safe_t2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe_t2)
    sin_t = jnp.sin(theta)
    denom = 2.0 * theta * sin_t
    safe_denom = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    k = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, 1.0 / safe_t2 - (1.0 + jnp.cos(theta)) / safe_denom)
    # Vinv = I - 0.5 W + k W^2 applied to p
    wxp = v_cross(w, p)
    wxwxp = v_cross(w, wxp)
    v = tuple(pi - 0.5 * wi + k * wwi for pi, wi, wwi in zip(p, wxp, wxwxp))
    return v + w
