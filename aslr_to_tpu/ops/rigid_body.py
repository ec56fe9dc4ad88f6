"""Rigid-body dynamics kernels: FK, RNEA, mass matrix, frame Jacobians.

TPU-native replacement for the Pinocchio C++ kernels the reference calls into:
``computeAllTerms`` / ``rnea`` / ``computeRNEADerivatives`` (reference
``python/aslr_to/free_fwddyn_asr.py:38,75,111``), ``forwardKinematics`` /
``updateFramePlacements`` / ``getFrameJacobian`` (reference
``python/aslr_to/free_fwddyn_asr.py:49-50``,
``python/aslr_to/residual_frame_placement.py:18-22``).

Design (TPU-first, not a port):
  - The robot topology (parent indices, frame attachments) is *static*
    metadata; the per-joint loop unrolls at trace time into a fixed XLA
    graph. Kinematic trees here are small (nv <= 14), so unrolling is
    strictly better than ``lax.scan`` — XLA fuses the whole chain.
  - All quantities are pure functions of pytree inputs: batch with ``vmap``,
    differentiate with ``jacfwd``/``grad``, shard with ``shard_map``.
  - The mass matrix is built from unit-acceleration RNEA columns under one
    ``vmap`` (exact, and lets XLA share the kinematic sweep), replacing CRBA.
  - Derivatives of RNEA come from forward-mode autodiff of this same kernel
    (replacing Pinocchio's analytic Carpentier-Mansard derivatives); the
    results agree to machine precision and stay fused inside the solver jit.

Spatial 6-vectors are ordered ``[linear; angular]`` (Pinocchio convention).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .se3 import SE3
from .so3 import exp3, skew


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RobotModel:
    """Fixed-base kinematic chain with revolute joints (pytree).

    Replaces ``pinocchio.Model`` for the robots the reference loads through
    ``example_robot_data`` (reference ``examples/two_dof_sea.py:18``).

    Array fields are pytree leaves (differentiable / vmappable); topology and
    names are static metadata so jit treats them as compile-time constants.
    """

    # -- static metadata ---------------------------------------------------
    name: str = dataclasses.field(metadata=dict(static=True))
    parents: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    frame_names: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))
    frame_parents: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))

    # -- per-joint arrays --------------------------------------------------
    joint_rot: jnp.ndarray   # [nj,3,3] fixed rotation of joint frame in parent
    joint_pos: jnp.ndarray   # [nj,3]   fixed translation of joint frame in parent
    axis: jnp.ndarray        # [nj,3]   revolute axis in the joint frame
    mass: jnp.ndarray        # [nj]
    com: jnp.ndarray         # [nj,3]   CoM in the joint frame
    inertia: jnp.ndarray     # [nj,3,3] rotational inertia about the CoM
    # -- per-frame arrays --------------------------------------------------
    frame_rot: jnp.ndarray   # [nf,3,3]
    frame_pos: jnp.ndarray   # [nf,3]
    # -- world -------------------------------------------------------------
    gravity: jnp.ndarray     # [3] gravitational acceleration (pinocchio model.gravity.linear)

    @property
    def nq(self) -> int:
        return len(self.parents)

    @property
    def nv(self) -> int:
        return len(self.parents)

    def frame_id(self, name: str) -> int:
        """Replaces ``pinocchio.Model.getFrameId``."""
        return self.frame_names.index(name)

    def with_gravity(self, g) -> "RobotModel":
        """Functional gravity override (reference ``examples/two_dof_sea.py:20``)."""
        return dataclasses.replace(self, gravity=jnp.asarray(g, dtype=self.gravity.dtype))


# ---------------------------------------------------------------------------
# spatial-vector helpers ([linear; angular] = (v, w) pairs of 3-vectors)
# ---------------------------------------------------------------------------

def _xform_inv_motion(E, p, v, w):
    """Motion (v, w) in parent coords -> child coords, child frame at (E, p)."""
    return E.T @ (v + jnp.cross(w, p)), E.T @ w


def _xform_force(E, p, f, tau):
    """Force (f, tau) in child coords -> parent coords, child frame at (E, p)."""
    fp = E @ f
    return fp, E @ tau + jnp.cross(p, fp)


def _cross_motion(v1, w1, v2, w2):
    return jnp.cross(w1, v2) + jnp.cross(v1, w2), jnp.cross(w1, w2)


def _cross_force(v, w, f, tau):
    return jnp.cross(w, f), jnp.cross(w, tau) + jnp.cross(v, f)


def _apply_inertia(model, i, v, w):
    """Spatial momentum (h_lin, h_ang) of body i for motion (v, w)."""
    m = model.mass[i]
    c = model.com[i]
    Cx = skew(c)
    h_lin = m * (v + jnp.cross(w, c))
    h_ang = m * jnp.cross(c, v) + (model.inertia[i] - m * (Cx @ Cx)) @ w
    return h_lin, h_ang


def _joint_transform(model, i, qi):
    """Placement of joint-i frame in its parent frame at angle qi."""
    E = model.joint_rot[i] @ exp3(model.axis[i] * qi)
    return E, model.joint_pos[i]


# ---------------------------------------------------------------------------
# kinematics
# ---------------------------------------------------------------------------

def forward_kinematics(model: RobotModel, q):
    """World placements of every joint frame.

    Replaces ``pinocchio.forwardKinematics`` + joint placements in
    ``pinocchio.Data.oMi``. Returns (rots [nj,3,3], trans [nj,3]).
    """
    rots, trans = [], []
    for i, parent in enumerate(model.parents):
        E, p = _joint_transform(model, i, q[i])
        if parent < 0:
            rots.append(E)
            trans.append(p)
        else:
            rots.append(rots[parent] @ E)
            trans.append(rots[parent] @ p + trans[parent])
    return jnp.stack(rots), jnp.stack(trans)


def frame_placement_from_fk(model: RobotModel, rots, trans, fid: int) -> SE3:
    """Frame placement from precomputed FK (shared-kinematics fast path)."""
    j = model.frame_parents[fid]
    R = rots[j] @ model.frame_rot[fid]
    p = rots[j] @ model.frame_pos[fid] + trans[j]
    return SE3(R, p)


def frame_placement(model: RobotModel, q, fid: int) -> SE3:
    """World placement of a named frame — replaces ``pinocchio.Data.oMf``."""
    rots, trans = forward_kinematics(model, q)
    return frame_placement_from_fk(model, rots, trans, fid)


def frame_jacobian_local_from_fk(model: RobotModel, rots, trans, fid: int, dtype=None):
    """LOCAL frame Jacobian from precomputed FK (6 x nv, [linear; angular]).

    Replaces ``pinocchio.getFrameJacobian(..., ReferenceFrame.LOCAL)``
    (reference ``python/aslr_to/residual_frame_placement.py:21-22``).
    """
    j = model.frame_parents[fid]
    fR = rots[j] @ model.frame_rot[fid]
    fp = rots[j] @ model.frame_pos[fid] + trans[j]
    dtype = dtype or trans.dtype

    cols = []
    nv = model.nv
    # Walk the (static) ancestor chain of the frame's parent joint.
    support = []
    k = j
    while k >= 0:
        support.append(k)
        k = model.parents[k]
    support_set = set(support)
    for i in range(nv):
        if i in support_set:
            w_world = rots[i] @ model.axis[i]
            v_world = jnp.cross(w_world, fp - trans[i])
            cols.append(jnp.concatenate([fR.T @ v_world, fR.T @ w_world]))
        else:
            cols.append(jnp.zeros(6, dtype=dtype))
    return jnp.stack(cols, axis=1)


def frame_jacobian_local(model: RobotModel, q, fid: int):
    """LOCAL frame Jacobian at q (convenience wrapper)."""
    rots, trans = forward_kinematics(model, q)
    return frame_jacobian_local_from_fk(model, rots, trans, fid, dtype=q.dtype)


# ---------------------------------------------------------------------------
# dynamics
# ---------------------------------------------------------------------------

def rnea(model: RobotModel, q, v, a, gravity: bool = True):
    """Inverse dynamics: joint torques for (q, v, a).

    Replaces ``pinocchio.rnea`` (reference
    ``python/aslr_to/free_fwddyn_asr.py:111``). Local-frame Featherstone
    recursion, unrolled over the static chain.
    """
    nj = model.nq
    dtype = q.dtype
    zero3 = jnp.zeros(3, dtype=dtype)
    g_lin = -model.gravity.astype(dtype) if gravity else zero3

    Es, ps = [], []
    vs, ws, a_lin, a_ang = [], [], [], []
    f_lin, f_ang = [None] * nj, [None] * nj

    for i, parent in enumerate(model.parents):
        E, p = _joint_transform(model, i, q[i])
        Es.append(E)
        ps.append(p)
        if parent < 0:
            vp, wp = zero3, zero3
            ap, alp = g_lin, zero3
        else:
            vp, wp = vs[parent], ws[parent]
            ap, alp = a_lin[parent], a_ang[parent]

        vi, wi = _xform_inv_motion(E, p, vp, wp)
        ai, ali = _xform_inv_motion(E, p, ap, alp)
        wJ = model.axis[i] * v[i]          # joint angular velocity (local)
        aJ = model.axis[i] * a[i]
        # velocity-product term: v_i x (S qdot)
        cv, cw = _cross_motion(vi, wi + wJ, zero3, wJ)
        vs.append(vi)
        ws.append(wi + wJ)
        a_lin.append(ai + cv)
        a_ang.append(ali + aJ + cw)

        h_lin, h_ang = _apply_inertia(model, i, vs[i], ws[i])
        ha_lin, ha_ang = _apply_inertia(model, i, a_lin[i], a_ang[i])
        x_lin, x_ang = _cross_force(vs[i], ws[i], h_lin, h_ang)
        f_lin[i] = ha_lin + x_lin
        f_ang[i] = ha_ang + x_ang

    tau = [None] * nj
    for i in range(nj - 1, -1, -1):
        tau[i] = jnp.dot(model.axis[i], f_ang[i])
        parent = model.parents[i]
        if parent >= 0:
            pf, ptau = _xform_force(Es[i], ps[i], f_lin[i], f_ang[i])
            f_lin[parent] = f_lin[parent] + pf
            f_ang[parent] = f_ang[parent] + ptau
    return jnp.stack(tau)


def nonlinear_effects(model: RobotModel, q, v):
    """Coriolis + gravity torques — ``pinocchio.Data.nle``."""
    return rnea(model, q, v, jnp.zeros_like(q), gravity=True)


def mass_matrix(model: RobotModel, q):
    """Joint-space inertia matrix M(q).

    Replaces CRBA inside ``pinocchio.computeAllTerms``: column j is
    RNEA(q, 0, e_j) without gravity, evaluated under one ``vmap`` so XLA
    shares the kinematic sweep across columns. Exact (not an approximation).
    """
    nv = model.nv
    zeros = jnp.zeros(nv, dtype=q.dtype)
    eye = jnp.eye(nv, dtype=q.dtype)
    cols = jax.vmap(lambda e: rnea(model, q, zeros, e, gravity=False))(eye)
    M = cols.T
    return 0.5 * (M + M.T)


def compute_all_terms(model: RobotModel, q, v):
    """(M, nle) in one call — replaces ``pinocchio.computeAllTerms``."""
    return mass_matrix(model, q), nonlinear_effects(model, q, v)


def rnea_derivatives(model: RobotModel, q, v, a):
    """(dtau_dq, dtau_dv) of inverse dynamics.

    Replaces ``pinocchio.computeRNEADerivatives`` (reference
    ``python/aslr_to/free_fwddyn_asr.py:75``) via forward-mode autodiff of
    the RNEA kernel; exact to machine precision.
    """
    dtau_dq = jax.jacfwd(lambda q_: rnea(model, q_, v, a))(q)
    dtau_dv = jax.jacfwd(lambda v_: rnea(model, q, v_, a))(v)
    return dtau_dq, dtau_dv


def aba(model: RobotModel, q, v, tau):
    """Forward dynamics accelerations: M(q)^-1 (tau - nle(q, v)).

    Replaces ``pinocchio.aba`` for the rigid free-forward-dynamics model
    (used by the reference's condensed-formulation tests,
    ``unittest/test_softdyn_residual.py:33``). Dense solve — nv <= 14.
    """
    M, b = compute_all_terms(model, q, v)
    return jnp.linalg.solve(M, tau - b)
