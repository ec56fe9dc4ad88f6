"""SE(3) primitives: composition, exp/log maps, and log-map Jacobians.

TPU-native replacement for ``pinocchio.SE3`` / ``pinocchio.log`` /
``pinocchio.Jlog6`` as used by the reference's frame-placement residual
(reference ``python/aslr_to/residual_frame_placement.py:13-24``).

Conventions (Pinocchio-compatible):
  - A placement ``M = (rot, trans)`` maps local coordinates to world:
    ``x_w = rot @ x_l + trans``.
  - 6-vectors (twists, spatial forces, log coordinates) are ordered
    ``[linear(3); angular(3)]`` — matching ``pinocchio.Motion.vector``.

``jlog6`` is derived with forward-mode autodiff of the closed-form ``log6``
along the 6 tangent directions: exact, branch-free at trace time, and cheap
for the 6-column case. This replaces Pinocchio's hand-derived ``Jlog6``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .so3 import exp3, log3, skew

_EPS = 1e-8


class SE3(NamedTuple):
    """Rigid placement, a pytree of (rotation 3x3, translation 3)."""

    rot: jnp.ndarray
    trans: jnp.ndarray

    @staticmethod
    def identity(dtype=jnp.float64):
        return SE3(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype))

    def inverse(self) -> "SE3":
        Rt = self.rot.T
        return SE3(Rt, -(Rt @ self.trans))

    def compose(self, other: "SE3") -> "SE3":
        """self * other (apply ``other`` first in local coordinates)."""
        return SE3(self.rot @ other.rot, self.rot @ other.trans + self.trans)

    def act_point(self, p):
        return self.rot @ p + self.trans


def _v_matrix(w):
    """Left Jacobian V(w) of SO(3): translation part of exp6 is V(w) @ v.

    Branches follow the sanitized-input pattern of :mod:`.so3` so both AD
    modes stay finite at theta = 0 and theta = pi.
    """
    theta2 = jnp.dot(w, w)
    small = theta2 < _EPS * _EPS
    safe_t2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe_t2)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (safe_t2 * theta))
    W = skew(w)
    return jnp.eye(3, dtype=w.dtype) + b * W + c * (W @ W)


def _v_inv_matrix(w):
    """Closed-form inverse of the SO(3) left Jacobian (sanitized branches).

    The generic factor k = 1/theta^2 - (1+cos)/(2 theta sin) is singular at
    theta = 0 (Taylor branch) and theta = pi (sin -> 0, where k -> 1/pi^2
    with a removable 0/0; we guard the denominator and accept the O(eps)
    error in the last ~1e-6 rad before pi).
    """
    theta2 = jnp.dot(w, w)
    small = theta2 < _EPS * _EPS
    safe_t2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe_t2)
    sin_t = jnp.sin(theta)
    denom = 2.0 * theta * sin_t
    safe_denom = jnp.where(jnp.abs(denom) < 1e-12, jnp.sign(denom) * 1e-12 + 1e-18, denom)
    k = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / safe_t2 - (1.0 + jnp.cos(theta)) / safe_denom,
    )
    W = skew(w)
    return jnp.eye(3, dtype=w.dtype) - 0.5 * W + k * (W @ W)


def exp6(xi) -> SE3:
    """SE(3) exponential of ``xi = [v; w]`` (Pinocchio ordering)."""
    v, w = xi[:3], xi[3:]
    R = exp3(w)
    p = _v_matrix(w) @ v
    return SE3(R, p)


def log6(M: SE3):
    """SE(3) logarithm as a 6-vector ``[v; w]`` (Pinocchio ordering)."""
    w = log3(M.rot)
    v = _v_inv_matrix(w) @ M.trans
    return jnp.concatenate([v, w])


def jlog6(M: SE3):
    """Jacobian of ``xi -> log6(M * exp6(xi))`` at ``xi = 0`` (6x6).

    Matches ``pinocchio.Jlog6`` (right Jacobian of log at M). Computed by
    forward-mode autodiff through the closed-form log/exp — exact and cheap
    for 6 tangent columns.
    """
    def f(xi):
        return log6(M.compose(exp6(xi)))

    zero = jnp.zeros(6, dtype=M.trans.dtype)
    return jax.jacfwd(f)(zero)
