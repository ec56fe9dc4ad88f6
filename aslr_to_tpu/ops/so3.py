"""SO(3) primitives: hat map, exponential, logarithm.

TPU-native replacement for the rotation parts of Pinocchio's Lie-group kernels
(used by the reference via ``pinocchio.log`` / ``pinocchio.Jlog6``,
see reference ``python/aslr_to/residual_frame_placement.py:14-20``).

All functions are pure, jit/vmap-safe, and autodiff-safe at the singular
points (theta = 0 and theta = pi): every branch of every ``jnp.where`` is
evaluated on *sanitized* inputs so that neither forward- nor reverse-mode
differentiation ever sees an inf/NaN partial (the classic where-NaN trap).
Near-singular factors are Taylor series in smooth quantities (theta^2 or
1 - cos(theta)), never in theta itself.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS2 = 1e-16   # theta^2 threshold for the small-angle branch (theta < 1e-8)


def skew(w):
    """Hat map: 3-vector -> 3x3 skew-symmetric matrix such that skew(w) @ v = w x v."""
    wx, wy, wz = w[0], w[1], w[2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy]),
        jnp.stack([wz, z, -wx]),
        jnp.stack([-wy, wx, z]),
    ])


def unskew(W):
    """Inverse of the hat map (vee), assuming W is skew-symmetric."""
    return jnp.stack([W[2, 1], W[0, 2], W[1, 0]])


def exp3(w):
    """Rodrigues formula: rotation matrix of the axis-angle vector ``w``."""
    theta2 = jnp.dot(w, w)
    small = theta2 < _EPS2
    safe_t2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe_t2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    W = skew(w)
    return jnp.eye(3, dtype=w.dtype) + a * W + b * (W @ W)


def log3(R):
    """Axis-angle vector of a rotation matrix (``pinocchio.log3`` semantics)."""
    trace = R[0, 0] + R[1, 1] + R[2, 2]
    c = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    u = 1.0 - c                     # smooth in R; = theta^2/2 - theta^4/24 + ...
    s = 1.0 + c                     # smooth in R; -> 0 as theta -> pi

    vee = unskew(R - R.T) * 0.5     # = sin(theta) * axis, smooth in R

    small = u < 5e-10               # theta < ~3e-5
    near_pi = s < 5e-7              # theta > pi - ~1e-3

    # Generic branch: theta from a sanitized arccos (bounded away from +/-1 in
    # the other branches so its derivative stays finite everywhere).
    safe_c = jnp.where(small | near_pi, 0.0, c)
    theta = jnp.arccos(safe_c)
    sin_theta = jnp.sin(theta)      # >= sin(3e-5) wherever this branch is used
    w_generic = vee * (theta / sin_theta)

    # Small-angle branch: theta^2 = 2u (1 + u/6 + ...) — Taylor in u, no sqrt.
    theta2_t = 2.0 * u * (1.0 + u / 6.0)
    w_small = vee * (1.0 + theta2_t / 6.0)

    # Near-pi branch: R + I = 2 a a^T + O(pi - theta), so the largest column
    # of R + I is parallel to the axis; vee fixes the sign just below pi.
    theta_pi = jnp.pi - jnp.sqrt(jnp.maximum(2.0 * s, 1e-30)) * (1.0 + s / 12.0)
    S = R + jnp.eye(3, dtype=R.dtype)
    col_norms = jnp.linalg.norm(S, axis=0)
    k = jnp.argmax(col_norms)
    axis = S[:, k] / jnp.maximum(col_norms[k], 1e-30)
    flip = jnp.where(jnp.dot(axis, vee) < 0.0, -1.0, 1.0)
    w_pi = axis * (flip * theta_pi)

    return jnp.where(small, w_small, jnp.where(near_pi, w_pi, w_generic))
