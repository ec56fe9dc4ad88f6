"""Log-depth (associative-scan) Riccati backward for long horizons.

The backward sweeps in :mod:`.ddp` are sequential ``lax.scan`` chains —
correct for the reference's T<=200 horizons (SURVEY §2.3 "knot strategy:
sequential by design"), but a serial chain of length T on an accelerator
whose strength is parallel work. This module provides the TPU-idiomatic
alternative for LONG horizons: the unbounded (DDP/FDDP) backward as a
``jax.lax.associative_scan`` of value-function maps — O(log T) depth
instead of O(T).

Derivation (parallel-LQT element algebra, cf. Särkkä &
García-Fernández's temporal parallelization of LQT; derived here
directly from the solver's own recursion in
``ddp._fddp_backward_scan``): eliminating the control from one knot's
KKT conditions gives an affine two-point relation between the state and
costate at consecutive knots::

    x_{t+1} = A x_t - B lam_{t+1} + c
    lam_t   = C x_t + A^T lam_{t+1} + d

with, per knot (``luu_r = Luu + reg*I``)::

    A = Fx - Fu luu_r^-1 Lxu^T        B = Fu luu_r^-1 Fu^T
    C = Lxx - Lxu luu_r^-1 Lxu^T + reg*I   (the solver's per-step Vxx reg)
    c = -Fu luu_r^-1 Lu + A fs_t      d = Lx - Lxu luu_r^-1 Lu + C fs_t

(the ``fs`` terms fold the FDDP gap deflection ``Vx += Vxx fs`` — an
argument shift of the value function — into the element; zero gaps
recover plain DDP). Relations compose associatively::

    M   = (I + B1 C2)^-1
    A12 = A2 M A1
    B12 = B2 + A2 M B1 A2^T
    C12 = C1 + A1^T C2 M A1
    c12 = c2 + A2 M (c1 - B1 d2)
    d12 = d1 + A1^T (C2 M (c1 - B1 d2) + d2)

A reverse ``associative_scan`` of the combine yields every suffix
relation t->T; closing each against the terminal costate
``lam_T = J_T x_T + eta_T`` gives ``(Vx_t, Vxx_t)`` for ALL knots in
O(log T) depth, after which the gains/expected-improvement extraction is
one embarrassingly parallel ``vmap`` over knots — identical formulas to
the sequential body, so outputs match the scan to reassociation-level
floating-point error (f64 parity test: tests/test_assoc_riccati.py).

Scope: unbounded families only. The Box variants' value recursion passes
through the clamped-QP gain partition — not a linear-fractional map of
``Vxx`` — so they stay sequential (their per-chip throughput axis is the
scenario batch, not the horizon).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve


def _combine(e2, e1):
    """Compose relations: ``e1`` spans [t, j), ``e2`` spans [j, k).

    Argument order matches ``associative_scan(reverse=True)``: it flips
    the array and runs a forward scan, so the accumulated composite of
    LATER (terminal-side) elements arrives as the first argument and
    each new earlier element as the second.
    """
    A1, B1, C1, c1, d1 = e1
    A2, B2, C2, c2, d2 = e2
    n = A1.shape[-1]
    eye = jnp.eye(n, dtype=A1.dtype)
    # ONE inverse of M = I + B1 C2 per combine (well-conditioned for PSD
    # B, C at the solver's regularization levels), reused for all three
    # applications — a batched LU per solve was 3x the cost
    Minv = jnp.linalg.inv(eye + B1 @ C2)
    MA1 = Minv @ A1
    Mc = (Minv @ (c1 - (B1 @ d2[..., None])[..., 0])[..., None])[..., 0]
    MB1 = Minv @ B1
    A12 = A2 @ MA1
    B12 = B2 + A2 @ MB1 @ jnp.swapaxes(A2, -1, -2)
    C12 = C1 + jnp.swapaxes(A1, -1, -2) @ C2 @ MA1
    c12 = c2 + (A2 @ Mc[..., None])[..., 0]
    d12 = d1 + (jnp.swapaxes(A1, -1, -2)
                @ ((C2 @ Mc[..., None])[..., 0] + d2)[..., None])[..., 0]
    return A12, B12, C12, c12, d12


def _elements(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_run, reg):
    """Per-knot relation elements (vectorized over the T axis)."""
    dtype = Fx.dtype
    nu = Fu.shape[-1]
    ndx = Fx.shape[-1]
    eye_u = jnp.eye(nu, dtype=dtype)
    eye_x = jnp.eye(ndx, dtype=dtype)
    luu_r = Luu + reg * eye_u

    FuT = jnp.swapaxes(Fu, -1, -2)
    LxuT = jnp.swapaxes(Lxu, -1, -2)
    iLxuT = jnp.linalg.solve(luu_r, LxuT)          # luu_r^-1 Lxu^T
    iFuT = jnp.linalg.solve(luu_r, FuT)            # luu_r^-1 Fu^T
    iLu = jnp.linalg.solve(luu_r, Lu[..., None])[..., 0]

    A = Fx - Fu @ iLxuT
    B = Fu @ iFuT
    C = Lxx - Lxu @ iLxuT + reg * eye_x
    c = -(Fu @ iLu[..., None])[..., 0] + (A @ fs_run[..., None])[..., 0]
    d = (Lx - (Lxu @ iLu[..., None])[..., 0]
         + (C @ fs_run[..., None])[..., 0])
    return A, B, C, c, d


def fddp_backward_assoc(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, tLx, tLxx, fs, reg):
    """Drop-in for ``ddp._fddp_backward_scan`` with O(log T) depth.

    Same inputs ([T, ...] per-knot derivatives, terminal Lx/Lxx, gaps
    ``fs`` [T+1, ndx], scalar ``reg``) and the same output tuple
    (k, K, w_all, dg, dq, stop, dg_gap, dq_gap, ok, retryable), where
    ``w_all`` [T+1, ndx] are the deflection vectors ``Vxx_t fs_t``
    consumed by the line search's dv correction (ddp._Backward.w).
    Values agree with the sequential scan up to floating-point
    reassociation (use f64 for parity checks).

    Numerical note: the combine and the terminal closure use explicit
    ``inv(I + B C)`` (measured 3x cheaper than a batched LU per
    application at these 8x8 blocks). For PSD B, C — which the
    regularized recursion guarantees — ``I + B C`` has eigenvalues
    >= 1, so the inverse is well-conditioned; but long-horizon suffix
    composites accumulate reassociation error faster than the
    sequential sweep, so prefer f64 when enabling ``assoc_backward``
    beyond parity testing (f32 drift is tolerance-level, not
    catastrophic — no conditioning guard is installed on this opt-in
    path).
    """
    dtype = Fx.dtype
    ndx = Fx.shape[-1]
    nu = Fu.shape[-1]
    eye_x = jnp.eye(ndx, dtype=dtype)
    eye_u = jnp.eye(nu, dtype=dtype)

    J_T = tLxx + reg * eye_x
    eta_T = tLx + J_T @ fs[-1]

    elems = _elements(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs[:-1], reg)
    # suffix compositions: after the reverse scan, index t holds the
    # relation spanning [t, T)
    suf = jax.lax.associative_scan(_combine, elems, reverse=True, axis=0)
    A, B, C, c, d = suf

    # close each suffix against the terminal costate lam_T = J_T x + eta
    Ninv = jnp.linalg.inv(eye_x + B @ J_T)   # [T, ndx, ndx], one inverse
    cBe = c - (B @ eta_T[..., None])[..., 0]
    JNc = J_T @ (Ninv @ cBe[..., None])
    JNA = J_T @ (Ninv @ A)
    AT = jnp.swapaxes(A, -1, -2)
    Vxx = C + AT @ JNA                       # Vxx_t for t in [0, T)
    Vx = (AT @ (JNc[..., 0] + eta_T)[..., None])[..., 0] + d

    # per-knot gain extraction from (Vx', Vxx') — the sequential body,
    # vectorized over knots (Vx'/Vxx' at t+1 = the suffix closure at t+1,
    # with the terminal pair appended)
    Vxx_n = jnp.concatenate([Vxx[1:], J_T[None]], axis=0)
    Vx_n = jnp.concatenate([Vx[1:], eta_T[None]], axis=0)

    def knot(fx, fu, lx, lu, lxx, lxu, luu, fs_t, vx_n, vxx_n):
        Qx = lx + fx.T @ vx_n
        Qu = lu + fu.T @ vx_n
        FxTVxx = fx.T @ vxx_n
        Qxx = lxx + FxTVxx @ fx
        Qxu = lxu + FxTVxx @ fu
        Quu = luu + fu.T @ vxx_n @ fu + reg * eye_u
        L = jnp.linalg.cholesky(Quu)
        k = cho_solve((L, True), Qu)
        K = cho_solve((L, True), Qxu.T)
        ok = jnp.all(jnp.isfinite(L))
        Quuk = Quu @ k
        vx = Qx + K.T @ Quuk - 2.0 * (K.T @ Qu)
        vxx = Qxx - Qxu @ K
        vxx = 0.5 * (vxx + vxx.T) + reg * eye_x
        w = vxx @ fs_t
        vx = vx + w
        out_ok = (jnp.all(jnp.isfinite(k)) & jnp.all(jnp.isfinite(K))
                  & jnp.all(jnp.isfinite(vx)) & jnp.all(jnp.isfinite(vxx)))
        indef = jnp.all(jnp.isfinite(Quu)) & ~out_ok
        return (k, K, w, jnp.dot(Qu, k), -jnp.dot(k, Quuk), jnp.dot(Qu, Qu),
                -jnp.dot(vx, fs_t), jnp.dot(fs_t, w), ok, indef)

    outs = jax.vmap(knot)(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs[:-1], Vx_n, Vxx_n)
    k, K, w_t, dg_t, dq_t, stop_t, dgg_t, dqg_t, ok_t, indef_t = outs
    w_all = jnp.concatenate([w_t, (J_T @ fs[-1])[None]], axis=0)
    dg_gap = jnp.sum(dgg_t) - jnp.dot(eta_T, fs[-1])
    dq_gap = jnp.sum(dqg_t) + jnp.dot(fs[-1], J_T @ fs[-1])
    return (k, K, w_all, jnp.sum(dg_t), jnp.sum(dq_t), jnp.sum(stop_t),
            dg_gap, dq_gap, jnp.all(ok_t), jnp.any(indef_t))
