"""Fused Pallas backward-Riccati kernel for the Box-DDP family.

The XLA-scan backward pass executes ~500 small HLO ops per knot (8x8
algebra + a projected-Newton BoxQP); at T=100 that is tens of thousands of
latency-bound dispatches per solver iteration and dominates the profile
(SURVEY §7 stage 5 — measured 130 ms vs 12.5 ms for the Cholesky-only
sweep at batch 256). This kernel fuses the ENTIRE sweep — value recursion,
masked BoxQP, free/clamped gain solves, expected-improvement/stop
accumulators — into ONE kernel launch.

Layout: scenarios ride the vector lanes. Every per-scenario matrix is an
array ``[..., rows, cols?, NB]`` with the batch tile ``NB`` as the lane
dimension, so an 8x8 matmul is 512 fused multiply-adds on NB-wide vectors
(pure VPU work, no MXU needed at these sizes). The time loop is a
``fori_loop`` inside the kernel; the grid runs over batch tiles.

Integration: :func:`boxddp_backward` is a ``jax.custom_batching.custom_vmap``
— unbatched calls fall back to the XLA scan (exact same math), and the
``vmap`` rule dispatches to this kernel, so ``vmap(solve)`` picks it up
transparently when ``SolverSettings.use_pallas_backward`` is set.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.vma import out_structs

NDX = 8   # soft 2-DoF state tangent dim
NU = 4    # VSA control dim

_QP_ITERS = 6
_QP_ALPHAS = (1.0, 0.5, 0.25, 0.125, 0.0625)


# ---------------------------------------------------------------------------
# lane-wise small linear algebra (arrays [..., n, m, NB])
# ---------------------------------------------------------------------------

# All contractions are broadcast-multiply + reductions over LEADING axes —
# Mosaic lowers these to VPU elementwise ops and adds; tiny-dim dot_general
# is not lowerable on TPU.

def _matmul_t_left(A, B):
    """A^T @ B per lane: A [k,n,NB], B [k,m,NB] -> [n,m,NB]."""
    return jnp.sum(A[:, :, None, :] * B[:, None, :, :], axis=0)


def _matmul(A, B):
    """A @ B per lane: A [n,k,NB], B [k,m,NB] -> [n,m,NB]."""
    return jnp.sum(A[:, :, None, :] * B[None, :, :, :], axis=1)


def _matvec_t(A, v):
    """A^T @ v per lane: A [k,n,NB], v [k,NB] -> [n,NB]."""
    return jnp.sum(A * v[:, None, :], axis=0)


def _matvec(A, v):
    """A @ v per lane: A [n,k,NB], v [k,NB] -> [n,NB]."""
    return jnp.sum(A * v[None, :, :], axis=1)


def _transpose12(A):
    """Swap the two leading (untiled) matrix axes of A [n,m,NB] -> [m,n,NB]
    via slice-and-stack (leading-axis relayout, Mosaic-safe)."""
    return jnp.stack([A[:, j, :] for j in range(A.shape[1])], axis=0)


def _chol4(A):
    """Unrolled n x n Cholesky per lane; A [n,n,NB] -> rows of L (lists)."""
    n = A.shape[0]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    return L


def _chol4_solve(L, b_cols):
    """Solve L L^T x = b per lane for each column; b_cols [n, m, NB]."""
    n = len(L)
    m = b_cols.shape[1]
    cols = []
    for c in range(m):
        b = [b_cols[i, c] for i in range(n)]
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
        cols.append(jnp.stack(x))          # [n, NB]
    return jnp.stack(cols, axis=1)         # [n, m, NB]


def _masked_chol_solve(Quu, free, B_cols):
    """Free-subsystem solve via the masked full-size system (exact zeros on
    clamped rows) — the same trick as solvers/boxqp.masked_free_solve."""
    n = Quu.shape[0]
    eye = jnp.eye(n, dtype=Quu.dtype)[:, :, None]
    mask2 = free[:, None, :] * free[None, :, :]
    A = Quu * mask2 + eye * (1.0 - free)[:, None, :] * jnp.eye(n, dtype=Quu.dtype)[:, :, None]
    # note: (1-free) only on the diagonal
    L = _chol4(A)
    return _chol4_solve(L, B_cols * free[:, None, :])


def _boxqp_lanes(Quu, Qu, low, up, qp_iters):
    """Masked projected-Newton box QP per lane.

    Quu [4,4,NB], Qu/low/up [4,NB] -> (x [4,NB], free [4,NB] as f32).
    """
    x = jnp.clip(jnp.zeros_like(Qu), low, up)
    for _ in range(qp_iters):
        g = Qu + _matvec(Quu, x)
        clamped = ((x <= low) & (g >= 0.0)) | ((x >= up) & (g <= 0.0))
        free = 1.0 - clamped.astype(Qu.dtype)
        dx = -_masked_chol_solve(Quu, free, g[:, None, :])[:, 0, :]

        f0 = 0.5 * jnp.sum(x * _matvec(Quu, x), axis=0) + jnp.sum(Qu * x, axis=0)
        gdx = jnp.sum(g * dx, axis=0)
        best_x = x
        accepted = jnp.zeros(x.shape[-1], dtype=bool)
        for a in _QP_ALPHAS:
            xa = jnp.clip(x + a * dx, low, up)
            fa = 0.5 * jnp.sum(xa * _matvec(Quu, xa), axis=0) + jnp.sum(Qu * xa, axis=0)
            ok_a = (fa - f0 <= 0.1 * a * gdx) & (~accepted)
            best_x = jnp.where(ok_a[None, :], xa, best_x)
            accepted = accepted | ok_a
        x = best_x
    g = Qu + _matvec(Quu, x)
    clamped = ((x <= low) & (g >= 0.0)) | ((x >= up) & (g <= 0.0))
    free = 1.0 - clamped.astype(Qu.dtype)
    return x, free


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _riccati_box_kernel(T, qp_iters, add_reg_to_carry,
                        Fx_ref, Fu_ref, Lx_ref, Lu_ref, Lxx_ref, Lxu_ref, Luu_ref,
                        tLx_ref, tLxx_ref, us_ref, lb_ref, ub_ref, reg_ref,
                        k_ref, K_ref, stats_ref, Vx_out_ref, Vxx_out_ref,
                        Vx_s, Vxx_s):
    dtype = Fx_ref.dtype
    NB = Fx_ref.shape[-1]
    eye8 = jnp.eye(NDX, dtype=dtype)[:, :, None]
    eye4 = jnp.eye(NU, dtype=dtype)[:, :, None]
    reg = reg_ref[0]                       # [NB]

    # terminal chunk: regularize the terminal Lxx; continuation chunks get
    # an already-regularized carry.
    if add_reg_to_carry:
        Vxx_s[:] = tLxx_ref[:] + eye8 * reg[None, None, :]
    else:
        Vxx_s[:] = tLxx_ref[:]
    Vx_s[:] = tLx_ref[:]

    zeros = jnp.zeros((NB,), dtype=dtype)
    lb = lb_ref[:]                         # [4, NB]
    ub = ub_ref[:]

    def body(i, carry):
        dg, dq, stop, indef = carry
        t = T - 1 - i
        Fx = Fx_ref[t]                     # [8,8,NB]
        Fu = Fu_ref[t]                     # [8,4,NB]
        Vx = Vx_s[:]
        Vxx = Vxx_s[:]

        Qx = Lx_ref[t] + _matvec_t(Fx, Vx)
        Qu = Lu_ref[t] + _matvec_t(Fu, Vx)
        FxTVxx = _matmul_t_left(Fx, Vxx)   # [8,8,NB]
        Qxx = Lxx_ref[t] + _matmul(FxTVxx, Fx)
        Qxu = Lxu_ref[t] + _matmul(FxTVxx, Fu)            # [8,4,NB]
        FuTVxx = _matmul_t_left(Fu, Vxx)   # [4,8,NB]
        Quu = Luu_ref[t] + _matmul(FuTVxx, Fu) + eye4 * reg[None, None, :]

        u_t = us_ref[t]                    # [4,NB]
        low = lb - u_t
        up = ub - u_t
        du, free = _boxqp_lanes(Quu, Qu, low, up, qp_iters)
        k = -du                            # [4,NB]
        QxuT = _transpose12(Qxu)                          # [4,8,NB]
        K = _masked_chol_solve(Quu, free, QxuT)           # [4,8,NB]

        Quuk = _matvec(Quu, k)
        Vx_new = Qx + _matvec_t(K, Quuk) - 2.0 * _matvec_t(K, Qu)
        Vxx_new = Qxx - _matmul(Qxu, K)
        Vxx_new = 0.5 * (Vxx_new + _transpose12(Vxx_new)) + eye8 * reg[None, None, :]

        Vx_s[:] = Vx_new
        Vxx_s[:] = Vxx_new
        k_ref[t] = k
        K_ref[t] = K

        # Failure taxonomy for the retry schedule: a failure at a knot whose
        # Quu was still finite is an indefinite/ill-conditioned factorization
        # (more regularization can fix it); a failure whose Quu already
        # overflowed is a doomed value recursion (more reg makes it worse).
        quu_ok = jnp.all(jnp.isfinite(Quu), axis=(0, 1))
        out_ok = (jnp.all(jnp.isfinite(k), axis=0)
                  & jnp.all(jnp.isfinite(K), axis=(0, 1))
                  & jnp.all(jnp.isfinite(Vx_new), axis=0)
                  & jnp.all(jnp.isfinite(Vxx_new), axis=(0, 1)))
        indef = jnp.maximum(indef, (quu_ok & ~out_ok).astype(dtype))

        dg = dg + jnp.sum(Qu * k, axis=0)
        dq = dq - jnp.sum(k * Quuk, axis=0)
        stop = stop + jnp.sum(Qu * Qu, axis=0)
        return dg, dq, stop, indef

    dg, dq, stop, indef = jax.lax.fori_loop(0, T, body, (zeros, zeros, zeros, zeros))
    ok = (jnp.isfinite(dg) & jnp.isfinite(dq) & jnp.isfinite(stop)
          & jnp.all(jnp.isfinite(Vx_s[:]), axis=0)).astype(dtype)
    stats_ref[0] = dg
    stats_ref[1] = dq
    stats_ref[2] = stop
    stats_ref[3] = ok
    stats_ref[4] = indef
    for r in range(5, 8):
        stats_ref[r] = zeros
    Vx_out_ref[:] = Vx_s[:]
    Vxx_out_ref[:] = Vxx_s[:]


def _riccati_fddp_kernel(T, nu, add_reg_to_carry,
                         Fx_ref, Fu_ref, Lx_ref, Lu_ref, Lxx_ref, Lxu_ref, Luu_ref,
                         tLx_ref, tLxx_ref, fs_ref, reg_ref,
                         k_ref, K_ref, Vxx_all_ref, stats_ref, cVx_ref, cVxx_ref,
                         Vx_s, Vxx_s):
    """FDDP (unconstrained) backward chunk: deflected Vx (+ Vxx fs) stored at
    every node (Crocoddyl SolverFDDP::backwardPass), per-node Vxx emitted for
    the line search's dv correction, and the gap terms of the expected
    improvement accumulated in-kernel."""
    dtype = Fx_ref.dtype
    NB = Fx_ref.shape[-1]
    eye8 = jnp.eye(NDX, dtype=dtype)[:, :, None]
    eyeu = jnp.eye(nu, dtype=dtype)[:, :, None]
    reg = reg_ref[0]
    zeros = jnp.zeros((NB,), dtype=dtype)

    if add_reg_to_carry:
        # terminal node: regularize Lxx, deflect Vx with fs[T], emit stats
        VxxT = tLxx_ref[:] + eye8 * reg[None, None, :]
        fsT = fs_ref[T]
        VxT = tLx_ref[:] + _matvec(VxxT, fsT)
        Vxx_s[:] = VxxT
        Vx_s[:] = VxT
        Vxx_all_ref[T] = VxxT
        dg_gap0 = -jnp.sum(VxT * fsT, axis=0)
        dq_gap0 = jnp.sum(fsT * _matvec(VxxT, fsT), axis=0)
    else:
        Vxx_s[:] = tLxx_ref[:]
        Vx_s[:] = tLx_ref[:]
        dg_gap0 = zeros
        dq_gap0 = zeros

    def body(i, carry):
        dg, dq, stop, dg_gap, dq_gap, indef = carry
        t = T - 1 - i
        Fx = Fx_ref[t]
        Fu = Fu_ref[t]
        Vx = Vx_s[:]
        Vxx = Vxx_s[:]

        Qx = Lx_ref[t] + _matvec_t(Fx, Vx)
        Qu = Lu_ref[t] + _matvec_t(Fu, Vx)
        FxTVxx = _matmul_t_left(Fx, Vxx)
        Qxx = Lxx_ref[t] + _matmul(FxTVxx, Fx)
        Qxu = Lxu_ref[t] + _matmul(FxTVxx, Fu)
        FuTVxx = _matmul_t_left(Fu, Vxx)
        Quu = Luu_ref[t] + _matmul(FuTVxx, Fu) + eyeu * reg[None, None, :]

        L = _chol4(Quu)
        k = _chol4_solve(L, Qu[:, None, :])[:, 0, :]
        QxuT = _transpose12(Qxu)
        K = _chol4_solve(L, QxuT)

        Quuk = _matvec(Quu, k)
        Vx_new = Qx + _matvec_t(K, Quuk) - 2.0 * _matvec_t(K, Qu)
        Vxx_new = Qxx - _matmul(Qxu, K)
        Vxx_new = 0.5 * (Vxx_new + _transpose12(Vxx_new)) + eye8 * reg[None, None, :]
        fs_t = fs_ref[t]
        Vx_new = Vx_new + _matvec(Vxx_new, fs_t)   # FDDP deflection

        Vx_s[:] = Vx_new
        Vxx_s[:] = Vxx_new
        k_ref[t] = k
        K_ref[t] = K
        Vxx_all_ref[t] = Vxx_new

        # retryable-failure detector (see the Box kernel for the taxonomy)
        quu_ok = jnp.all(jnp.isfinite(Quu), axis=(0, 1))
        out_ok = (jnp.all(jnp.isfinite(k), axis=0)
                  & jnp.all(jnp.isfinite(K), axis=(0, 1))
                  & jnp.all(jnp.isfinite(Vx_new), axis=0)
                  & jnp.all(jnp.isfinite(Vxx_new), axis=(0, 1)))
        indef = jnp.maximum(indef, (quu_ok & ~out_ok).astype(dtype))

        dg = dg + jnp.sum(Qu * k, axis=0)
        dq = dq - jnp.sum(k * Quuk, axis=0)
        stop = stop + jnp.sum(Qu * Qu, axis=0)
        dg_gap = dg_gap - jnp.sum(Vx_new * fs_t, axis=0)
        dq_gap = dq_gap + jnp.sum(fs_t * _matvec(Vxx_new, fs_t), axis=0)
        return dg, dq, stop, dg_gap, dq_gap, indef

    dg, dq, stop, dg_gap, dq_gap, indef = jax.lax.fori_loop(
        0, T, body, (zeros, zeros, zeros, dg_gap0, dq_gap0, zeros))
    ok = (jnp.isfinite(dg) & jnp.isfinite(stop)
          & jnp.all(jnp.isfinite(Vx_s[:]), axis=0)).astype(dtype)
    stats_ref[0] = dg
    stats_ref[1] = dq
    stats_ref[2] = stop
    stats_ref[3] = ok
    stats_ref[4] = dg_gap
    stats_ref[5] = dq_gap
    stats_ref[6] = indef
    stats_ref[7] = zeros
    cVx_ref[:] = Vx_s[:]
    cVxx_ref[:] = Vxx_s[:]


def _riccati_boxfddp_kernel(T, nu, qp_iters, add_reg_to_carry,
                            Fx_ref, Fu_ref, Lx_ref, Lu_ref, Lxx_ref, Lxu_ref, Luu_ref,
                            tLx_ref, tLxx_ref, fs_ref, us_ref, lb_ref, ub_ref, reg_ref,
                            k_ref, K_ref, Vxx_all_ref, stats_ref, cVx_ref, cVxx_ref,
                            Vx_s, Vxx_s):
    """BoxFDDP backward chunk (Crocoddyl ``SolverBoxFDDP``): the FDDP
    deflected value recursion + gap accumulators with the per-knot masked
    BoxQP / free-clamped gain partition of the Box kernel."""
    dtype = Fx_ref.dtype
    NB = Fx_ref.shape[-1]
    eye8 = jnp.eye(NDX, dtype=dtype)[:, :, None]
    eyeu = jnp.eye(nu, dtype=dtype)[:, :, None]
    reg = reg_ref[0]
    zeros = jnp.zeros((NB,), dtype=dtype)
    lb = lb_ref[:]
    ub = ub_ref[:]

    if add_reg_to_carry:
        VxxT = tLxx_ref[:] + eye8 * reg[None, None, :]
        fsT = fs_ref[T]
        VxT = tLx_ref[:] + _matvec(VxxT, fsT)
        Vxx_s[:] = VxxT
        Vx_s[:] = VxT
        Vxx_all_ref[T] = VxxT
        dg_gap0 = -jnp.sum(VxT * fsT, axis=0)
        dq_gap0 = jnp.sum(fsT * _matvec(VxxT, fsT), axis=0)
    else:
        Vxx_s[:] = tLxx_ref[:]
        Vx_s[:] = tLx_ref[:]
        dg_gap0 = zeros
        dq_gap0 = zeros

    def body(i, carry):
        dg, dq, stop, dg_gap, dq_gap, indef = carry
        t = T - 1 - i
        Fx = Fx_ref[t]
        Fu = Fu_ref[t]
        Vx = Vx_s[:]
        Vxx = Vxx_s[:]

        Qx = Lx_ref[t] + _matvec_t(Fx, Vx)
        Qu = Lu_ref[t] + _matvec_t(Fu, Vx)
        FxTVxx = _matmul_t_left(Fx, Vxx)
        Qxx = Lxx_ref[t] + _matmul(FxTVxx, Fx)
        Qxu = Lxu_ref[t] + _matmul(FxTVxx, Fu)
        FuTVxx = _matmul_t_left(Fu, Vxx)
        Quu = Luu_ref[t] + _matmul(FuTVxx, Fu) + eyeu * reg[None, None, :]

        u_t = us_ref[t]
        low = lb - u_t
        up = ub - u_t
        du, free = _boxqp_lanes(Quu, Qu, low, up, qp_iters)
        k = -du
        QxuT = _transpose12(Qxu)
        K = _masked_chol_solve(Quu, free, QxuT)

        Quuk = _matvec(Quu, k)
        Vx_new = Qx + _matvec_t(K, Quuk) - 2.0 * _matvec_t(K, Qu)
        Vxx_new = Qxx - _matmul(Qxu, K)
        Vxx_new = 0.5 * (Vxx_new + _transpose12(Vxx_new)) + eye8 * reg[None, None, :]
        fs_t = fs_ref[t]
        Vx_new = Vx_new + _matvec(Vxx_new, fs_t)   # FDDP deflection

        Vx_s[:] = Vx_new
        Vxx_s[:] = Vxx_new
        k_ref[t] = k
        K_ref[t] = K
        Vxx_all_ref[t] = Vxx_new

        quu_ok = jnp.all(jnp.isfinite(Quu), axis=(0, 1))
        out_ok = (jnp.all(jnp.isfinite(k), axis=0)
                  & jnp.all(jnp.isfinite(K), axis=(0, 1))
                  & jnp.all(jnp.isfinite(Vx_new), axis=0)
                  & jnp.all(jnp.isfinite(Vxx_new), axis=(0, 1)))
        indef = jnp.maximum(indef, (quu_ok & ~out_ok).astype(dtype))

        dg = dg + jnp.sum(Qu * k, axis=0)
        dq = dq - jnp.sum(k * Quuk, axis=0)
        stop = stop + jnp.sum(Qu * Qu, axis=0)
        dg_gap = dg_gap - jnp.sum(Vx_new * fs_t, axis=0)
        dq_gap = dq_gap + jnp.sum(fs_t * _matvec(Vxx_new, fs_t), axis=0)
        return dg, dq, stop, dg_gap, dq_gap, indef

    dg, dq, stop, dg_gap, dq_gap, indef = jax.lax.fori_loop(
        0, T, body, (zeros, zeros, zeros, dg_gap0, dq_gap0, zeros))
    ok = (jnp.isfinite(dg) & jnp.isfinite(stop)
          & jnp.all(jnp.isfinite(Vx_s[:]), axis=0)).astype(dtype)
    stats_ref[0] = dg
    stats_ref[1] = dq
    stats_ref[2] = stop
    stats_ref[3] = ok
    stats_ref[4] = dg_gap
    stats_ref[5] = dq_gap
    stats_ref[6] = indef
    stats_ref[7] = zeros
    cVx_ref[:] = Vx_s[:]
    cVxx_ref[:] = Vxx_s[:]


class FddpBackwardOut(NamedTuple):
    k: jnp.ndarray        # [B, T, nu]
    K: jnp.ndarray        # [B, T, nu, 8]
    Vxx: jnp.ndarray      # [B, T+1, 8, 8] (for the dv correction)
    dg: jnp.ndarray
    dq: jnp.ndarray
    stop: jnp.ndarray
    dg_gap: jnp.ndarray
    dq_gap: jnp.ndarray
    ok: jnp.ndarray
    retryable: jnp.ndarray  # failure was indefinite Quu (reg bump can help)


def _fddp_chunk_call(Tc, nu, nb, interpret, add_reg, dtype, Bp, args):
    grid = (Bp // nb,)

    def spec(*dims):
        block = dims + (nb,)
        ndim = len(block)
        return pl.BlockSpec(block, lambda b: (0,) * (ndim - 1) + (b,), memory_space=pltpu.VMEM)

    # fs chunk block covers Tc+1 entries (node T of the chunk only used by
    # the terminal branch); pass the fs slice with one extra row.
    kernel = functools.partial(_riccati_fddp_kernel, Tc, nu, add_reg)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec(Tc, NDX, NDX), spec(Tc, NDX, nu), spec(Tc, NDX), spec(Tc, nu),
            spec(Tc, NDX, NDX), spec(Tc, NDX, nu), spec(Tc, nu, nu),
            spec(NDX), spec(NDX, NDX), spec(Tc + 1, NDX), spec(1),
        ],
        out_specs=[spec(Tc, nu), spec(Tc, nu, NDX), spec(Tc + 1, NDX, NDX), spec(8),
                   spec(NDX), spec(NDX, NDX)],
        out_shape=out_structs([
            jax.ShapeDtypeStruct((Tc, nu, Bp), dtype),
            jax.ShapeDtypeStruct((Tc, nu, NDX, Bp), dtype),
            jax.ShapeDtypeStruct((Tc + 1, NDX, NDX, Bp), dtype),
            jax.ShapeDtypeStruct((8, Bp), dtype),
            jax.ShapeDtypeStruct((NDX, Bp), dtype),
            jax.ShapeDtypeStruct((NDX, NDX, Bp), dtype),
        ], args[0]),
        scratch_shapes=[
            pltpu.VMEM((NDX, nb), dtype),
            pltpu.VMEM((NDX, NDX, nb), dtype),
        ],
        interpret=interpret,
    )(*args)


def riccati_fddp_backward_lanes(Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l, Luu_l,
                                tLx_l, tLxx_l, fs_l, reg,
                                nu: int = 2, nb: int = 128, t_chunk: int = 25,
                                interpret: bool = False) -> FddpBackwardOut:
    """Lane-IO fused FDDP backward: no batch-major transposes.

    Inputs already in lane layout (trailing dim Bp, a multiple of ``nb``):
    Fx_l [T,8,8,Bp], Fu_l [T,8,nu,Bp], Lx_l [T,8,Bp], Lu_l [T,nu,Bp],
    Lxx_l [T,8,8,Bp], Lxu_l [T,8,nu,Bp], Luu_l [T,nu,nu,Bp],
    tLx_l [8,Bp], tLxx_l [8,8,Bp], fs_l [T+1,8,Bp], reg [Bp]. Returns a
    :class:`FddpBackwardOut` whose k/K/Vxx stay in lane layout
    ([T,nu,Bp] / [T,nu,8,Bp] / [T+1,8,8,Bp]); stats are [Bp] vectors.
    """
    T = Fx_l.shape[0]
    dtype = Fx_l.dtype
    Bp = Fx_l.shape[-1]
    reg_l = reg[None, :]

    n_chunks = (T + t_chunk - 1) // t_chunk
    carry_Vx, carry_Vxx = tLx_l, tLxx_l
    add_reg = True
    ks, Ks, Vxxs, stats_acc = [], [], [], None
    for c in range(n_chunks - 1, -1, -1):
        lo = c * t_chunk
        hi = min(T, lo + t_chunk)
        Tc = hi - lo
        out = _fddp_chunk_call(
            Tc, nu, nb, interpret, add_reg, dtype, Bp,
            (Fx_l[lo:hi], Fu_l[lo:hi], Lx_l[lo:hi], Lu_l[lo:hi],
             Lxx_l[lo:hi], Lxu_l[lo:hi], Luu_l[lo:hi],
             carry_Vx, carry_Vxx, fs_l[lo:hi + 1], reg_l))
        k_c, K_c, Vxx_c, stats_c, carry_Vx, carry_Vxx = out
        if add_reg:
            Vxxs.append(Vxx_c)            # includes node T row
        else:
            Vxxs.append(Vxx_c[:Tc])
        add_reg = False
        ks.append(k_c)
        Ks.append(K_c)
        stats_acc = stats_c if stats_acc is None else stats_acc + stats_c

    k_l = jnp.concatenate(ks[::-1], axis=0)
    K_l = jnp.concatenate(Ks[::-1], axis=0)
    Vxx_l = jnp.concatenate(Vxxs[::-1], axis=0)       # [T+1, 8, 8, Bp]
    n_chunks_f = float(n_chunks)
    return FddpBackwardOut(
        k=k_l, K=K_l, Vxx=Vxx_l,
        dg=stats_acc[0], dq=stats_acc[1], stop=stats_acc[2],
        dg_gap=stats_acc[4], dq_gap=stats_acc[5],
        ok=stats_acc[3] > (n_chunks_f - 0.5),
        retryable=stats_acc[6] > 0.5,
    )


def _boxfddp_chunk_call(Tc, nu, qp_iters, nb, interpret, add_reg, dtype, Bp, args):
    grid = (Bp // nb,)

    def spec(*dims):
        block = dims + (nb,)
        ndim = len(block)
        return pl.BlockSpec(block, lambda b: (0,) * (ndim - 1) + (b,), memory_space=pltpu.VMEM)

    kernel = functools.partial(_riccati_boxfddp_kernel, Tc, nu, qp_iters, add_reg)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec(Tc, NDX, NDX), spec(Tc, NDX, nu), spec(Tc, NDX), spec(Tc, nu),
            spec(Tc, NDX, NDX), spec(Tc, NDX, nu), spec(Tc, nu, nu),
            spec(NDX), spec(NDX, NDX), spec(Tc + 1, NDX),
            spec(Tc, nu), spec(nu), spec(nu), spec(1),
        ],
        out_specs=[spec(Tc, nu), spec(Tc, nu, NDX), spec(Tc + 1, NDX, NDX), spec(8),
                   spec(NDX), spec(NDX, NDX)],
        out_shape=out_structs([
            jax.ShapeDtypeStruct((Tc, nu, Bp), dtype),
            jax.ShapeDtypeStruct((Tc, nu, NDX, Bp), dtype),
            jax.ShapeDtypeStruct((Tc + 1, NDX, NDX, Bp), dtype),
            jax.ShapeDtypeStruct((8, Bp), dtype),
            jax.ShapeDtypeStruct((NDX, Bp), dtype),
            jax.ShapeDtypeStruct((NDX, NDX, Bp), dtype),
        ], args[0]),
        scratch_shapes=[
            pltpu.VMEM((NDX, nb), dtype),
            pltpu.VMEM((NDX, NDX, nb), dtype),
        ],
        interpret=interpret,
    )(*args)


def riccati_boxfddp_backward_lanes(Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l, Luu_l,
                                   tLx_l, tLxx_l, fs_l, us_l, lb_l, ub_l, reg,
                                   qp_iters: int = _QP_ITERS, nb: int = 128,
                                   t_chunk: int = 25,
                                   interpret: bool = False) -> FddpBackwardOut:
    """Lane-IO fused BoxFDDP backward (gaps + bounds): FDDP deflected value
    recursion + gap accumulators with the masked BoxQP gain partition.
    Same layout contract as :func:`riccati_fddp_backward_lanes` plus
    us_l [T,nu,Bp] and lb_l/ub_l [nu,Bp]."""
    T = Fx_l.shape[0]
    dtype = Fx_l.dtype
    Bp = Fx_l.shape[-1]
    nu = Fu_l.shape[2]
    reg_l = reg[None, :]

    n_chunks = (T + t_chunk - 1) // t_chunk
    carry_Vx, carry_Vxx = tLx_l, tLxx_l
    add_reg = True
    ks, Ks, Vxxs, stats_acc = [], [], [], None
    for c in range(n_chunks - 1, -1, -1):
        lo = c * t_chunk
        hi = min(T, lo + t_chunk)
        Tc = hi - lo
        out = _boxfddp_chunk_call(
            Tc, nu, qp_iters, nb, interpret, add_reg, dtype, Bp,
            (Fx_l[lo:hi], Fu_l[lo:hi], Lx_l[lo:hi], Lu_l[lo:hi],
             Lxx_l[lo:hi], Lxu_l[lo:hi], Luu_l[lo:hi],
             carry_Vx, carry_Vxx, fs_l[lo:hi + 1],
             us_l[lo:hi], lb_l, ub_l, reg_l))
        k_c, K_c, Vxx_c, stats_c, carry_Vx, carry_Vxx = out
        if add_reg:
            Vxxs.append(Vxx_c)
        else:
            Vxxs.append(Vxx_c[:Tc])
        add_reg = False
        ks.append(k_c)
        Ks.append(K_c)
        stats_acc = stats_c if stats_acc is None else stats_acc + stats_c

    k_l = jnp.concatenate(ks[::-1], axis=0)
    K_l = jnp.concatenate(Ks[::-1], axis=0)
    Vxx_l = jnp.concatenate(Vxxs[::-1], axis=0)
    n_chunks_f = float(n_chunks)
    return FddpBackwardOut(
        k=k_l, K=K_l, Vxx=Vxx_l,
        dg=stats_acc[0], dq=stats_acc[1], stop=stats_acc[2],
        dg_gap=stats_acc[4], dq_gap=stats_acc[5],
        ok=stats_acc[3] > (n_chunks_f - 0.5),
        retryable=stats_acc[6] > 0.5,
    )


@functools.partial(jax.jit, static_argnames=("qp_iters", "nb", "t_chunk", "interpret"))
def riccati_boxfddp_backward(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, term_Lx, term_Lxx,
                             fs, us, lb, ub, reg, qp_iters: int = _QP_ITERS,
                             nb: int = 128, t_chunk: int = 25,
                             interpret: bool = False) -> FddpBackwardOut:
    """Batched fused BoxFDDP backward (batch-major inputs: fs [B,T+1,8],
    us [B,T,nu], lb/ub [B,nu])."""
    B = Fx.shape[0]
    dtype = Fx.dtype
    Bp = ((B + nb - 1) // nb) * nb

    def to_lanes(x):
        x = _pad_to(x, Bp, 0)
        perm = tuple(range(1, x.ndim)) + (0,)
        return jnp.transpose(x, perm)

    Fx_l, Fu_l, Lx_l, Lu_l = map(to_lanes, (Fx, Fu, Lx, Lu))
    Lxx_l, Lxu_l, Luu_l = map(to_lanes, (Lxx, Lxu, Luu))
    tLx_l, tLxx_l, fs_l = map(to_lanes, (term_Lx, term_Lxx, fs))
    us_l, lb_l, ub_l = map(to_lanes, (us, lb, ub))
    reg_p = jnp.concatenate([reg, jnp.ones(Bp - B, dtype=dtype)])

    out = riccati_boxfddp_backward_lanes(
        Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l, Luu_l, tLx_l, tLxx_l, fs_l,
        us_l, lb_l, ub_l, reg_p, qp_iters=qp_iters, nb=nb, t_chunk=t_chunk,
        interpret=interpret)
    k = jnp.transpose(out.k, (2, 0, 1))[:B]
    K = jnp.transpose(out.K, (3, 0, 1, 2))[:B]
    Vxx = jnp.transpose(out.Vxx, (3, 0, 1, 2))[:B]
    return FddpBackwardOut(
        k=k, K=K, Vxx=Vxx,
        dg=out.dg[:B], dq=out.dq[:B], stop=out.stop[:B],
        dg_gap=out.dg_gap[:B], dq_gap=out.dq_gap[:B],
        ok=out.ok[:B], retryable=out.retryable[:B],
    )


@functools.partial(jax.jit, static_argnames=("nu", "nb", "t_chunk", "interpret"))
def riccati_fddp_backward(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, term_Lx, term_Lxx,
                          fs, reg, nu: int = 2, nb: int = 128, t_chunk: int = 25,
                          interpret: bool = False) -> FddpBackwardOut:
    """Batched fused FDDP backward pass (batch-major inputs, fs [B,T+1,8])."""
    B = Fx.shape[0]
    dtype = Fx.dtype
    Bp = ((B + nb - 1) // nb) * nb

    def to_lanes(x):
        x = _pad_to(x, Bp, 0)
        perm = tuple(range(1, x.ndim)) + (0,)
        return jnp.transpose(x, perm)

    Fx_l, Fu_l, Lx_l, Lu_l = map(to_lanes, (Fx, Fu, Lx, Lu))
    Lxx_l, Lxu_l, Luu_l = map(to_lanes, (Lxx, Lxu, Luu))
    tLx_l, tLxx_l, fs_l = map(to_lanes, (term_Lx, term_Lxx, fs))
    reg_p = jnp.concatenate([reg, jnp.ones(Bp - B, dtype=dtype)])

    out = riccati_fddp_backward_lanes(
        Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l, Luu_l, tLx_l, tLxx_l, fs_l,
        reg_p, nu=nu, nb=nb, t_chunk=t_chunk, interpret=interpret)
    k = jnp.transpose(out.k, (2, 0, 1))[:B]
    K = jnp.transpose(out.K, (3, 0, 1, 2))[:B]
    Vxx = jnp.transpose(out.Vxx, (3, 0, 1, 2))[:B]
    return FddpBackwardOut(
        k=k, K=K, Vxx=Vxx,
        dg=out.dg[:B], dq=out.dq[:B], stop=out.stop[:B],
        dg_gap=out.dg_gap[:B], dq_gap=out.dq_gap[:B],
        ok=out.ok[:B], retryable=out.retryable[:B],
    )


class BoxBackwardOut(NamedTuple):
    k: jnp.ndarray      # [B, T, 4]
    K: jnp.ndarray      # [B, T, 4, 8]
    dg: jnp.ndarray     # [B]
    dq: jnp.ndarray     # [B]
    stop: jnp.ndarray   # [B]
    ok: jnp.ndarray     # [B] bool
    retryable: jnp.ndarray  # [B] bool: failure was indefinite Quu


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _chunk_call(Tc, qp_iters, nb, interpret, add_reg, dtype, Bp, args):
    """One pallas_call over a T-chunk; returns (k, K, stats, Vx, Vxx)."""
    grid = (Bp // nb,)

    def spec(*dims):
        block = dims + (nb,)
        ndim = len(block)
        return pl.BlockSpec(block, lambda b: (0,) * (ndim - 1) + (b,), memory_space=pltpu.VMEM)

    kernel = functools.partial(_riccati_box_kernel, Tc, qp_iters, add_reg)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec(Tc, NDX, NDX), spec(Tc, NDX, NU), spec(Tc, NDX), spec(Tc, NU),
            spec(Tc, NDX, NDX), spec(Tc, NDX, NU), spec(Tc, NU, NU),
            spec(NDX), spec(NDX, NDX), spec(Tc, NU), spec(NU), spec(NU), spec(1),
        ],
        out_specs=[spec(Tc, NU), spec(Tc, NU, NDX), spec(8), spec(NDX), spec(NDX, NDX)],
        out_shape=out_structs([
            jax.ShapeDtypeStruct((Tc, NU, Bp), dtype),
            jax.ShapeDtypeStruct((Tc, NU, NDX, Bp), dtype),
            jax.ShapeDtypeStruct((8, Bp), dtype),
            jax.ShapeDtypeStruct((NDX, Bp), dtype),
            jax.ShapeDtypeStruct((NDX, NDX, Bp), dtype),
        ], args[0]),
        scratch_shapes=[
            pltpu.VMEM((NDX, nb), dtype),
            pltpu.VMEM((NDX, NDX, nb), dtype),
        ],
        interpret=interpret,
    )(*args)


def riccati_box_backward_lanes(Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l, Luu_l,
                               tLx_l, tLxx_l, us_l, lb_l, ub_l, reg,
                               qp_iters: int = _QP_ITERS, nb: int = 128,
                               t_chunk: int = 25,
                               interpret: bool = False) -> BoxBackwardOut:
    """Lane-IO fused Box backward: no batch-major transposes.

    Inputs already in lane layout: Fx_l [T,8,8,Bp], Fu_l [T,8,4,Bp],
    Lx_l [T,8,Bp], Lu_l [T,4,Bp], Lxx_l [T,8,8,Bp], Lxu_l [T,8,4,Bp],
    Luu_l [T,4,4,Bp], tLx_l [8,Bp], tLxx_l [8,8,Bp], us_l [T,4,Bp],
    lb_l/ub_l [4,Bp], reg [Bp] (Bp a multiple of ``nb``). Returns a
    :class:`BoxBackwardOut` whose k/K stay in lane layout
    ([T,4,Bp] / [T,4,8,Bp]); stats are [Bp] vectors.
    """
    T = Fx_l.shape[0]
    dtype = Fx_l.dtype
    reg_l = reg[None, :]

    n_chunks = (T + t_chunk - 1) // t_chunk
    carry_Vx, carry_Vxx = tLx_l, tLxx_l
    add_reg = True
    ks, Ks, stats_acc = [], [], None
    Bp = Fx_l.shape[-1]
    for c in range(n_chunks - 1, -1, -1):
        lo = c * t_chunk
        hi = min(T, lo + t_chunk)
        Tc = hi - lo
        out = _chunk_call(
            Tc, qp_iters, nb, interpret, add_reg, dtype, Bp,
            (Fx_l[lo:hi], Fu_l[lo:hi], Lx_l[lo:hi], Lu_l[lo:hi],
             Lxx_l[lo:hi], Lxu_l[lo:hi], Luu_l[lo:hi],
             carry_Vx, carry_Vxx, us_l[lo:hi], lb_l, ub_l, reg_l))
        k_c, K_c, stats_c, carry_Vx, carry_Vxx = out
        add_reg = False
        ks.append(k_c)
        Ks.append(K_c)
        stats_acc = stats_c if stats_acc is None else stats_acc + stats_c

    k_l = jnp.concatenate(ks[::-1], axis=0)
    K_l = jnp.concatenate(Ks[::-1], axis=0)
    ok = stats_acc[3] > (float(n_chunks) - 0.5)       # every chunk finite
    return BoxBackwardOut(k=k_l, K=K_l, dg=stats_acc[0], dq=stats_acc[1],
                          stop=stats_acc[2], ok=ok,
                          retryable=stats_acc[4] > 0.5)


@functools.partial(jax.jit, static_argnames=("qp_iters", "nb", "t_chunk", "interpret"))
def riccati_box_backward(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, term_Lx, term_Lxx,
                         us, lb, ub, reg, qp_iters: int = _QP_ITERS,
                         nb: int = 128, t_chunk: int = 25,
                         interpret: bool = False) -> BoxBackwardOut:
    """Batched fused backward pass.

    Batch-major inputs: Fx [B,T,8,8], Fu [B,T,8,4], Lx [B,T,8], Lu [B,T,4],
    Lxx [B,T,8,8], Lxu [B,T,8,4], Luu [B,T,4,4], term_Lx [B,8],
    term_Lxx [B,8,8], us [B,T,4], lb/ub [B,4], reg [B].

    The time axis is processed in reverse-order chunks of ``t_chunk`` knots
    with the (Vx, Vxx) carry passed between pallas_calls — full-T blocks
    would exceed VMEM with double buffering at 128 lanes.
    """
    B = Fx.shape[0]
    dtype = Fx.dtype
    Bp = ((B + nb - 1) // nb) * nb

    def to_lanes(x):
        x = _pad_to(x, Bp, 0)
        perm = tuple(range(1, x.ndim)) + (0,)
        return jnp.transpose(x, perm)

    Fx_l, Fu_l, Lx_l, Lu_l = map(to_lanes, (Fx, Fu, Lx, Lu))
    Lxx_l, Lxu_l, Luu_l, us_l = map(to_lanes, (Lxx, Lxu, Luu, us))
    tLx_l, tLxx_l, lb_l, ub_l = map(to_lanes, (term_Lx, term_Lxx, lb, ub))
    # padded lanes get reg 1.0 to keep their Cholesky finite
    reg_p = jnp.concatenate([reg, jnp.ones(Bp - B, dtype=dtype)])

    out = riccati_box_backward_lanes(
        Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l, Luu_l, tLx_l, tLxx_l,
        us_l, lb_l, ub_l, reg_p, qp_iters=qp_iters, nb=nb, t_chunk=t_chunk,
        interpret=interpret)
    k = jnp.transpose(out.k, (2, 0, 1))[:B]           # [B,T,4]
    K = jnp.transpose(out.K, (3, 0, 1, 2))[:B]        # [B,T,4,8]
    return BoxBackwardOut(k=k, K=K, dg=out.dg[:B], dq=out.dq[:B],
                          stop=out.stop[:B], ok=out.ok[:B],
                          retryable=out.retryable[:B])
