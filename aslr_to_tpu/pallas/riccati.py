"""Fused Pallas backward-Riccati kernels for the Box-DDP family.

The XLA-scan backward pass executes ~500 small HLO ops per knot (8x8
algebra + a projected-Newton BoxQP); at T=100 that is tens of thousands of
latency-bound dispatches per solver iteration and dominates the profile
(SURVEY §7 stage 5 — measured 130 ms vs 12.5 ms for the Cholesky-only
sweep at batch 256). These kernels fuse the ENTIRE sweep — value
recursion, masked BoxQP, free/clamped gain solves, expected-improvement /
stop accumulators — into ONE kernel launch.

Layout (round 3): scenarios ride the vector lanes AND sublanes. Every
per-scenario matrix is an array ``[..., rows, cols?, P, NB]`` whose
trailing two dims fill one (8, 128) f32 vector register — 1024 scenarios
per elementwise instruction (see :mod:`.layout` and
``scripts/probe_sublane.py``: the 1-D [128] layout used one sublane in
eight, capping the VPU at 12%). An 8x8 matmul is 512 fused multiply-adds
on full vregs (pure VPU work, no MXU needed at these sizes).

The time axis is chunked INSIDE the grid: ``grid = (batch_tiles,
n_chunks)`` with the chunk axis innermost, the (Vx, Vxx) value carry
living in VMEM scratch across chunk steps (TPU grids execute
sequentially), and the improvement/stop statistics accumulated into a
revisited output block. One launch per backward sweep, VMEM-sized blocks.

Integration: the ``*_lanes`` functions take/return lane-layout tensors
(trailing dim Bp) and are what the lane-resident solver calls; the
batch-major wrappers relayout at the boundary for ``vmap`` dispatch from
the per-scenario solver.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.vma import out_structs
from .layout import NB, add_diag, from_packed, pack_dims, padded_batch, pick_chunks, to_packed

NDX = 8   # soft 2-DoF state tangent dim
NU = 4    # VSA control dim

_QP_ITERS = 6
_QP_ALPHAS = (1.0, 0.5, 0.25, 0.125, 0.0625)


# ---------------------------------------------------------------------------
# lane-wise small linear algebra (arrays [n, m?, batch...] — rank-generic in
# the trailing batch dims, so the same code runs [.., NB] and [.., P, NB])
# ---------------------------------------------------------------------------

# All contractions are broadcast-multiply + reductions over LEADING axes —
# Mosaic lowers these to VPU elementwise ops and adds; tiny-dim dot_general
# is not lowerable on TPU.

# The one-shot broadcast forms materialize an [n,k,m,batch...] outer
# product before the reduction — at the 2-DoF sizes (<= 8x8x8, <= 2 MB)
# that is the fastest Mosaic lowering and is kept verbatim (bit-pinned by
# the interpret parity suite). At the big-state sizes (ndx=28: 22.5 MB
# per product) it blows the kernel's scoped-VMEM stack, so matmuls above
# the threshold accumulate row-by-row ([k,m,batch...] live at a time).
_MM_ONESHOT_MAX = 512


def _matmul_t_left(A, B):
    """A^T @ B per lane: A [k,n,...], B [k,m,...] -> [n,m,...]."""
    if A.shape[0] * A.shape[1] * B.shape[1] <= _MM_ONESHOT_MAX:
        return jnp.sum(A[:, :, None] * B[:, None], axis=0)
    return jnp.stack([jnp.sum(A[:, i][:, None] * B, axis=0)
                      for i in range(A.shape[1])])


def _matmul(A, B):
    """A @ B per lane: A [n,k,...], B [k,m,...] -> [n,m,...]."""
    if A.shape[0] * A.shape[1] * B.shape[1] <= _MM_ONESHOT_MAX:
        return jnp.sum(A[:, :, None] * B[None], axis=1)
    return jnp.stack([jnp.sum(A[i][:, None] * B, axis=0)
                      for i in range(A.shape[0])])


def _matvec_t(A, v):
    """A^T @ v per lane: A [k,n,...], v [k,...] -> [n,...]."""
    return jnp.sum(A * v[:, None], axis=0)


def _matvec(A, v):
    """A @ v per lane: A [n,k,...], v [k,...] -> [n,...]."""
    return jnp.sum(A * v[None], axis=1)


def _transpose12(A):
    """Swap the two leading (untiled) matrix axes of A [n,m,...] -> [m,n,...]
    via slice-and-stack (leading-axis relayout, Mosaic-safe)."""
    return jnp.stack([A[:, j] for j in range(A.shape[1])], axis=0)


def _chol4(A):
    """Unrolled n x n Cholesky per lane; A [n,n,...] -> rows of L (lists)."""
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
    """Solve L L^T x = b per lane for each column; b_cols [n, m, ...]."""
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
        cols.append(jnp.stack(x))          # [n, ...]
    return jnp.stack(cols, axis=1)         # [n, m, ...]


def _masked_chol_solve(Quu, free, B_cols):
    """Free-subsystem solve via the masked full-size system (exact zeros on
    clamped rows) — the same trick as solvers/boxqp.masked_free_solve."""
    n = Quu.shape[0]
    mask2 = free[:, None] * free[None]
    A = add_diag(Quu * mask2, 1.0 - free)
    L = _chol4(A)
    return _chol4_solve(L, B_cols * free[:, None])


def _boxqp_lanes(Quu, Qu, low, up, qp_iters, x0=None):
    """Masked projected-Newton box QP per lane.

    Quu [4,4,...], Qu/low/up [4,...] -> (x [4,...], free [4,...] as f32).
    ``x0`` warm-starts the iterate (clipped into the box); None starts at 0
    like Crocoddyl's BoxQP default.
    """
    x = jnp.clip(jnp.zeros_like(Qu) if x0 is None else x0, low, up)
    for _ in range(qp_iters):
        g = Qu + _matvec(Quu, x)
        clamped = ((x <= low) & (g >= 0.0)) | ((x >= up) & (g <= 0.0))
        free = 1.0 - clamped.astype(Qu.dtype)
        dx = -_masked_chol_solve(Quu, free, g[:, None])[:, 0]

        f0 = 0.5 * jnp.sum(x * _matvec(Quu, x), axis=0) + jnp.sum(Qu * x, axis=0)
        gdx = jnp.sum(g * dx, axis=0)
        best_x = x
        accepted = jnp.zeros(x.shape[1:], dtype=bool)
        for a in _QP_ALPHAS:
            xa = jnp.clip(x + a * dx, low, up)
            fa = 0.5 * jnp.sum(xa * _matvec(Quu, xa), axis=0) + jnp.sum(Qu * xa, axis=0)
            ok_a = (fa - f0 <= 0.1 * a * gdx) & (~accepted)
            best_x = jnp.where(ok_a[None], xa, best_x)
            accepted = accepted | ok_a
        x = best_x
    g = Qu + _matvec(Quu, x)
    clamped = ((x <= low) & (g >= 0.0)) | ((x >= up) & (g <= 0.0))
    free = 1.0 - clamped.astype(Qu.dtype)
    return x, free


# ---------------------------------------------------------------------------
# the kernels — one launch per sweep, grid (batch_tiles, time_chunks)
# ---------------------------------------------------------------------------
#
# Chunk j of the grid processes time chunk c = NC-1-j (the sweep runs
# backward). With front padding (pick_chunks), knots at global index < pad
# are masked no-ops whose k/K rows the host slices off.

def _box_at(lb_ref, ub_ref, u_t, trow, box_pk):
    """Per-knot QP bounds ``(lb - u, ub - u)``: whole-table [Tp, nu] SMEM
    scalar rows indexed by global knot ``trow`` when ``box_pk``, lane
    blocks [nu, batch...] otherwise."""
    if box_pk:
        nu = u_t.shape[0]
        low = jnp.stack([lb_ref[trow, j] - u_t[j] for j in range(nu)])
        up = jnp.stack([ub_ref[trow, j] - u_t[j] for j in range(nu)])
        return low, up
    return lb_ref[:] - u_t, ub_ref[:] - u_t


def _riccati_box_kernel(Tc, NC, pad, qp_iters, box_pk, warm, *refs):
    if warm:
        (Fx_ref, Fu_ref, Lx_ref, Lu_ref, Lxx_ref, Lxu_ref, Luu_ref,
         tLx_ref, tLxx_ref, us_ref, kprev_ref, lb_ref, ub_ref, reg_ref,
         k_ref, K_ref, stats_ref, Vx_out_ref, Vxx_out_ref, Vx_s, Vxx_s) = refs
    else:
        (Fx_ref, Fu_ref, Lx_ref, Lu_ref, Lxx_ref, Lxu_ref, Luu_ref,
         tLx_ref, tLxx_ref, us_ref, lb_ref, ub_ref, reg_ref,
         k_ref, K_ref, stats_ref, Vx_out_ref, Vxx_out_ref, Vx_s, Vxx_s) = refs
        kprev_ref = None
    dtype = Fx_ref.dtype
    reg = reg_ref[:]                      # [P, nb]
    j = pl.program_id(1)
    c = NC - 1 - j

    @pl.when(j == 0)
    def _():
        Vxx_s[:] = add_diag(tLxx_ref[:], reg)
        Vx_s[:] = tLx_ref[:]
        stats_ref[:] = jnp.zeros_like(stats_ref)

    zeros = jnp.zeros_like(reg)

    def body(i, carry):
        dg, dq, stop, indef = carry
        t = Tc - 1 - i
        Fx = Fx_ref[t]                    # [8,8,P,nb]
        Fu = Fu_ref[t]                    # [8,4,P,nb]
        Vx = Vx_s[:]
        Vxx = Vxx_s[:]

        Qx = Lx_ref[t] + _matvec_t(Fx, Vx)
        Qu = Lu_ref[t] + _matvec_t(Fu, Vx)
        FxTVxx = _matmul_t_left(Fx, Vxx)
        Qxx = Lxx_ref[t] + _matmul(FxTVxx, Fx)
        Qxu = Lxu_ref[t] + _matmul(FxTVxx, Fu)
        FuTVxx = _matmul_t_left(Fu, Vxx)
        Quu = add_diag(Luu_ref[t] + _matmul(FuTVxx, Fu), reg)

        u_t = us_ref[t]                   # [4,P,nb]
        low, up = _box_at(lb_ref, ub_ref, u_t, c * Tc + t, box_pk)
        # warm start: previous solver iteration's du = -k at this knot
        x0 = None if kprev_ref is None else -kprev_ref[t]
        du, free = _boxqp_lanes(Quu, Qu, low, up, qp_iters, x0)
        k = -du                           # [4,P,nb]
        QxuT = _transpose12(Qxu)                          # [4,8,P,nb]
        K = _masked_chol_solve(Quu, free, QxuT)           # [4,8,P,nb]

        Quuk = _matvec(Quu, k)
        Vx_new = Qx + _matvec_t(K, Quuk) - 2.0 * _matvec_t(K, Qu)
        Vxx_new = Qxx - _matmul(Qxu, K)
        Vxx_new = add_diag(0.5 * (Vxx_new + _transpose12(Vxx_new)), reg)

        # Failure taxonomy for the retry schedule: a failure at a knot whose
        # Quu was still finite is an indefinite/ill-conditioned factorization
        # (more regularization can fix it); a failure whose Quu already
        # overflowed is a doomed value recursion (more reg makes it worse).
        quu_ok = jnp.all(jnp.isfinite(Quu), axis=(0, 1))
        out_ok = (jnp.all(jnp.isfinite(k), axis=0)
                  & jnp.all(jnp.isfinite(K), axis=(0, 1))
                  & jnp.all(jnp.isfinite(Vx_new), axis=0)
                  & jnp.all(jnp.isfinite(Vxx_new), axis=(0, 1)))
        indef_t = (quu_ok & ~out_ok).astype(dtype)

        if pad:
            valid = (c * Tc + t) >= pad   # front-padded knots are no-ops
            Vx_new = jnp.where(valid, Vx_new, Vx)
            Vxx_new = jnp.where(valid, Vxx_new, Vxx)
            vf = jnp.where(valid, 1.0, 0.0).astype(dtype)
        else:
            vf = 1.0
        Vx_s[:] = Vx_new
        Vxx_s[:] = Vxx_new
        k_ref[t] = k
        K_ref[t] = K

        indef = jnp.maximum(indef, indef_t * vf)
        dg = dg + jnp.sum(Qu * k, axis=0) * vf
        dq = dq - jnp.sum(k * Quuk, axis=0) * vf
        stop = stop + jnp.sum(Qu * Qu, axis=0) * vf
        return dg, dq, stop, indef

    dg, dq, stop, indef = jax.lax.fori_loop(0, Tc, body, (zeros, zeros, zeros, zeros))
    ok = (jnp.isfinite(dg) & jnp.isfinite(dq) & jnp.isfinite(stop)
          & jnp.all(jnp.isfinite(Vx_s[:]), axis=0)).astype(dtype)
    stats_ref[0] += dg
    stats_ref[1] += dq
    stats_ref[2] += stop
    stats_ref[3] += ok
    stats_ref[4] = jnp.maximum(stats_ref[4], indef)
    Vx_out_ref[:] = Vx_s[:]
    Vxx_out_ref[:] = Vxx_s[:]


def _riccati_fddp_kernel(Tc, NC, pad, nu, boxed, qp_iters, box_pk, warm, *refs):
    """FDDP / BoxFDDP backward chunk: deflected Vx (+ Vxx fs) stored at
    every node (Crocoddyl SolverFDDP::backwardPass), the per-node
    DEFLECTION VECTOR ``w_t = Vxx_t fs_t`` emitted for the line search's
    dv correction (by Vxx symmetry ``fs.(Vxx dx) = w.dx`` — emitting the
    [ndx] vector instead of the [ndx, ndx] matrix cuts the backward's
    HBM output and the retry-loop carry by ~ndx x; at 7-DoF that carry
    measured ~20% of device time, docs/BENCH.md round 5), and the gap
    terms of the expected improvement accumulated in-kernel. ``boxed``
    adds the per-knot masked BoxQP / free-clamped gain partition
    (Crocoddyl SolverBoxFDDP); ``warm`` its active-set warm start
    (kprev input)."""
    kprev_ref = None
    if boxed and warm:
        (Fx_ref, Fu_ref, Lx_ref, Lu_ref, Lxx_ref, Lxu_ref, Luu_ref,
         tLx_ref, tLxx_ref, fs_ref, fsT_ref, us_ref, kprev_ref, lb_ref,
         ub_ref, reg_ref,
         k_ref, K_ref, w_ref, wT_ref, stats_ref, cVx_ref, cVxx_ref,
         Vx_s, Vxx_s) = refs
    elif boxed:
        (Fx_ref, Fu_ref, Lx_ref, Lu_ref, Lxx_ref, Lxu_ref, Luu_ref,
         tLx_ref, tLxx_ref, fs_ref, fsT_ref, us_ref, lb_ref, ub_ref, reg_ref,
         k_ref, K_ref, w_ref, wT_ref, stats_ref, cVx_ref, cVxx_ref,
         Vx_s, Vxx_s) = refs
    else:
        (Fx_ref, Fu_ref, Lx_ref, Lu_ref, Lxx_ref, Lxu_ref, Luu_ref,
         tLx_ref, tLxx_ref, fs_ref, fsT_ref, reg_ref,
         k_ref, K_ref, w_ref, wT_ref, stats_ref, cVx_ref, cVxx_ref,
         Vx_s, Vxx_s) = refs
        us_ref = lb_ref = ub_ref = None
    dtype = Fx_ref.dtype
    reg = reg_ref[:]
    j = pl.program_id(1)
    c = NC - 1 - j

    @pl.when(j == 0)
    def _():
        # terminal node: regularize Lxx, deflect Vx with fs[T], emit stats
        VxxT = add_diag(tLxx_ref[:], reg)
        fsT = fsT_ref[:]
        wT = _matvec(VxxT, fsT)
        VxT = tLx_ref[:] + wT
        Vxx_s[:] = VxxT
        Vx_s[:] = VxT
        wT_ref[:] = wT
        stats_ref[:] = jnp.zeros_like(stats_ref)
        stats_ref[4] = -jnp.sum(VxT * fsT, axis=0)
        stats_ref[5] = jnp.sum(fsT * wT, axis=0)

    zeros = jnp.zeros_like(reg)

    def body(i, carry):
        dg, dq, stop, dg_gap, dq_gap, indef = carry
        t = Tc - 1 - i
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
        Quu = add_diag(Luu_ref[t] + _matmul(FuTVxx, Fu), reg)

        QxuT = _transpose12(Qxu)
        if boxed:
            u_t = us_ref[t]
            low, up = _box_at(lb_ref, ub_ref, u_t, c * Tc + t, box_pk)
            x0 = None if kprev_ref is None else -kprev_ref[t]
            du, free = _boxqp_lanes(Quu, Qu, low, up, qp_iters, x0)
            k = -du
            K = _masked_chol_solve(Quu, free, QxuT)
        else:
            L = _chol4(Quu)
            k = _chol4_solve(L, Qu[:, None])[:, 0]
            K = _chol4_solve(L, QxuT)

        Quuk = _matvec(Quu, k)
        Vx_new = Qx + _matvec_t(K, Quuk) - 2.0 * _matvec_t(K, Qu)
        Vxx_new = Qxx - _matmul(Qxu, K)
        Vxx_new = add_diag(0.5 * (Vxx_new + _transpose12(Vxx_new)), reg)
        fs_t = fs_ref[t]
        w_t = _matvec(Vxx_new, fs_t)
        Vx_new = Vx_new + w_t                      # FDDP deflection

        # retryable-failure detector (see the Box kernel for the taxonomy)
        quu_ok = jnp.all(jnp.isfinite(Quu), axis=(0, 1))
        out_ok = (jnp.all(jnp.isfinite(k), axis=0)
                  & jnp.all(jnp.isfinite(K), axis=(0, 1))
                  & jnp.all(jnp.isfinite(Vx_new), axis=0)
                  & jnp.all(jnp.isfinite(Vxx_new), axis=(0, 1)))
        indef_t = (quu_ok & ~out_ok).astype(dtype)

        if pad:
            valid = (c * Tc + t) >= pad
            Vx_new = jnp.where(valid, Vx_new, Vx)
            Vxx_new = jnp.where(valid, Vxx_new, Vxx)
            vf = jnp.where(valid, 1.0, 0.0).astype(dtype)
        else:
            vf = 1.0
        Vx_s[:] = Vx_new
        Vxx_s[:] = Vxx_new
        k_ref[t] = k
        K_ref[t] = K
        w_ref[t] = w_t

        indef = jnp.maximum(indef, indef_t * vf)
        dg = dg + jnp.sum(Qu * k, axis=0) * vf
        dq = dq - jnp.sum(k * Quuk, axis=0) * vf
        stop = stop + jnp.sum(Qu * Qu, axis=0) * vf
        dg_gap = dg_gap - jnp.sum(Vx_new * fs_t, axis=0) * vf
        dq_gap = dq_gap + jnp.sum(fs_t * w_t, axis=0) * vf
        return dg, dq, stop, dg_gap, dq_gap, indef

    dg, dq, stop, dg_gap, dq_gap, indef = jax.lax.fori_loop(
        0, Tc, body, (zeros,) * 6)
    ok = (jnp.isfinite(dg) & jnp.isfinite(stop)
          & jnp.all(jnp.isfinite(Vx_s[:]), axis=0)).astype(dtype)
    stats_ref[0] += dg
    stats_ref[1] += dq
    stats_ref[2] += stop
    stats_ref[3] += ok
    stats_ref[4] += dg_gap
    stats_ref[5] += dq_gap
    stats_ref[6] = jnp.maximum(stats_ref[6], indef)
    cVx_ref[:] = Vx_s[:]
    cVxx_ref[:] = Vxx_s[:]


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

class FddpBackwardOut(NamedTuple):
    k: jnp.ndarray        # [B, T, nu] (lane variants: [T, nu, Bp])
    K: jnp.ndarray        # [B, T, nu, 8]
    w: jnp.ndarray        # [B, T+1, ndx] deflection vectors Vxx_t fs_t (for
                          # the line search's dv correction: dv = -sum w.dx)
    dg: jnp.ndarray
    dq: jnp.ndarray
    stop: jnp.ndarray
    dg_gap: jnp.ndarray
    dq_gap: jnp.ndarray
    ok: jnp.ndarray
    retryable: jnp.ndarray  # failure was indefinite Quu (reg bump can help)


class BoxBackwardOut(NamedTuple):
    k: jnp.ndarray      # [B, T, 4] (lane variant: [T, 4, Bp])
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


def _pad_front_t(x, pad):
    """Zero-pad ``pad`` knots at the FRONT of the time axis (axis 0)."""
    if pad == 0:
        return x
    widths = [(pad, 0)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths)


def _chunk_plan(T, t_chunk, boxed, gaps, P, nb, itemsize, ndx=NDX, nu=NU):
    """Pick the time-chunk length from a VMEM budget: in+out floats per
    knot per lane element, double-buffered across grid steps."""
    # Fx..Luu(,us) inputs + k,K outputs, dimension-generic (at the 2-DoF
    # defaults this is the round-3 plan: 224 + 36)
    per_knot = (2 * ndx * ndx + 2 * ndx * nu + ndx + 2 * nu + nu * nu
                + (nu if boxed else 0) + nu + nu * ndx)
    if gaps:
        per_knot += 2 * ndx   # w (deflection vector) out + fs in
    budget = 6 * 1024 * 1024     # bytes per buffer set (x2 with pipelining)
    tc_mem = max(1, budget // (per_knot * P * nb * itemsize))
    return pick_chunks(T, min(t_chunk, tc_mem))


def riccati_box_backward_lanes(Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l, Luu_l,
                               tLx_l, tLxx_l, us_l, lb_l, ub_l, reg,
                               qp_iters: int = _QP_ITERS, nb: int = NB,
                               t_chunk: int = 25,
                               interpret: bool = False,
                               per_knot_box: bool = False,
                               kprev_l=None) -> BoxBackwardOut:
    """Lane-IO fused Box backward: no batch-major transposes.

    Inputs already in lane layout: Fx_l [T,8,8,Bp], Fu_l [T,8,4,Bp],
    Lx_l [T,8,Bp], Lu_l [T,4,Bp], Lxx_l [T,8,8,Bp], Lxu_l [T,8,4,Bp],
    Luu_l [T,4,4,Bp], tLx_l [8,Bp], tLxx_l [8,8,Bp], us_l [T,4,Bp],
    lb_l/ub_l [4,Bp] (with ``per_knot_box``: batch-invariant [T, 4]
    tables, reference per-node bounds two_dof_vsa_boxddp.py:59-60),
    reg [Bp] (Bp satisfying :func:`.layout.padded_batch`).
    Returns a :class:`BoxBackwardOut` whose k/K stay in lane layout
    ([T,4,Bp] / [T,4,8,Bp]); stats are [Bp] vectors.
    """
    return prepare_riccati_box_backward_lanes(
        Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l, Luu_l, tLx_l, tLxx_l, us_l,
        lb_l, ub_l, qp_iters=qp_iters, nb=nb, t_chunk=t_chunk,
        interpret=interpret, per_knot_box=per_knot_box, kprev_l=kprev_l)(reg)


def prepare_riccati_box_backward_lanes(Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l,
                                       Luu_l, tLx_l, tLxx_l, us_l, lb_l, ub_l,
                                       qp_iters: int = _QP_ITERS, nb: int = NB,
                                       t_chunk: int = 25,
                                       interpret: bool = False,
                                       per_knot_box: bool = False,
                                       kprev_l=None):
    """Two-phase variant of :func:`riccati_box_backward_lanes`:
    ``prepare(inputs...) -> launch(reg)``. The reg-retry loop relaunches
    the backward ~2.85x per solver iteration with IDENTICAL inputs except
    ``reg`` — packing/padding them per relaunch re-ran ~4 ms/batch of
    pure reshape copies inside the retry while (round-5 profile,
    docs/BENCH.md); preparing once per solver iteration hoists that out
    of the loop."""
    T = Fx_l.shape[0]
    dtype = Fx_l.dtype
    Bp = Fx_l.shape[-1]
    rows, P, G = pack_dims(Bp, nb)
    Tc, NC, pad = _chunk_plan(T, t_chunk, True, False, P, nb, dtype.itemsize)
    Tp = T + pad

    def prep(x):
        return to_packed(_pad_front_t(x, pad), nb)

    def tspec(*dims):
        block = (Tc,) + dims + (P, nb)
        n0 = len(dims)
        return pl.BlockSpec(block, lambda b, j: (NC - 1 - j,) + (0,) * n0 + (b, 0),
                            memory_space=pltpu.VMEM)

    def cspec(*dims):
        block = dims + (P, nb)
        n0 = len(dims)
        return pl.BlockSpec(block, lambda b, j: (0,) * n0 + (b, 0),
                            memory_space=pltpu.VMEM)

    if per_knot_box:
        box_args = [_pad_front_t(jnp.asarray(lb_l, dtype), pad),
                    _pad_front_t(jnp.asarray(ub_l, dtype), pad)]
        # whole [Tp, nu] table in SMEM (Mosaic: non-tile-aligned blocks
        # must equal the array); kernels index rows by global knot
        box_spec = pl.BlockSpec((Tp, NU), lambda b, j: (0, 0),
                                memory_space=pltpu.SMEM)
        box_specs = [box_spec, box_spec]
    else:
        box_args = [to_packed(lb_l, nb), to_packed(ub_l, nb)]
        box_specs = [cspec(NU), cspec(NU)]

    warm = kprev_l is not None
    warm_args = [prep(kprev_l)] if warm else []
    warm_specs = [tspec(NU)] if warm else []
    args = [prep(Fx_l), prep(Fu_l), prep(Lx_l), prep(Lu_l),
            prep(Lxx_l), prep(Lxu_l), prep(Luu_l),
            to_packed(tLx_l, nb), to_packed(tLxx_l, nb), prep(us_l),
            *warm_args, *box_args]

    kernel = functools.partial(_riccati_box_kernel, Tc, NC, pad, qp_iters,
                               per_knot_box, warm)

    def launch(reg) -> BoxBackwardOut:
        k_p, K_p, stats_p, _, _ = pl.pallas_call(
            kernel,
            grid=(G, NC),
            in_specs=[
                tspec(NDX, NDX), tspec(NDX, NU), tspec(NDX), tspec(NU),
                tspec(NDX, NDX), tspec(NDX, NU), tspec(NU, NU),
                cspec(NDX), cspec(NDX, NDX), tspec(NU), *warm_specs,
                *box_specs, cspec(),
            ],
            out_specs=[tspec(NU), tspec(NU, NDX), cspec(8), cspec(NDX), cspec(NDX, NDX)],
            out_shape=out_structs([
                jax.ShapeDtypeStruct((Tp, NU, rows, nb), dtype),
                jax.ShapeDtypeStruct((Tp, NU, NDX, rows, nb), dtype),
                jax.ShapeDtypeStruct((8, rows, nb), dtype),
                jax.ShapeDtypeStruct((NDX, rows, nb), dtype),
                jax.ShapeDtypeStruct((NDX, NDX, rows, nb), dtype),
            ], Fx_l),
            scratch_shapes=[
                pltpu.VMEM((NDX, P, nb), dtype),
                pltpu.VMEM((NDX, NDX, P, nb), dtype),
            ],
            interpret=interpret,
        )(*args, to_packed(reg[None], nb)[0])

        k_l = from_packed(k_p)[pad:]
        K_l = from_packed(K_p)[pad:]
        stats = from_packed(stats_p)
        ok = stats[3] > (float(NC) - 0.5)       # every chunk finite
        return BoxBackwardOut(k=k_l, K=K_l, dg=stats[0], dq=stats[1],
                              stop=stats[2], ok=ok,
                              retryable=stats[4] > 0.5)

    return launch


def _fddp_family_lanes(Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l, Luu_l,
                       tLx_l, tLxx_l, fs_l, reg, us_l, lb_l, ub_l,
                       nu, qp_iters, nb, t_chunk, interpret,
                       per_knot_box=False, kprev_l=None) -> FddpBackwardOut:
    return _prepare_fddp_family_lanes(
        Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l, Luu_l, tLx_l, tLxx_l, fs_l,
        us_l, lb_l, ub_l, nu, qp_iters, nb, t_chunk, interpret,
        per_knot_box=per_knot_box, kprev_l=kprev_l)(reg)


def _prepare_fddp_family_lanes(Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l, Luu_l,
                               tLx_l, tLxx_l, fs_l, us_l, lb_l, ub_l,
                               nu, qp_iters, nb, t_chunk, interpret,
                               per_knot_box=False, kprev_l=None):
    """``prepare(inputs...) -> launch(reg)`` (see
    :func:`prepare_riccati_box_backward_lanes` for why)."""
    boxed = us_l is not None
    warm = kprev_l is not None
    T = Fx_l.shape[0]
    ndx = Fx_l.shape[1]          # dimension-generic: 8 (2-DoF) or 4*nl
    dtype = Fx_l.dtype
    Bp = Fx_l.shape[-1]
    rows, P, G = pack_dims(Bp, nb)
    Tc, NC, pad = _chunk_plan(T, t_chunk, boxed, True, P, nb, dtype.itemsize,
                              ndx=ndx, nu=nu)
    Tp = T + pad

    def prep(x):
        return to_packed(_pad_front_t(x, pad), nb)

    def tspec(*dims):
        block = (Tc,) + dims + (P, nb)
        n0 = len(dims)
        return pl.BlockSpec(block, lambda b, j: (NC - 1 - j,) + (0,) * n0 + (b, 0),
                            memory_space=pltpu.VMEM)

    def cspec(*dims):
        block = dims + (P, nb)
        n0 = len(dims)
        return pl.BlockSpec(block, lambda b, j: (0,) * n0 + (b, 0),
                            memory_space=pltpu.VMEM)

    args = [prep(Fx_l), prep(Fu_l), prep(Lx_l), prep(Lu_l),
            prep(Lxx_l), prep(Lxu_l), prep(Luu_l),
            to_packed(tLx_l, nb), to_packed(tLxx_l, nb),
            prep(fs_l[:T]), to_packed(fs_l[T], nb)]
    in_specs = [
        tspec(ndx, ndx), tspec(ndx, nu), tspec(ndx), tspec(nu),
        tspec(ndx, ndx), tspec(ndx, nu), tspec(nu, nu),
        cspec(ndx), cspec(ndx, ndx), tspec(ndx), cspec(ndx),
    ]
    if boxed:
        args += [prep(us_l)]
        in_specs += [tspec(nu)]
        if warm:
            args += [prep(kprev_l)]
            in_specs += [tspec(nu)]
        if per_knot_box:
            box_spec = pl.BlockSpec((Tp, nu), lambda b, j: (0, 0),
                                    memory_space=pltpu.SMEM)
            args += [_pad_front_t(jnp.asarray(lb_l, dtype), pad),
                     _pad_front_t(jnp.asarray(ub_l, dtype), pad)]
            in_specs += [box_spec, box_spec]
        else:
            args += [to_packed(lb_l, nb), to_packed(ub_l, nb)]
            in_specs += [cspec(nu), cspec(nu)]
    in_specs += [cspec()]

    kernel = functools.partial(_riccati_fddp_kernel, Tc, NC, pad, nu, boxed,
                               qp_iters, per_knot_box, warm)
    # big-state (ndx > 8) kernels: raise Mosaic's scoped-VMEM budget above
    # the 16 MiB default — the live [ndx, ndx, P, nb] per-knot
    # intermediates plus XLA's VMEM-promoted k/K loop-carry buffers
    # measured 20-24 MB; v5e has 128 MiB physical VMEM
    cparams = (pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
               if ndx > 8 else None)

    def launch(reg) -> FddpBackwardOut:
        k_p, K_p, w_p, wT_p, stats_p, _, _ = pl.pallas_call(
            kernel,
            grid=(G, NC),
            compiler_params=cparams,
            in_specs=in_specs,
            out_specs=[tspec(nu), tspec(nu, ndx), tspec(ndx), cspec(ndx),
                       cspec(8), cspec(ndx), cspec(ndx, ndx)],
            out_shape=out_structs([
                jax.ShapeDtypeStruct((Tp, nu, rows, nb), dtype),
                jax.ShapeDtypeStruct((Tp, nu, ndx, rows, nb), dtype),
                jax.ShapeDtypeStruct((Tp, ndx, rows, nb), dtype),
                jax.ShapeDtypeStruct((ndx, rows, nb), dtype),
                jax.ShapeDtypeStruct((8, rows, nb), dtype),
                jax.ShapeDtypeStruct((ndx, rows, nb), dtype),
                jax.ShapeDtypeStruct((ndx, ndx, rows, nb), dtype),
            ], Fx_l),
            scratch_shapes=[
                pltpu.VMEM((ndx, P, nb), dtype),
                pltpu.VMEM((ndx, ndx, P, nb), dtype),
            ],
            interpret=interpret,
        )(*args, to_packed(reg[None], nb)[0])

        k_l = from_packed(k_p)[pad:]
        K_l = from_packed(K_p)[pad:]
        # per-node deflection vectors w = Vxx fs [T+1, ndx, Bp] for the
        # line search's dv correction (ndx x smaller than emitting Vxx)
        w_l = jnp.concatenate(
            [from_packed(w_p)[pad:], from_packed(wT_p)[None]], axis=0)
        stats = from_packed(stats_p)
        return FddpBackwardOut(
            k=k_l, K=K_l, w=w_l,
            dg=stats[0], dq=stats[1], stop=stats[2],
            dg_gap=stats[4], dq_gap=stats[5],
            ok=stats[3] > (float(NC) - 0.5),
            retryable=stats[6] > 0.5,
        )

    return launch


def riccati_fddp_backward_lanes(Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l, Luu_l,
                                tLx_l, tLxx_l, fs_l, reg,
                                nu: int = 2, nb: int = NB, t_chunk: int = 25,
                                interpret: bool = False) -> FddpBackwardOut:
    """Lane-IO fused FDDP backward: no batch-major transposes.

    Inputs already in lane layout (trailing dim Bp per
    :func:`.layout.padded_batch`): Fx_l [T,8,8,Bp], Fu_l [T,8,nu,Bp],
    Lx_l [T,8,Bp], Lu_l [T,nu,Bp], Lxx_l [T,8,8,Bp], Lxu_l [T,8,nu,Bp],
    Luu_l [T,nu,nu,Bp], tLx_l [8,Bp], tLxx_l [8,8,Bp], fs_l [T+1,8,Bp],
    reg [Bp]. Returns a :class:`FddpBackwardOut` whose k/K/w stay in
    lane layout ([T,nu,Bp] / [T,nu,8,Bp] / [T+1,8,Bp]); stats are [Bp].
    """
    return _fddp_family_lanes(Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l, Luu_l,
                              tLx_l, tLxx_l, fs_l, reg, None, None, None,
                              nu, 0, nb, t_chunk, interpret)


def prepare_riccati_fddp_backward_lanes(Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l,
                                        Luu_l, tLx_l, tLxx_l, fs_l,
                                        nu: int = 2, nb: int = NB,
                                        t_chunk: int = 25,
                                        interpret: bool = False):
    """``prepare -> launch(reg)`` variant of
    :func:`riccati_fddp_backward_lanes` (hoists input packing out of the
    reg-retry loop)."""
    return _prepare_fddp_family_lanes(Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l,
                                      Luu_l, tLx_l, tLxx_l, fs_l,
                                      None, None, None, nu, 0, nb, t_chunk,
                                      interpret)


def prepare_riccati_boxfddp_backward_lanes(Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l,
                                           Lxu_l, Luu_l, tLx_l, tLxx_l, fs_l,
                                           us_l, lb_l, ub_l,
                                           qp_iters: int = _QP_ITERS,
                                           nb: int = NB, t_chunk: int = 25,
                                           interpret: bool = False,
                                           per_knot_box: bool = False,
                                           kprev_l=None):
    """``prepare -> launch(reg)`` variant of
    :func:`riccati_boxfddp_backward_lanes`."""
    nu = Fu_l.shape[2]
    return _prepare_fddp_family_lanes(Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l,
                                      Luu_l, tLx_l, tLxx_l, fs_l, us_l, lb_l,
                                      ub_l, nu, qp_iters, nb, t_chunk,
                                      interpret, per_knot_box=per_knot_box,
                                      kprev_l=kprev_l)


def riccati_boxfddp_backward_lanes(Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l, Luu_l,
                                   tLx_l, tLxx_l, fs_l, us_l, lb_l, ub_l, reg,
                                   qp_iters: int = _QP_ITERS, nb: int = NB,
                                   t_chunk: int = 25,
                                   interpret: bool = False,
                                   per_knot_box: bool = False,
                                   kprev_l=None) -> FddpBackwardOut:
    """Lane-IO fused BoxFDDP backward (gaps + bounds): FDDP deflected value
    recursion + gap accumulators with the masked BoxQP gain partition.
    Same layout contract as :func:`riccati_fddp_backward_lanes` plus
    us_l [T,nu,Bp] and lb_l/ub_l [nu,Bp] (``per_knot_box``: [T, nu]);
    ``kprev_l`` [T,nu,Bp] warm-starts the QPs from the previous k."""
    nu = Fu_l.shape[2]
    return _fddp_family_lanes(Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l, Luu_l,
                              tLx_l, tLxx_l, fs_l, reg, us_l, lb_l, ub_l,
                              nu, qp_iters, nb, t_chunk, interpret,
                              per_knot_box=per_knot_box, kprev_l=kprev_l)


def _to_lane_layout(x, Bp):
    x = _pad_to(x, Bp, 0)
    perm = tuple(range(1, x.ndim)) + (0,)
    return jnp.transpose(x, perm)


@functools.partial(jax.jit, static_argnames=("qp_iters", "nb", "t_chunk", "interpret"))
def riccati_boxfddp_backward(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, term_Lx, term_Lxx,
                             fs, us, lb, ub, reg, qp_iters: int = _QP_ITERS,
                             nb: int = NB, t_chunk: int = 25,
                             interpret: bool = False,
                             kprev=None) -> FddpBackwardOut:
    """Batched fused BoxFDDP backward (batch-major inputs: fs [B,T+1,8],
    us [B,T,nu], lb/ub [B,nu]; ``kprev`` [B,T,nu] warm-starts the QPs)."""
    B = Fx.shape[0]
    dtype = Fx.dtype
    Bp = padded_batch(B, nb)
    tl = functools.partial(_to_lane_layout, Bp=Bp)

    Fx_l, Fu_l, Lx_l, Lu_l = map(tl, (Fx, Fu, Lx, Lu))
    Lxx_l, Lxu_l, Luu_l = map(tl, (Lxx, Lxu, Luu))
    tLx_l, tLxx_l, fs_l = map(tl, (term_Lx, term_Lxx, fs))
    us_l, lb_l, ub_l = map(tl, (us, lb, ub))
    reg_p = jnp.concatenate([reg, jnp.ones(Bp - B, dtype=dtype)])

    out = riccati_boxfddp_backward_lanes(
        Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l, Luu_l, tLx_l, tLxx_l, fs_l,
        us_l, lb_l, ub_l, reg_p, qp_iters=qp_iters, nb=nb, t_chunk=t_chunk,
        interpret=interpret,
        kprev_l=None if kprev is None else tl(kprev))
    k = jnp.transpose(out.k, (2, 0, 1))[:B]
    K = jnp.transpose(out.K, (3, 0, 1, 2))[:B]
    w = jnp.transpose(out.w, (2, 0, 1))[:B]
    return FddpBackwardOut(
        k=k, K=K, w=w,
        dg=out.dg[:B], dq=out.dq[:B], stop=out.stop[:B],
        dg_gap=out.dg_gap[:B], dq_gap=out.dq_gap[:B],
        ok=out.ok[:B], retryable=out.retryable[:B],
    )


@functools.partial(jax.jit, static_argnames=("nu", "nb", "t_chunk", "interpret"))
def riccati_fddp_backward(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, term_Lx, term_Lxx,
                          fs, reg, nu: int = 2, nb: int = NB, t_chunk: int = 25,
                          interpret: bool = False) -> FddpBackwardOut:
    """Batched fused FDDP backward pass (batch-major inputs, fs [B,T+1,8])."""
    B = Fx.shape[0]
    dtype = Fx.dtype
    Bp = padded_batch(B, nb)
    tl = functools.partial(_to_lane_layout, Bp=Bp)

    Fx_l, Fu_l, Lx_l, Lu_l = map(tl, (Fx, Fu, Lx, Lu))
    Lxx_l, Lxu_l, Luu_l = map(tl, (Lxx, Lxu, Luu))
    tLx_l, tLxx_l, fs_l = map(tl, (term_Lx, term_Lxx, fs))
    reg_p = jnp.concatenate([reg, jnp.ones(Bp - B, dtype=dtype)])

    out = riccati_fddp_backward_lanes(
        Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l, Luu_l, tLx_l, tLxx_l, fs_l,
        reg_p, nu=nu, nb=nb, t_chunk=t_chunk, interpret=interpret)
    k = jnp.transpose(out.k, (2, 0, 1))[:B]
    K = jnp.transpose(out.K, (3, 0, 1, 2))[:B]
    w = jnp.transpose(out.w, (2, 0, 1))[:B]
    return FddpBackwardOut(
        k=k, K=K, w=w,
        dg=out.dg[:B], dq=out.dq[:B], stop=out.stop[:B],
        dg_gap=out.dg_gap[:B], dq_gap=out.dq_gap[:B],
        ok=out.ok[:B], retryable=out.retryable[:B],
    )


@functools.partial(jax.jit, static_argnames=("qp_iters", "nb", "t_chunk", "interpret"))
def riccati_box_backward(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, term_Lx, term_Lxx,
                         us, lb, ub, reg, qp_iters: int = _QP_ITERS,
                         nb: int = NB, t_chunk: int = 25,
                         interpret: bool = False, kprev=None) -> BoxBackwardOut:
    """Batched fused backward pass.

    Batch-major inputs: Fx [B,T,8,8], Fu [B,T,8,4], Lx [B,T,8], Lu [B,T,4],
    Lxx [B,T,8,8], Lxu [B,T,8,4], Luu [B,T,4,4], term_Lx [B,8],
    term_Lxx [B,8,8], us [B,T,4], lb/ub [B,4], reg [B]; ``kprev`` [B,T,4]
    warm-starts the per-knot QPs from the previous solver iteration's k.
    """
    B = Fx.shape[0]
    dtype = Fx.dtype
    Bp = padded_batch(B, nb)
    tl = functools.partial(_to_lane_layout, Bp=Bp)

    Fx_l, Fu_l, Lx_l, Lu_l = map(tl, (Fx, Fu, Lx, Lu))
    Lxx_l, Lxu_l, Luu_l, us_l = map(tl, (Lxx, Lxu, Luu, us))
    tLx_l, tLxx_l, lb_l, ub_l = map(tl, (term_Lx, term_Lxx, lb, ub))
    # padded lanes get reg 1.0 to keep their Cholesky finite
    reg_p = jnp.concatenate([reg, jnp.ones(Bp - B, dtype=dtype)])

    out = riccati_box_backward_lanes(
        Fx_l, Fu_l, Lx_l, Lu_l, Lxx_l, Lxu_l, Luu_l, tLx_l, tLxx_l,
        us_l, lb_l, ub_l, reg_p, qp_iters=qp_iters, nb=nb, t_chunk=t_chunk,
        interpret=interpret,
        kprev_l=None if kprev is None else tl(kprev))
    k = jnp.transpose(out.k, (2, 0, 1))[:B]           # [B,T,4]
    K = jnp.transpose(out.K, (3, 0, 1, 2))[:B]        # [B,T,4,8]
    return BoxBackwardOut(k=k, K=K, dg=out.dg[:B], dq=out.dq[:B],
                          stop=out.stop[:B], ok=out.ok[:B],
                          retryable=out.retryable[:B])
