"""DDP solver family: DDP, FDDP, BoxDDP, BoxFDDP.

TPU-native replacement for Crocoddyl's C++ ``SolverDDP`` / ``SolverFDDP``
(reference ``examples/two_dof_sea.py:69``) / ``SolverBoxDDP``
(``examples/two_dof_vsa_boxddp.py:69``) / ``SolverBoxFDDP`` — one
parametrized engine instead of a class hierarchy, faithful to Crocoddyl's
published algorithm:

  - backward Riccati sweep with Levenberg-Marquardt regularization on both
    Quu (ureg) and Vxx (xreg), with the regularized value-gradient update
    ``Vx = Qx + K'Quu k - 2 K'Qu``;
  - FDDP defect ("gap") handling: deflected ``Vx + Vxx fs`` in the sweep,
    gap-aware expected-improvement model, and gap contraction by
    ``(1 - alpha)`` in the rollout;
  - BoxQP backward pass (projected Newton, free/clamped gain partition) and
    clamped rollout for the Box variants;
  - the full acceptance/regularization schedule (th_acceptstep = 0.1,
    th_acceptnegstep = 2, step-based reg increase/decrease by factor 10 in
    [1e-9, 1e9], stop criterion sum ||Qu||^2 < th_stop).

Where the reference's C++ solver calls back into per-knot Python models
(thousands of interpreter crossings per solve, SURVEY §3.1), this whole
solver is ONE jitted XLA program:

  - linearization is a ``vmap`` over knots (batched tiny-matrix algebra —
    the MXU/VPU-friendly axis);
  - backward/forward sweeps are ``lax.scan`` (sequential by the math);
  - the backtracking line search evaluates ALL step lengths as one
    width-10 vmapped rollout and selects the first acceptable one —
    identical semantics to Crocoddyl's sequential backtracking, but on TPU
    the vectorized batch costs the same wall-clock as a single rollout;
  - scenario batching is an outer ``vmap``; every branch is masked, so an
    SPMD batch runs one program (SURVEY §2.3 / §7 stage 4).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve

from ..utils.vma import pvary_like
from .boxqp import boxqp, masked_free_solve
from .problem import ShootingProblem


class Bounds(NamedTuple):
    """Control bounds (reference attaches these to the action model,
    ``two_dof_vsa_boxddp.py:59-60``)."""

    lb: jnp.ndarray
    ub: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class SolverSettings:
    """Crocoddyl-default thresholds (static at trace time)."""

    maxiter: int = 100
    th_stop: float = 1e-9        # on sum ||Qu||^2
    th_grad: float = 1e-12
    th_gaptol: float = 1e-9
    th_acceptstep: float = 0.1
    th_acceptnegstep: float = 2.0
    th_stepdec: float = 0.5
    th_stepinc: float = 0.01
    reg_init: float = 1e-9
    reg_min: float = 1e-9
    reg_max: float = 1e9
    reg_factor: float = 10.0
    n_alphas: int = 10
    boxqp_iters: int = 6
    boxqp_alphas: int = 5
    # BoxQP active-set warm start: > 0 starts each knot's projected Newton
    # from the PREVIOUS solver iteration's du at that knot (clipped into
    # the current box) and runs this many QP iterations instead of
    # boxqp_iters. The active set barely changes between consecutive
    # solver iterations, so 2-3 warm iterations reproduce the 6-iteration
    # cold solution (tests/test_boxqp_warm.py); the backward pass is ~2x
    # the FDDP backward at 6 iters (docs/BENCH.md rooflines). 0 = off.
    boxqp_warm_iters: int = 0
    # Max in-iteration backward retries (reg x10 bumps). Crocoddyl loops to
    # reg_max inside one iteration; under vmap a single f32-doomed scenario
    # would then drag the whole batch through the full escalation, so cap
    # the per-iteration bumps — st.reg persists, and the step-based
    # schedule keeps escalating on failed iterations, so reg still reaches
    # reg_max (and flags divergence) after a few outer iterations.
    bw_retry_cap: int = 3
    # Early retirement of doomed scenarios (0 = off). A scenario that
    # rejects the ENTIRE alpha ladder this many CONSECUTIVE iterations
    # while the step-based schedule is raising reg — or whose backward
    # fails non-retryably (f32 value-recursion overflow, where more reg
    # only weakens feedback) twice in a row — is marked diverged
    # immediately instead of walking reg from 1e-9 to reg_max over ~18
    # iterations. Crocoddyl aborts the whole solve in both situations;
    # under SPMD batching the un-retired walk made every doomed lane
    # drag its batch through full retry + line-search ladders for most
    # of the budget (34% + 26% of bench device time, docs/BENCH.md
    # round 4). Each counted iteration raised reg x10 and re-ran the
    # full ladder at the new reg, so the retired lanes are the same
    # lanes the walk would eventually flag — only earlier (convergence
    # stats verified unchanged on the bench workloads, round 5).
    doomed_reject_iters: int = 0
    # Regularization factor applied when the line search rejected the
    # ENTIRE alpha ladder (vs reg_factor for ordinary small-step
    # increases). Crocoddyl bumps x10 regardless; a full-ladder rejection
    # is much stronger evidence that reg is decades too low, and under
    # SPMD batching every decade of the walk costs the whole batch a full
    # retry + ladder iteration. x100/x1000 reaches a workable reg (or
    # reg_max and an honest diverged flag) in 5-6 rejections instead of
    # 18 while still giving the lane a genuine acceptance attempt at each
    # sampled level — unlike doomed_reject_iters it never retires a lane
    # the walk would have saved at SOME reg (up to the coarser sampling
    # of the ladder). Default = reg_factor (exactly Crocoddyl's walk).
    reg_reject_factor: float = 10.0
    # Route the Box backward pass through the fused Pallas Riccati kernel
    # (aslr_to_tpu/pallas/riccati.py) when the solve is vmapped. Identical
    # math; one kernel launch instead of ~T x 500 HLO dispatches.
    use_pallas_backward: bool = False
    # Log-depth backward: replace the sequential Riccati scan with the
    # associative-scan formulation (solvers/assoc_riccati.py) — O(log T)
    # depth for LONG horizons. Unbounded (DDP/FDDP) families only; values
    # match the scan to floating-point reassociation, so prefer f64 (or
    # accept tolerance-level iterate drift in f32). Off by default: at
    # the reference's T<=200 the sequential sweeps win.
    assoc_backward: bool = False


class SolveLog(NamedTuple):
    """Per-iteration metrics — the jit-friendly replacement for
    ``crocoddyl.CallbackLogger`` (SURVEY §5)."""

    costs: jnp.ndarray
    stops: jnp.ndarray
    regs: jnp.ndarray
    steps: jnp.ndarray
    d1: jnp.ndarray
    d2: jnp.ndarray
    gap_norms: jnp.ndarray


class SolveResult(NamedTuple):
    xs: jnp.ndarray
    us: jnp.ndarray
    cost: jnp.ndarray
    stop: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray
    diverged: jnp.ndarray
    reg: jnp.ndarray
    log: SolveLog


class _Backward(NamedTuple):
    k: jnp.ndarray       # [T, nu]
    K: jnp.ndarray       # [T, nu, ndx]
    Vx: jnp.ndarray      # [T+1, ndx]
    w: jnp.ndarray       # [T+1, ndx] deflection vectors Vxx_t fs_t — all the
                         # line search needs from Vxx (dv = -sum w.dx, by Vxx
                         # symmetry == Crocoddyl's -sum fs.(Vxx dx)); carrying
                         # the vector instead of [T+1, ndx, ndx] shrinks the
                         # backward output / retry carry by ~ndx x
    dg: jnp.ndarray      # sum Qu.k        (no gap terms)
    dq: jnp.ndarray      # -sum k'Quu k    (no gap terms)
    dg_gap: jnp.ndarray  # -sum Vx.fs   (FDDP expected-improvement gap term)
    dq_gap: jnp.ndarray  # +sum fs'Vxx fs
    stop: jnp.ndarray    # sum ||Qu||^2
    ok: jnp.ndarray
    retryable: jnp.ndarray  # failure was an indefinite factorization (a reg
                            # bump can help) vs an f32 value-recursion
                            # overflow (more reg only weakens feedback)


class _LoopState(NamedTuple):
    xs: jnp.ndarray
    us: jnp.ndarray
    cost: jnp.ndarray
    stop: jnp.ndarray
    reg: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray
    converged: jnp.ndarray
    diverged: jnp.ndarray
    log: SolveLog
    kprev: jnp.ndarray    # [T, nu] previous backward's gains (BoxQP warm start)
    rej_streak: jnp.ndarray  # consecutive full-ladder rejections (doomed-lane
    nrt_streak: jnp.ndarray  # retirement) / consecutive non-retryable bw fails


def _linearize_core(problem: ShootingProblem, xs, us):
    """calc + calcDiff over all knots (vmap) + terminal. With
    ``problem.per_knot`` the model pytree is vmapped alongside the
    trajectory (leading [T] axis on every leaf)."""
    if problem.per_knot:
        run_data, run_diff = jax.vmap(type(problem.running).calc_with_diff)(
            problem.running, xs[:-1], us)
    else:
        run_data, run_diff = jax.vmap(problem.running.calc_with_diff)(xs[:-1], us)
    u0 = jnp.zeros(problem.terminal.nu, dtype=xs.dtype)
    term_data, term_diff = problem.terminal.calc_with_diff(xs[-1], u0)
    cost = jnp.sum(run_data.cost) + term_data.cost
    return cost, run_diff, term_diff, run_data.xnext


def _gaps(problem: ShootingProblem, xs, xnext):
    state = problem.state
    fs0 = state.diff(xs[0], problem.x0)
    fs_next = jax.vmap(state.diff)(xs[1:], xnext)
    return jnp.concatenate([fs0[None], fs_next], axis=0)


def _linearize(problem: ShootingProblem, xs, us):
    """calc + calcDiff over all knots (vmap) + terminal; gaps fs."""
    cost, run_diff, term_diff, xnext = _linearize_core(problem, xs, us)
    return cost, run_diff, term_diff, _gaps(problem, xs, xnext)


@functools.lru_cache(maxsize=None)
def _get_box_backward_core(qp_iters: int, interpret: bool, warm: bool = False):
    """custom_vmap wrapper: unbatched -> XLA scan; vmapped -> Pallas kernel.
    ``warm`` adds a ``kprev`` [T, nu] input (BoxQP active-set warm start)."""
    from ..pallas.riccati import riccati_box_backward

    if warm:
        @jax.custom_batching.custom_vmap
        def core(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, tLx, tLxx, us, kprev, lb, ub, reg):
            return _box_backward_scan(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, tLx, tLxx,
                                      us, lb, ub, reg, qp_iters, kprev=kprev)
    else:
        @jax.custom_batching.custom_vmap
        def core(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, tLx, tLxx, us, lb, ub, reg):
            return _box_backward_scan(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, tLx, tLxx,
                                      us, lb, ub, reg, qp_iters)

    @core.def_vmap
    def _rule(axis_size, in_batched, *args):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + jnp.shape(x))

        args = tuple(bc(a, b) for a, b in zip(args, in_batched))
        if warm:
            *head, kprev, lb, ub, reg = args
            out = riccati_box_backward(*head, lb, ub, reg, qp_iters=qp_iters,
                                       interpret=interpret, kprev=kprev)
        else:
            out = riccati_box_backward(*args, qp_iters=qp_iters, interpret=interpret)
        return tuple(out), tuple(True for _ in out)

    return core


@functools.lru_cache(maxsize=None)
def _get_boxfddp_backward_core(qp_iters: int, interpret: bool, warm: bool = False):
    """custom_vmap wrapper for the BoxFDDP (gaps + bounds) backward:
    unbatched -> XLA scan; vmapped -> fused Pallas kernel."""
    from ..pallas.riccati import riccati_boxfddp_backward

    if warm:
        @jax.custom_batching.custom_vmap
        def core(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, tLx, tLxx, fs, us, kprev, lb, ub, reg):
            return _boxfddp_backward_scan(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, tLx, tLxx,
                                          fs, us, lb, ub, reg, qp_iters, kprev=kprev)
    else:
        @jax.custom_batching.custom_vmap
        def core(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, tLx, tLxx, fs, us, lb, ub, reg):
            return _boxfddp_backward_scan(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, tLx, tLxx,
                                          fs, us, lb, ub, reg, qp_iters)

    @core.def_vmap
    def _rule(axis_size, in_batched, *args):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + jnp.shape(x))

        args = tuple(bc(a, b) for a, b in zip(args, in_batched))
        if warm:
            *head, kprev, lb, ub, reg = args
            out = riccati_boxfddp_backward(*head, lb, ub, reg, qp_iters=qp_iters,
                                           interpret=interpret, kprev=kprev)
        else:
            out = riccati_boxfddp_backward(*args, qp_iters=qp_iters, interpret=interpret)
        return tuple(out), tuple(True for _ in out)

    return core


@functools.lru_cache(maxsize=None)
def _get_fddp_backward_core(nu: int, interpret: bool):
    """custom_vmap wrapper for the FDDP (unconstrained, gap-aware) backward:
    unbatched -> XLA scan; vmapped -> fused Pallas kernel."""
    from ..pallas.riccati import riccati_fddp_backward

    @jax.custom_batching.custom_vmap
    def core(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, tLx, tLxx, fs, reg):
        return _fddp_backward_scan(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, tLx, tLxx, fs, reg)

    @core.def_vmap
    def _rule(axis_size, in_batched, *args):
        def bc(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + jnp.shape(x))

        args = tuple(bc(a, b) for a, b in zip(args, in_batched))
        out = riccati_fddp_backward(*args, nu=nu, interpret=interpret)
        return tuple(out), tuple(True for _ in out)

    return core


def _fddp_backward_scan(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, tLx, tLxx, fs, reg):
    """Single-scenario FDDP backward — the fused kernel's XLA reference and
    unbatched fallback. Returns
    (k, K, w_all, dg, dq, stop, dg_gap, dq_gap, ok, retryable) where
    ``w_all`` [T+1, ndx] are the deflection vectors ``Vxx_t fs_t`` (the
    line search's dv correction input — see :class:`_Backward`)."""
    ndx = Fx.shape[-1]
    dtype = Fx.dtype
    nu = Fu.shape[-1]
    eye_u = jnp.eye(nu, dtype=dtype)
    eye_x = jnp.eye(ndx, dtype=dtype)

    Vxx_T = tLxx + reg * eye_x
    w_T = Vxx_T @ fs[-1]
    Vx_T = tLx + w_T

    def body(carry, inp):
        Vx_n, Vxx_n = carry
        fx, fu, lx, lu, lxx, lxu, luu, fs_t = inp
        Qx = lx + fx.T @ Vx_n
        Qu = lu + fu.T @ Vx_n
        FxTVxx = fx.T @ Vxx_n
        Qxx = lxx + FxTVxx @ fx
        Qxu = lxu + FxTVxx @ fu
        Quu = luu + fu.T @ Vxx_n @ fu + reg * eye_u
        L = jnp.linalg.cholesky(Quu)
        k = cho_solve((L, True), Qu)
        K = cho_solve((L, True), Qxu.T)
        ok = jnp.all(jnp.isfinite(L))
        Quuk = Quu @ k
        Vx = Qx + K.T @ Quuk - 2.0 * (K.T @ Qu)
        Vxx = Qxx - Qxu @ K
        Vxx = 0.5 * (Vxx + Vxx.T) + reg * eye_x
        w = Vxx @ fs_t
        Vx = Vx + w
        out_ok = (jnp.all(jnp.isfinite(k)) & jnp.all(jnp.isfinite(K))
                  & jnp.all(jnp.isfinite(Vx)) & jnp.all(jnp.isfinite(Vxx)))
        indef = jnp.all(jnp.isfinite(Quu)) & ~out_ok
        return (Vx, Vxx), (k, K, w, jnp.dot(Qu, k), -jnp.dot(k, Quuk), jnp.dot(Qu, Qu),
                           -jnp.dot(Vx, fs_t), jnp.dot(fs_t, w), ok, indef)

    (_, _), outs = jax.lax.scan(
        body, (Vx_T, Vxx_T), (Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs[:-1]), reverse=True)
    k, K, w_t, dg_t, dq_t, stop_t, dgg_t, dqg_t, ok_t, indef_t = outs
    w_all = jnp.concatenate([w_t, w_T[None]], axis=0)
    dg_gap = jnp.sum(dgg_t) - jnp.dot(Vx_T, fs[-1])
    dq_gap = jnp.sum(dqg_t) + jnp.dot(fs[-1], w_T)
    return (k, K, w_all, jnp.sum(dg_t), jnp.sum(dq_t), jnp.sum(stop_t),
            dg_gap, dq_gap, jnp.all(ok_t), jnp.any(indef_t))


def _boxfddp_backward_scan(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, tLx, tLxx, fs,
                           us, lb, ub, reg, qp_iters, kprev=None):
    """Single-scenario BoxFDDP backward (gaps + bounds) — the fused
    kernel's XLA reference and unbatched fallback: the FDDP deflected
    recursion with the per-knot masked BoxQP gain partition. ``kprev``
    warm-starts the QPs (see :func:`_box_backward_scan`). Returns
    (k, K, w_all, dg, dq, stop, dg_gap, dq_gap, ok, retryable) with
    ``w_all`` [T+1, ndx] the deflection vectors ``Vxx_t fs_t``."""
    ndx = Fx.shape[-1]
    dtype = Fx.dtype
    nu = Fu.shape[-1]
    eye_u = jnp.eye(nu, dtype=dtype)
    eye_x = jnp.eye(ndx, dtype=dtype)

    Vxx_T = tLxx + reg * eye_x
    w_T = Vxx_T @ fs[-1]
    Vx_T = tLx + w_T

    def body(carry, inp):
        Vx_n, Vxx_n = carry
        fx, fu, lx, lu, lxx, lxu, luu, fs_t, u_t, kp = inp
        Qx = lx + fx.T @ Vx_n
        Qu = lu + fu.T @ Vx_n
        FxTVxx = fx.T @ Vxx_n
        Qxx = lxx + FxTVxx @ fx
        Qxu = lxu + FxTVxx @ fu
        Quu = luu + fu.T @ Vxx_n @ fu + reg * eye_u
        x0 = jnp.zeros_like(u_t) if kp is None else -kp
        qp = boxqp(Quu, Qu, lb - u_t, ub - u_t, x0,
                   maxiter=qp_iters, n_alphas=5)
        k = -qp.x
        K = masked_free_solve(Quu, qp.free, Qxu.T)
        ok = jnp.all(jnp.isfinite(k)) & jnp.all(jnp.isfinite(K))
        Quuk = Quu @ k
        Vx = Qx + K.T @ Quuk - 2.0 * (K.T @ Qu)
        Vxx = Qxx - Qxu @ K
        Vxx = 0.5 * (Vxx + Vxx.T) + reg * eye_x
        w = Vxx @ fs_t
        Vx = Vx + w
        out_ok = (ok & jnp.all(jnp.isfinite(Vx)) & jnp.all(jnp.isfinite(Vxx)))
        indef = jnp.all(jnp.isfinite(Quu)) & ~out_ok
        return (Vx, Vxx), (k, K, w, jnp.dot(Qu, k), -jnp.dot(k, Quuk), jnp.dot(Qu, Qu),
                           -jnp.dot(Vx, fs_t), jnp.dot(fs_t, w), ok, indef)

    (_, _), outs = jax.lax.scan(
        body, (Vx_T, Vxx_T),
        (Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs[:-1], us, kprev), reverse=True)
    k, K, w_t, dg_t, dq_t, stop_t, dgg_t, dqg_t, ok_t, indef_t = outs
    w_all = jnp.concatenate([w_t, w_T[None]], axis=0)
    dg_gap = jnp.sum(dgg_t) - jnp.dot(Vx_T, fs[-1])
    dq_gap = jnp.sum(dqg_t) + jnp.dot(fs[-1], w_T)
    return (k, K, w_all, jnp.sum(dg_t), jnp.sum(dq_t), jnp.sum(stop_t),
            dg_gap, dq_gap, jnp.all(ok_t), jnp.any(indef_t))


def _box_backward_scan(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, tLx, tLxx, us, lb, ub, reg, qp_iters,
                       kprev=None):
    """Single-scenario Box backward (no gaps) — the Pallas kernel's XLA
    reference implementation and unbatched fallback. ``kprev`` [T, nu]
    warm-starts each knot's QP from the previous solver iteration's du
    (``du = -k``, clipped into the box by ``boxqp``)."""
    ndx = Fx.shape[-1]
    nu = Fu.shape[-1]
    dtype = Fx.dtype
    eye_u = jnp.eye(nu, dtype=dtype)
    eye_x = jnp.eye(ndx, dtype=dtype)

    def body(carry, inp):
        Vx_n, Vxx_n = carry
        fx, fu, lx, lu, lxx, lxu, luu, u_t, kp = inp
        Qx = lx + fx.T @ Vx_n
        Qu = lu + fu.T @ Vx_n
        FxTVxx = fx.T @ Vxx_n
        Qxx = lxx + FxTVxx @ fx
        Qxu = lxu + FxTVxx @ fu
        Quu = luu + fu.T @ Vxx_n @ fu + reg * eye_u
        x0 = jnp.zeros_like(u_t) if kp is None else -kp
        qp = boxqp(Quu, Qu, lb - u_t, ub - u_t, x0, maxiter=qp_iters, n_alphas=5)
        k = -qp.x
        K = masked_free_solve(Quu, qp.free, Qxu.T)
        Quuk = Quu @ k
        Vx = Qx + K.T @ Quuk - 2.0 * (K.T @ Qu)
        Vxx = Qxx - Qxu @ K
        Vxx = 0.5 * (Vxx + Vxx.T) + reg * eye_x
        ok = jnp.all(jnp.isfinite(k)) & jnp.all(jnp.isfinite(K))
        out_ok = ok & jnp.all(jnp.isfinite(Vx)) & jnp.all(jnp.isfinite(Vxx))
        indef = jnp.all(jnp.isfinite(Quu)) & ~out_ok
        return (Vx, Vxx), (k, K, jnp.dot(Qu, k), -jnp.dot(k, Quuk), jnp.dot(Qu, Qu), ok, indef)

    (_, _), outs = jax.lax.scan(
        body, (tLx, tLxx + reg * eye_x),
        (Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, us, kprev), reverse=True)
    k, K, dg_t, dq_t, stop_t, ok_t, indef_t = outs
    return (k, K, jnp.sum(dg_t), jnp.sum(dq_t), jnp.sum(stop_t), jnp.all(ok_t),
            jnp.any(indef_t))


def _backward(problem, run_diff, term_diff, fs, us, reg, use_gaps, bounds, settings,
              kprev=None):
    """Riccati sweep, Crocoddyl-faithful (see module docstring). ``kprev``
    [T, nu] warm-starts the BoxQPs (boxqp_warm_iters semantics)."""
    # cast up to ``us``'s varying axes: some branches fill unused slots
    # (dg_gap, Vx) with fresh zeros, which under shard_map would clash
    # with the varying retry-loop carry (utils/vma.py)
    return pvary_like(
        _backward_impl(problem, run_diff, term_diff, fs, us, reg, use_gaps,
                       bounds, settings, kprev), us)


def _backward_impl(problem, run_diff, term_diff, fs, us, reg, use_gaps, bounds,
                   settings, kprev=None):
    # the fused backward kernels take a single [nu] box; per-knot [T, nu]
    # bounds run through the generic scan below
    warm = kprev is not None
    qp_iters = settings.boxqp_warm_iters if warm else settings.boxqp_iters
    shared_box = bounds is not None and jnp.ndim(bounds.lb) == 1
    if settings.assoc_backward:
        if bounds is not None:
            raise ValueError("assoc_backward supports the unbounded "
                             "(DDP/FDDP) families only — the Box variants' "
                             "clamped-QP recursion is not a linear-"
                             "fractional map (see solvers/assoc_riccati.py)")
        from .assoc_riccati import fddp_backward_assoc

        # zero gaps recover the plain-DDP recursion (no Vx deflection)
        fs_eff = fs if use_gaps else jnp.zeros_like(fs)
        (k, K, w_all, dg, dq, stop, dg_gap, dq_gap, ok,
         retryable) = fddp_backward_assoc(
            run_diff.Fx, run_diff.Fu, run_diff.Lx, run_diff.Lu,
            run_diff.Lxx, run_diff.Lxu, run_diff.Luu,
            term_diff.Lx, term_diff.Lxx, fs_eff,
            jnp.asarray(reg, dtype=us.dtype))
        T = us.shape[0]
        zeros_Vx = jnp.zeros((T + 1, problem.state.ndx), dtype=us.dtype)
        zero = jnp.zeros_like(dg)
        return _Backward(
            k=k, K=K, Vx=zeros_Vx, w=w_all, dg=dg, dq=dq,
            dg_gap=dg_gap if use_gaps else zero,
            dq_gap=dq_gap if use_gaps else zero,
            stop=stop, ok=ok, retryable=retryable)
    if shared_box and (not use_gaps) and settings.use_pallas_backward:
        core = _get_box_backward_core(qp_iters, jax.default_backend() != "tpu", warm)
        kp = (us, kprev) if warm else (us,)
        k, K, dg, dq, stop, ok, retryable = core(
            run_diff.Fx, run_diff.Fu, run_diff.Lx, run_diff.Lu,
            run_diff.Lxx, run_diff.Lxu, run_diff.Luu,
            term_diff.Lx, term_diff.Lxx, *kp, bounds.lb, bounds.ub,
            jnp.asarray(reg, dtype=us.dtype))
        T = us.shape[0]
        ndx = problem.state.ndx
        zeros_Vx = jnp.zeros((T + 1, ndx), dtype=us.dtype)
        zeros_w = jnp.zeros((T + 1, ndx), dtype=us.dtype)
        zero = jnp.zeros_like(dg)
        return _Backward(k=k, K=K, Vx=zeros_Vx, w=zeros_w,
                         dg=dg, dq=dq, dg_gap=zero, dq_gap=zero, stop=stop, ok=ok,
                         retryable=retryable)
    if shared_box and use_gaps and settings.use_pallas_backward:
        core = _get_boxfddp_backward_core(qp_iters, jax.default_backend() != "tpu", warm)
        kp = (us, kprev) if warm else (us,)
        k, K, w_all, dg, dq, stop, dg_gap, dq_gap, ok, retryable = core(
            run_diff.Fx, run_diff.Fu, run_diff.Lx, run_diff.Lu,
            run_diff.Lxx, run_diff.Lxu, run_diff.Luu,
            term_diff.Lx, term_diff.Lxx, fs, *kp, bounds.lb, bounds.ub,
            jnp.asarray(reg, dtype=us.dtype))
        T = us.shape[0]
        ndx = problem.state.ndx
        zeros_Vx = jnp.zeros((T + 1, ndx), dtype=us.dtype)
        return _Backward(k=k, K=K, Vx=zeros_Vx, w=w_all,
                         dg=dg, dq=dq, dg_gap=dg_gap, dq_gap=dq_gap, stop=stop, ok=ok,
                         retryable=retryable)
    if (bounds is None) and use_gaps and settings.use_pallas_backward:
        core = _get_fddp_backward_core(problem.nu, jax.default_backend() != "tpu")
        k, K, w_all, dg, dq, stop, dg_gap, dq_gap, ok, retryable = core(
            run_diff.Fx, run_diff.Fu, run_diff.Lx, run_diff.Lu,
            run_diff.Lxx, run_diff.Lxu, run_diff.Luu,
            term_diff.Lx, term_diff.Lxx, fs, jnp.asarray(reg, dtype=us.dtype))
        T = us.shape[0]
        ndx = problem.state.ndx
        zeros_Vx = jnp.zeros((T + 1, ndx), dtype=us.dtype)
        return _Backward(k=k, K=K, Vx=zeros_Vx, w=w_all,
                         dg=dg, dq=dq, dg_gap=dg_gap, dq_gap=dq_gap, stop=stop, ok=ok,
                         retryable=retryable)
    ndx = problem.state.ndx
    nu = problem.nu
    dtype = us.dtype
    eye_u = jnp.eye(nu, dtype=dtype)
    eye_x = jnp.eye(ndx, dtype=dtype)

    Vxx_T = term_diff.Lxx + reg * eye_x
    # FDDP stores the DEFLECTED value gradient Vx + Vxx fs at every node
    # (Crocoddyl SolverFDDP::backwardPass) — it feeds both the parent's
    # Qx/Qu and the gap terms of the expected-improvement model, which is
    # what makes dVexp go negative on large gaps and routes acceptance
    # through the th_acceptnegstep branch.
    w_T = Vxx_T @ fs[-1] if use_gaps else jnp.zeros_like(term_diff.Lx)
    Vx_T = term_diff.Lx + (w_T if use_gaps else 0.0)

    lb_knot = bounds is not None and jnp.ndim(bounds.lb) == 2

    def body(carry, inp):
        Vx_n, Vxx_n = carry
        d, fs_t, u_t, bnd, kp = inp

        FuT = d.Fu.T
        FxT = d.Fx.T
        Qx = d.Lx + FxT @ Vx_n
        Qu = d.Lu + FuT @ Vx_n
        FxTVxx = FxT @ Vxx_n
        Qxx = d.Lxx + FxTVxx @ d.Fx
        Qxu = d.Lxu + FxTVxx @ d.Fu
        Quu = d.Luu + FuT @ Vxx_n @ d.Fu + reg * eye_u

        if bounds is None:
            L = jnp.linalg.cholesky(Quu)
            k = cho_solve((L, True), Qu)
            K = cho_solve((L, True), Qxu.T)
            ok = jnp.all(jnp.isfinite(L))
        else:
            lb_t, ub_t = bnd if lb_knot else (bounds.lb, bounds.ub)
            low = lb_t - u_t
            up = ub_t - u_t
            x0 = jnp.zeros_like(u_t) if kp is None else -kp
            qp = boxqp(Quu, Qu, low, up, x0,
                       maxiter=qp_iters, n_alphas=settings.boxqp_alphas)
            k = -qp.x
            K = masked_free_solve(Quu, qp.free, Qxu.T)
            ok = jnp.all(jnp.isfinite(k)) & jnp.all(jnp.isfinite(K))

        Quuk = Quu @ k
        Vx = Qx + K.T @ Quuk - 2.0 * (K.T @ Qu)
        Vxx = Qxx - Qxu @ K
        Vxx = 0.5 * (Vxx + Vxx.T) + reg * eye_x
        if use_gaps:
            w = Vxx @ fs_t
            Vx = Vx + w
        else:
            w = jnp.zeros_like(Vx)

        out_ok = (jnp.all(jnp.isfinite(k)) & jnp.all(jnp.isfinite(K))
                  & jnp.all(jnp.isfinite(Vx)) & jnp.all(jnp.isfinite(Vxx)))
        indef = jnp.all(jnp.isfinite(Quu)) & ~out_ok
        out = (k, K, Vx, w, jnp.dot(Qu, k), -jnp.dot(k, Quuk), jnp.dot(Qu, Qu), ok, indef)
        return (Vx, Vxx), out

    bnd_xs = (bounds.lb, bounds.ub) if lb_knot else None
    (_, _), outs = jax.lax.scan(
        body, (Vx_T, Vxx_T), (run_diff, fs[:-1], us, bnd_xs, kprev), reverse=True)
    k, K, Vx_t, w_t, dg_t, dq_t, stop_t, ok_t, indef_t = outs

    Vx = jnp.concatenate([Vx_t, Vx_T[None]], axis=0)
    w_all = jnp.concatenate([w_t, w_T[None]], axis=0)
    if use_gaps:
        dg_gap = -jnp.einsum("ti,ti->", Vx, fs)
        dq_gap = jnp.einsum("ti,ti->", fs, w_all)
    else:
        dg_gap = jnp.zeros((), dtype=dtype)
        dq_gap = jnp.zeros((), dtype=dtype)
    return _Backward(
        k=k, K=K, Vx=Vx, w=w_all,
        dg=jnp.sum(dg_t), dq=jnp.sum(dq_t), dg_gap=dg_gap, dq_gap=dq_gap,
        stop=jnp.sum(stop_t), ok=jnp.all(ok_t), retryable=jnp.any(indef_t),
    )


def _rollout(problem, xs, us, k, K, fs, alpha, gap_scale_on, use_gaps, bounds):
    """One trial rollout at step length alpha.

    FDDP: gaps contract by (1 - alpha) (Crocoddyl ``SolverFDDP::forwardPass``);
    DDP: plain nonlinear rollout from x0. Box variants clamp controls.
    """
    state = problem.state
    gscale = jnp.where(gap_scale_on, alpha - 1.0, 0.0) if use_gaps else jnp.asarray(0.0, dtype=xs.dtype)

    x0_try = state.integrate(problem.x0, fs[0] * gscale)
    # per-knot control bounds ride the scan ([T, nu] arrays); shared bounds
    # stay closure constants (the hot path is untouched)
    lb_knot = bounds is not None and jnp.ndim(bounds.lb) == 2

    def step(carry, inp):
        x_try, cost_acc = carry
        if problem.per_knot:
            x_ref, u_ref, k_t, K_t, fs_n, model, bnd = inp
        else:
            x_ref, u_ref, k_t, K_t, fs_n, bnd = inp
            model = problem.running
        dx = state.diff(x_ref, x_try)
        u_try = u_ref - alpha * k_t - K_t @ dx
        if bounds is not None:
            lb_t, ub_t = bnd if lb_knot else (bounds.lb, bounds.ub)
            u_try = jnp.clip(u_try, lb_t, ub_t)
        data = model.calc(x_try, u_try)
        x_next = state.integrate(data.xnext, fs_n * gscale)
        return (x_next, cost_acc + data.cost), (x_try, u_try)

    bnd_xs = (bounds.lb, bounds.ub) if lb_knot else None
    scan_xs = ((xs[:-1], us, k, K, fs[1:], problem.running, bnd_xs)
               if problem.per_knot else (xs[:-1], us, k, K, fs[1:], bnd_xs))
    (xT, cost_acc), (xs_out, us_out) = jax.lax.scan(
        step, pvary_like((x0_try, jnp.asarray(0.0, dtype=xs.dtype)), xs),
        scan_xs)
    u0 = jnp.zeros(problem.terminal.nu, dtype=xs.dtype)
    cost_try = cost_acc + problem.terminal.calc(xT, u0).cost
    xs_try = jnp.concatenate([xs_out, xT[None]], axis=0)
    return xs_try, us_out, cost_try


def solve(
    problem: ShootingProblem,
    xs_init=None,
    us_init=None,
    settings: SolverSettings = SolverSettings(),
    use_gaps: bool = True,
    bounds: Optional[Bounds] = None,
    fast=None,
) -> SolveResult:
    """Run the solver. ``use_gaps=True`` -> FDDP family, else DDP family;
    ``bounds`` switches on the BoxQP backward pass + clamped rollouts.
    ``fast`` optionally supplies fused Pallas linearize/rollout callables
    (see ``aslr_to_tpu.pallas.vsa_kernels.build_fast_path``); the generic
    XLA path is the reference implementation.

    Pure function of its pytree arguments: jit it, vmap it over batches of
    ``problem`` leaves (x0, cost targets, ...), shard the batch over a mesh.
    """
    with jax.default_matmul_precision("float32"):
        return _solve_impl(problem, xs_init, us_init, settings, use_gaps, bounds, fast)


def _solve_impl(problem, xs_init, us_init, settings, use_gaps, bounds, fast) -> SolveResult:
    # TPU's default matmul precision routes even f32 dot_generals through
    # bf16 passes; on this problem family that doubles the f32 divergence
    # rate of the generic XLA path (measured 65 vs 30 of 128 scenarios), so
    # `solve` pins full-f32 contractions — the tiny Riccati/dynamics
    # matmuls are latency-bound and cost the same either way.
    T = problem.T
    state = problem.state
    nu = problem.nu
    x0 = problem.x0
    dtype = x0.dtype

    xs = jnp.broadcast_to(x0, (T + 1,) + x0.shape).astype(dtype) if xs_init is None else jnp.asarray(xs_init, dtype=dtype)
    us = jnp.zeros((T, nu), dtype=dtype) if us_init is None else jnp.asarray(us_init, dtype=dtype)
    if bounds is not None:
        # Project the warm start into the box: a bound-violating guess makes
        # the expected-improvement model point outward (dVexp < 0 at every
        # alpha) and stalls the line search on its artificially cheap cost.
        us = jnp.clip(us, bounds.lb, bounds.ub)

    s = settings
    alphas = jnp.asarray([2.0 ** -i for i in range(s.n_alphas)], dtype=dtype)
    nan = jnp.asarray(jnp.nan, dtype=dtype)
    log0 = SolveLog(*[jnp.full((s.maxiter,), nan) for _ in range(7)])

    # loop carries cast to x0's varying axes so the solver runs under
    # shard_map with the varying-manual-axes check ON (utils/vma.py)
    init = pvary_like(_LoopState(
        xs=xs, us=us,
        cost=jnp.asarray(jnp.inf, dtype=dtype),
        stop=jnp.asarray(jnp.inf, dtype=dtype),
        reg=jnp.asarray(s.reg_init, dtype=dtype),
        it=jnp.asarray(0, dtype=jnp.int32),
        done=jnp.asarray(False),
        converged=jnp.asarray(False),
        diverged=jnp.asarray(False),
        log=log0,
        kprev=jnp.zeros((T, nu), dtype=dtype),
        rej_streak=jnp.asarray(0, dtype=jnp.int32),
        nrt_streak=jnp.asarray(0, dtype=jnp.int32),
    ), x0)
    warm = s.boxqp_warm_iters > 0 and bounds is not None

    def cond(st: _LoopState):
        return ~st.done

    # runtime terminal goal weight for the fused kernels (a pytree leaf of
    # problem, so homotopy stages share one compiled program)
    fast_wterm = fast.wterm_of(problem) if fast is not None else None

    def body(st: _LoopState):
        if fast is not None:
            cost, run_diff, term_diff, xnext = fast.linearize(st.xs, st.us, fast_wterm)
        else:
            cost, run_diff, term_diff, xnext = _linearize_core(problem, st.xs, st.us)
        fs = _gaps(problem, st.xs, xnext)
        gap_norm = jnp.max(jnp.abs(fs))
        feasible = gap_norm < s.th_gaptol
        infeasible_f = (~feasible).astype(dtype)

        # A non-finite linearization (f32 overflow on an extreme-but-finite
        # trajectory) can never yield a successful backward pass at ANY
        # regularization — retrying would drive the batched retry loop to
        # full escalation (Crocoddyl instead aborts the solve here).
        lin_ok = jnp.isfinite(cost)
        for leaf in jax.tree.leaves((run_diff, term_diff)):
            lin_ok = lin_ok & jnp.all(jnp.isfinite(leaf))

        # -- backward pass with regularization-retry ----------------------
        kp = st.kprev if warm else None
        bw0 = _backward(problem, run_diff, term_diff, fs, st.us, st.reg,
                        use_gaps, bounds, s, kp)

        def bw_cond(c):
            # Gates keep one bad scenario from dragging the whole vmapped
            # batch through reg escalation (measured: 75% of bench device
            # time): finished scenarios and non-finite linearizations never
            # retry, non-retryable failures (f32 value-recursion overflow)
            # never retry, and in-iteration bumps are capped (st.reg
            # persists, so escalation continues across iterations).
            reg, bw, tries = c
            return ((~bw.ok) & bw.retryable & (reg < s.reg_max)
                    & (tries < s.bw_retry_cap) & (~st.done) & lin_ok)

        def bw_body(c):
            reg, _, tries = c
            reg2 = jnp.minimum(reg * s.reg_factor, s.reg_max)
            return (reg2,
                    _backward(problem, run_diff, term_diff, fs, st.us, reg2,
                              use_gaps, bounds, s, kp),
                    tries + 1)

        reg, bw, _ = jax.lax.while_loop(
            bw_cond, bw_body,
            pvary_like((st.reg, bw0, jnp.asarray(0, jnp.int32)), st.xs))
        bw_failed = ~bw.ok

        # -- expected improvement model (gap-aware, FDDP) -----------------
        if use_gaps:
            dg = bw.dg + infeasible_f * bw.dg_gap
            dq = bw.dq + infeasible_f * bw.dq_gap
        else:
            dg, dq = bw.dg, bw.dq

        # -- early-exit backtracking line search --------------------------
        # One rollout per trial, batch-wide; under an outer vmap the
        # while_loop keeps trying until every scenario has accepted (or the
        # alphas are exhausted), freezing already-accepted scenarios — the
        # typical iteration costs 1-2 rollouts instead of always 10, with
        # Crocoddyl's exact first-acceptable-alpha semantics.
        def try_alpha(alpha):
            if fast is not None:
                xs_t, us_t, cost_t = fast.rollout(
                    st.xs, st.us, bw.k, bw.K, problem.x0, alpha, fs, ~feasible,
                    fast_wterm)
            else:
                xs_t, us_t, cost_t = _rollout(
                    problem, st.xs, st.us, bw.k, bw.K, fs, alpha, ~feasible, use_gaps, bounds)
            if use_gaps:
                # dv correction (Crocoddyl FDDP::expectedImprovement):
                # dv = -sum_t fs_t . (Vxx_t dx_t), dx_t = xs_t (-) xs_try_t;
                # by Vxx symmetry == -sum_t w_t . dx_t with the backward's
                # deflection vectors w_t = Vxx_t fs_t (see _Backward.w)
                dx = jax.vmap(state.diff)(xs_t, st.xs)
                dv = -jnp.einsum("ti,ti->", bw.w, dx) * infeasible_f
                d1 = dg + dv
                d2 = dq - 2.0 * dv
            else:
                d1, d2 = dg, dq
            dV = cost - cost_t
            dVexp = alpha * (d1 + 0.5 * alpha * d2)
            # Crocoddyl's forwardPass raises on non-finite states and treats
            # the trial as failed; accepting a trajectory whose states
            # overflowed (even with finite cost) would poison every later
            # linearization with NaNs.
            finite = jnp.isfinite(cost_t) & jnp.all(jnp.isfinite(xs_t))
            if use_gaps:
                accept_pos = (dVexp >= 0.0) & ((d1 < s.th_grad) | (dV > s.th_acceptstep * dVexp))
                accept_neg = (dVexp < 0.0) & (dV > s.th_acceptnegstep * dVexp)
                accept = finite & (accept_pos | accept_neg)
            else:
                accept = finite & (dVexp >= 0.0) & (
                    (d1 < s.th_grad) | (~feasible) | (dV > s.th_acceptstep * dVexp))
            return accept, xs_t, us_t, cost_t

        def ls_cond(c):
            i, accepted, _, _, _, _ = c
            return (~accepted) & (i < s.n_alphas)

        def ls_body(c):
            i, accepted, xs_b, us_b, cost_b, alpha_b = c
            alpha = alphas[i]
            accept, xs_t, us_t, cost_t = try_alpha(alpha)
            take = accept & (~accepted)
            return (
                i + 1,
                accepted | accept,
                jnp.where(take, xs_t, xs_b),
                jnp.where(take, us_t, us_b),
                jnp.where(take, cost_t, cost_b),
                jnp.where(take, alpha, alpha_b),
            )

        # Finished scenarios start "accepted" so they cannot force extra
        # batched line-search trials (their updates are discarded anyway);
        # likewise a failed backward pass yields no usable direction
        # (Crocoddyl aborts the solve before the forward pass there).
        ls0 = pvary_like(
            (jnp.asarray(0, jnp.int32), st.done | bw_failed, st.xs, st.us, cost,
             jnp.asarray(0.0, dtype=dtype)), st.xs)
        _, any_accept, xs_new, us_new, cost_new, alpha_sel = jax.lax.while_loop(
            ls_cond, ls_body, ls0)

        # -- regularization schedule --------------------------------------
        eff_step = jnp.where(any_accept, alpha_sel, alphas[-1])
        reg_dec = jnp.maximum(reg / s.reg_factor, s.reg_min)
        # full-ladder rejections escalate by reg_reject_factor (see
        # SolverSettings); bw-failed scenarios report any_accept=True and
        # take the ordinary x reg_factor path
        inc_f = jnp.where(any_accept, s.reg_factor, s.reg_reject_factor)
        reg_inc = jnp.minimum(reg * inc_f, s.reg_max)
        do_inc = eff_step <= s.th_stepinc
        do_dec = (~do_inc) & (eff_step > s.th_stepdec)
        reg_new = jnp.where(do_inc, reg_inc, jnp.where(do_dec, reg_dec, reg))
        # A capped-out backward retry is only fatal once reg can no longer
        # grow; otherwise the escalated st.reg carries into the next
        # iteration and the backward gets another chance. A non-finite
        # linearization is fatal immediately (Crocoddyl aborts there).
        diverged = ((bw_failed & (reg >= s.reg_max))
                    | (do_inc & (reg_new >= s.reg_max))
                    | ~lin_ok)

        # -- doomed-scenario early retirement (see SolverSettings) --------
        # full_reject: the ladder genuinely ran (bw ok — failed backwards
        # start "accepted") and rejected every alpha, and the schedule is
        # escalating reg in response
        full_reject = (~any_accept) & do_inc
        rej_streak = jnp.where(full_reject, st.rej_streak + 1,
                               jnp.zeros_like(st.rej_streak))
        nonretry = bw_failed & ~bw.retryable
        nrt_streak = jnp.where(nonretry, st.nrt_streak + 1,
                               jnp.zeros_like(st.nrt_streak))
        if s.doomed_reject_iters:
            diverged = (diverged
                        | (rej_streak >= s.doomed_reject_iters)
                        | (nrt_streak >= 2))

        converged = feasible & (bw.stop < s.th_stop)

        it = st.it
        log = SolveLog(
            costs=st.log.costs.at[it].set(cost_new),
            stops=st.log.stops.at[it].set(bw.stop),
            regs=st.log.regs.at[it].set(reg_new),
            steps=st.log.steps.at[it].set(jnp.where(any_accept, alpha_sel, 0.0)),
            d1=st.log.d1.at[it].set(dg),
            d2=st.log.d2.at[it].set(dq),
            gap_norms=st.log.gap_norms.at[it].set(gap_norm),
        )

        it1 = it + 1
        done = converged | diverged | (it1 >= s.maxiter)
        return _LoopState(
            xs=xs_new, us=us_new, cost=cost_new, stop=bw.stop, reg=reg_new,
            it=it1, done=done, converged=converged, diverged=diverged, log=log,
            kprev=jnp.where(bw.ok, bw.k, st.kprev),
            rej_streak=rej_streak, nrt_streak=nrt_streak,
        )

    final = jax.lax.while_loop(cond, body, init)
    return SolveResult(
        xs=final.xs, us=final.us, cost=final.cost, stop=final.stop,
        iterations=final.it, converged=final.converged, diverged=final.diverged,
        reg=final.reg, log=final.log,
    )


# ---------------------------------------------------------------------------
# Crocoddyl-shaped convenience wrappers
# ---------------------------------------------------------------------------

class _SolverBase:
    """Thin OO facade over the functional core (API parity with the
    reference's ``crocoddyl.Solver*`` usage)."""

    _use_gaps = True
    _boxed = False

    def __init__(self, problem: ShootingProblem, bounds: Optional[Bounds] = None):
        self.problem = problem
        self.bounds = bounds
        self.th_stop = 1e-9
        if self._boxed and bounds is None:
            raise ValueError("Box solvers need control bounds")

    def solve(self, xs_init=None, us_init=None, maxiter=100, settings: Optional[SolverSettings] = None) -> SolveResult:
        p = self.problem
        dtype = p.x0.dtype
        if xs_init is None or (hasattr(xs_init, "__len__") and len(xs_init) == 0):
            xs_init = jnp.broadcast_to(p.x0, (p.T + 1,) + p.x0.shape)
        if us_init is None or (hasattr(us_init, "__len__") and len(us_init) == 0):
            us_init = jnp.zeros((p.T, p.nu), dtype=dtype)
        if settings is None:
            settings = SolverSettings(maxiter=maxiter, th_stop=self.th_stop)

        fn = jax.jit(
            lambda prob, xs, us: solve(
                prob, xs, us, settings=settings, use_gaps=self._use_gaps,
                bounds=self.bounds if self._boxed else None))
        result = fn(p, jnp.asarray(xs_init, dtype=dtype), jnp.asarray(us_init, dtype=dtype))
        self.result = result
        return result


class SolverDDP(_SolverBase):
    _use_gaps = False


class SolverFDDP(_SolverBase):
    _use_gaps = True


class SolverBoxDDP(_SolverBase):
    _use_gaps = False
    _boxed = True


class SolverBoxFDDP(_SolverBase):
    _use_gaps = True
    _boxed = True
