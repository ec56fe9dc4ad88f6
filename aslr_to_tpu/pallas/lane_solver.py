"""Lane-layout end-to-end batched DDP/FDDP/BoxDDP solver.

The standard batched path (``vmap(solve)`` + ``custom_vmap`` kernel
dispatch, parallel/batch.py) pays a batch-major <-> lane relayout around
EVERY kernel call: the linearize kernel transposes its 9 derivative
tensors back to batch-major, the backward kernel immediately transposes
them to lanes again, and each line-search rollout round-trips xs/us/k/K.
At B=2048, T=100 that is ~0.5 GB of pure relayout traffic per solver
iteration on tensors whose batch-major form wastes 15/16 of every vector
register (trailing dims 4/8 on 128-wide lanes).

This module instead hand-batches the WHOLE solver loop in lane layout:
the loop state (xs [T+1,8,Bp], us [T,nu,Bp]) lives on the lanes, the
three fused kernels (linearize / Riccati backward / rollout) are called
through their ``lane_io`` entry points, and relayouts happen exactly
twice per solve — x0 in, solution out.

Semantics replicate ``vmap(solvers.ddp.solve)`` element-for-element: JAX
batches a ``while_loop`` by running the body while ANY element's cond
holds and masking each element's carry update with its own cond; the
loops below implement the same per-element predicates explicitly (see
``_sel``). Bit-checked against the vmapped reference in float64
interpret mode (tests/test_lane_solver.py).

Scope: all four solver families on problems covered by
:func:`.vsa_kernels.extract_vsa_spec`:

  - BoxDDP (bounds, no gaps) — the flagship/bench workload, reference
    ``examples/two_dof_vsa_boxddp.py:69``;
  - FDDP (gaps, unbounded) — the SEA reach / pendulum family, reference
    ``examples/two_dof_sea.py:69`` (gap-aware backward kernel, deflected
    Vx, dv-corrected expected improvement, gap-contracting rollouts);
  - DDP (no gaps, unbounded) — the FDDP kernel with zero gaps;
  - BoxFDDP (gaps + bounds) — the deflected recursion with the masked
    BoxQP gain partition (riccati.riccati_boxfddp_backward_lanes),
    clamped gap-contracting rollouts.

Chain-length generic since round 5 (the spec carries ``nl``; ndx=4*nl):
the talos_arm-class 7-DoF SEA family runs this loop at 2326 solves/s —
145x the generic path (scripts/bench_7dof.py, docs/BENCH.md round 5).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..solvers.ddp import Bounds, SolveLog, SolveResult, SolverSettings
from ..solvers.problem import ShootingProblem
from ..utils.vma import pvary_like
from .layout import padded_batch
from .riccati import (
    prepare_riccati_box_backward_lanes,
    prepare_riccati_boxfddp_backward_lanes,
    prepare_riccati_fddp_backward_lanes,
)
from .vsa_kernels import (
    build_linearize,
    build_rollout,
    build_rolloutn,
    extract_vsa_spec,
)


class _LaneState(NamedTuple):
    xs: jnp.ndarray        # [T+1, 8, Bp]
    us: jnp.ndarray        # [T, nu, Bp]
    cost: jnp.ndarray      # [Bp]
    stop: jnp.ndarray      # [Bp]
    reg: jnp.ndarray       # [Bp]
    it: jnp.ndarray        # [Bp] int32
    done: jnp.ndarray      # [Bp] bool
    converged: jnp.ndarray
    diverged: jnp.ndarray
    kprev: jnp.ndarray     # [T, nu, Bp] previous k (BoxQP warm start)
    rej_streak: jnp.ndarray  # [Bp] int32 consecutive full-ladder rejections
    nrt_streak: jnp.ndarray  # [Bp] int32 consecutive non-retryable bw fails
    log: SolveLog          # [maxiter, Bp] per-iteration series ([maxiter, 0]
                           # when keep_log=False)


def _sel(pred, new, old):
    """Per-lane select: pred [Bp] broadcast against [..., Bp] leaves."""
    return jnp.where(pred.reshape((1,) * (new.ndim - 1) + (-1,)), new, old)


def build_lane_solver(
    problem: ShootingProblem,
    settings: SolverSettings = SolverSettings(),
    bounds: Optional[Bounds] = None,
    nb: int = 128,
    interpret: Optional[bool] = None,
    use_gaps: bool = False,
    kernel_ok: bool = True,
    ls_first_single: bool = False,
    rollout_tiles: int = 1,
    ls_trials: int = 2,
    keep_log: bool = False,
    speculative_backward: bool = False,
):
    """Build ``solve_batch(x0s[, xs_init, us_init]) -> SolveResult`` for a
    CONCRETE problem (constants are baked into the kernels; call outside
    jit). ``x0s`` is [B, nx] batch-major.

    ``keep_log=True`` records the per-iteration scalar series
    (:class:`SolveLog` — cost, stop, reg, step, d1, d2, gap norm; [B,
    maxiter], rows past a lane's termination stay NaN) exactly as
    ``vmap(solve)`` does, so ``utils.verbose.format_iteration_table``
    renders production lane solves (CallbackLogger parity, reference
    ``python/aslr_to/__init__.py:17-28``). Costs ~7 [Bp]-row HBM writes
    per iteration — measured +0.24% (within noise) with bit-identical
    outputs at the bench config (scripts/diag_keeplog.py) — default-off
    only to keep the driver metric's program minimal.

    ``kernel_ok=False`` restores the pre-round-4 linearization health
    check (leaf-by-leaf ``isfinite`` over the 9 derivative tensors read
    back from HBM) in place of the in-kernel flag — kept only for the
    A/B measurement in scripts/diag_linok.py and the parity test.

    ``ls_first_single``: evaluate the line search's FIRST alpha with the
    one-trajectory rollout kernel and only enter the two-trial ladder on
    rejection. Measured SLOWER on both the cold and warm bench workloads
    (docs/BENCH.md round 4) — kept off. Semantically identical to the
    default ladder; bit-identical only when the 1- and 2-trial kernels
    pick the same time-chunk plan (true at the no-gaps default VMEM
    budget; the gap variants chunk differently, so per-trajectory cost
    sums can differ by reassociation ulps and an acceptance test on the
    boundary may flip).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s = settings
    spec_bw = speculative_backward
    spec = extract_vsa_spec(problem, bounds)
    T = problem.T
    nu = spec.nu
    NDX = spec.ndx
    lin = build_linearize(spec, T, nb, interpret, lane_io=True)
    rolln = build_rolloutn(spec, T, nb, interpret, use_gaps=use_gaps,
                           n_trials=ls_trials, tiles=rollout_tiles)
    roll1 = (build_rollout(spec, T, nb, interpret, use_gaps=use_gaps,
                           lane_io=True, tiles=rollout_tiles)
             if ls_first_single else None)
    boxed = bounds is not None
    box_pk = spec.per_knot_box
    if boxed:
        lb = jnp.asarray(bounds.lb)      # [nu] shared, or [T, nu] per-knot
        ub = jnp.asarray(bounds.ub)

    def solve_batch(x0s, xs_init=None, us_init=None, wterm_scale=None,
                    box_ub=None):
        with jax.default_matmul_precision("float32"):
            return _impl(x0s, xs_init, us_init, wterm_scale, box_ub)

    def _impl(x0s, xs_init, us_init, wterm_scale, box_ub):
        B = x0s.shape[0]
        dtype = x0s.dtype
        Bp = padded_batch(B, nb)
        pad = Bp - B
        # big-state (ndx > 8) kernels run under the raised scoped-VMEM
        # budget (vsa_kernels._big_state_params; the default 16 MiB
        # cannot hold the [ndx, ndx, P, nb] per-knot intermediates plus
        # XLA's VMEM-promoted k/K loop buffers — measured 20-24 MB at
        # ndx=28). Any batch size compiles; B=1024 is the measured
        # throughput knee on the 7-DoF bench (scripts/bench_7dof.py).

        def to_lanes(x):
            x = jnp.asarray(x, dtype)
            if pad:
                x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], dtype)], axis=0)
            return jnp.transpose(x, tuple(range(1, x.ndim)) + (0,))

        x0_l = to_lanes(x0s)                                # [8, Bp]
        xs0 = (jnp.broadcast_to(x0_l, (T + 1, NDX, Bp)) if xs_init is None
               else to_lanes(xs_init))
        us0 = (jnp.zeros((T, nu, Bp), dtype) if us_init is None
               else to_lanes(us_init))
        if boxed and box_pk:
            # per-knot [T, nu] box: a build-time constant of the kernels
            # (SMEM tables closed over by the builders) — incompatible with
            # the runtime bound continuation
            if box_ub is not None:
                raise ValueError("box_ub continuation requires a shared "
                                 "(non-per-knot) control box")
            us0 = jnp.clip(us0, lb.astype(dtype)[:, :, None],
                           ub.astype(dtype)[:, :, None])
            lb_pk = lb.astype(dtype)
            ub_pk = ub.astype(dtype)
        elif boxed:
            # box_ub ([nu], traced) overrides the upper bound at runtime —
            # the stiffness-bound continuation's per-stage box
            ub_eff = ub.astype(dtype) if box_ub is None else jnp.asarray(box_ub, dtype)
            # project the warm start into the box (see solvers.ddp._solve_impl)
            us0 = jnp.clip(us0, lb.astype(dtype)[None, :, None], ub_eff[None, :, None])
            lb_l = jnp.broadcast_to(lb.astype(dtype)[:, None], (nu, Bp))
            ub_l = jnp.broadcast_to(ub_eff[:, None], (nu, Bp))
        # terminal goal weight as a runtime lane input; ``wterm_scale`` (a
        # traced scalar) ramps it for homotopy stages without recompiling
        wterm_l = jnp.full((1, Bp), spec.w_goal_term, dtype)
        if wterm_scale is not None:
            wterm_l = wterm_l * jnp.asarray(wterm_scale, dtype)
        zeros_fs = jnp.zeros((T + 1, NDX, Bp), dtype)
        zeros_1B = jnp.zeros((1, Bp), dtype)

        alphas = jnp.asarray([2.0 ** -i for i in range(s.n_alphas)], dtype=dtype)
        inf = jnp.full((Bp,), jnp.inf, dtype)
        pad_mask = jnp.arange(Bp) >= B                      # padding lanes never run
        log_cols = Bp if keep_log else 0
        nan_log = SolveLog(*[jnp.full((s.maxiter, log_cols), jnp.nan, dtype)
                             for _ in SolveLog._fields])

        # carries cast to x0's varying axes: the lane loop runs under
        # shard_map with the varying-manual-axes check ON (utils/vma.py)
        init = pvary_like(_LaneState(
            xs=xs0, us=us0, cost=inf, stop=inf,
            reg=jnp.full((Bp,), s.reg_init, dtype),
            it=jnp.zeros((Bp,), jnp.int32),
            done=pad_mask,
            converged=jnp.zeros((Bp,), bool),
            diverged=jnp.zeros((Bp,), bool),
            kprev=jnp.zeros((T, nu, Bp), dtype),
            rej_streak=jnp.zeros((Bp,), jnp.int32),
            nrt_streak=jnp.zeros((Bp,), jnp.int32),
            log=nan_log,
        ), x0_l)

        warm = boxed and s.boxqp_warm_iters > 0
        qp_iters = s.boxqp_warm_iters if warm else s.boxqp_iters
        if boxed:
            blb, bub = (lb_pk, ub_pk) if box_pk else (lb_l, ub_l)

        def prepare_backward(run, term, us_l, fs_l, kprev_l):
            """Pack/pad the backward inputs ONCE per solver iteration and
            return ``launch(reg)`` — the reg-retry loop relaunches with
            identical inputs except reg, and per-relaunch re-packing
            measured ~4 ms/batch of pure reshape copies (round-5
            profile, docs/BENCH.md)."""
            if boxed and use_gaps:
                launch = prepare_riccati_boxfddp_backward_lanes(
                    run["Fx"], run["Fu"], run["Lx"], run["Lu"],
                    run["Lxx"], run["Lxu"], run["Luu"],
                    term["Lx"], term["Lxx"], fs_l, us_l, blb, bub,
                    qp_iters=qp_iters, nb=nb, interpret=interpret,
                    per_knot_box=box_pk, kprev_l=kprev_l)
            elif boxed:
                launch = prepare_riccati_box_backward_lanes(
                    run["Fx"], run["Fu"], run["Lx"], run["Lu"],
                    run["Lxx"], run["Lxu"], run["Luu"],
                    term["Lx"], term["Lxx"], us_l, blb, bub,
                    qp_iters=qp_iters, nb=nb, interpret=interpret,
                    per_knot_box=box_pk, kprev_l=kprev_l)
            else:
                launch = prepare_riccati_fddp_backward_lanes(
                    run["Fx"], run["Fu"], run["Lx"], run["Lu"],
                    run["Lxx"], run["Lxu"], run["Luu"],
                    term["Lx"], term["Lxx"], fs_l,
                    nu=nu, nb=nb, interpret=interpret)

            def backward(reg):
                # fresh-zero slots (unused dg_gap/Vxx) must match the
                # varying retry-loop carry under shard_map (utils/vma.py)
                return pvary_like(launch(reg), us_l)

            return backward

        def body(st: _LaneState) -> _LaneState:
            active = ~st.done
            cost, run, term, xnext_l, ok_l = lin(st.xs, st.us, wterm_l)

            # defect gaps fs = diff(xs, [x0; xnext]) — Euclidean state,
            # matching both solvers.ddp._gaps and the lane kernels' dx
            # convention. The FDDP family consumes the full tensor; the
            # no-gaps families only the feasibility flag.
            fs_l = jnp.concatenate(
                [(x0_l - st.xs[0])[None], xnext_l - st.xs[1:]], axis=0)
            gap_norm = jnp.max(jnp.abs(fs_l), axis=(0, 1))
            feasible = gap_norm < s.th_gaptol
            infeas_f = (~feasible).astype(dtype)

            # linearization health: in-kernel finiteness flag over all nine
            # derivative tensors (computed while they were in registers —
            # avoids re-reading ~360 MB/iter from HBM) AND a finite cost
            if kernel_ok:
                lin_ok = jnp.isfinite(cost) & ok_l
            else:
                lin_ok = jnp.isfinite(cost)
                for leaf in list(run.values()) + list(term.values()):
                    lin_ok = lin_ok & jnp.all(
                        jnp.isfinite(leaf), axis=tuple(range(leaf.ndim - 1)))

            bw_fs = fs_l if use_gaps else zeros_fs
            kp = st.kprev if warm else None

            # -- backward pass with per-lane regularization retry ----------
            backward = prepare_backward(run, term, st.us, bw_fs, kp)
            bw0 = backward(st.reg)

            def bw_pred(reg, bw, tries):
                return ((~bw.ok) & bw.retryable & (reg < s.reg_max)
                        & (tries < s.bw_retry_cap) & active & lin_ok)

            def bw_cond(c):
                reg, bw, tries = c
                return jnp.any(bw_pred(reg, bw, tries))

            def bw_step(c):
                """One reg bump + backward + per-lane merge (the
                sequential retry round)."""
                reg, bw, tries = c
                pred = bw_pred(reg, bw, tries)
                reg2 = jnp.where(pred, jnp.minimum(reg * s.reg_factor, s.reg_max), reg)
                bw2 = backward(reg2)
                bw_m = jax.tree.map(lambda n, o: _sel(pred, n, o), bw2, bw)
                return reg2, bw_m, tries + pred.astype(jnp.int32)

            if spec_bw:
                # speculative dual-reg retry (VERDICT r4 item 8 A/B):
                # each loop round evaluates TWO ladder rungs — the
                # second launch rides the first's latency shadow and
                # halves the round count (cond reduce + 10-tensor merge
                # glue per round). Exact sequential semantics: rung b
                # only takes where rung a's result still satisfies the
                # retry predicate, so every lane lands on the same reg
                # as the one-rung loop (parity test-pinned).
                def bw_body(c):
                    return bw_step(bw_step(c))
            else:
                bw_body = bw_step

            reg, bw, _ = jax.lax.while_loop(
                bw_cond, bw_body,
                pvary_like((st.reg, bw0, jnp.zeros((Bp,), jnp.int32)), st.xs))
            bw_failed = ~bw.ok

            # -- expected improvement model (gap-aware, FDDP) --------------
            if use_gaps:
                dg = bw.dg + infeas_f * bw.dg_gap
                dq = bw.dq + infeas_f * bw.dq_gap
            else:
                dg, dq = bw.dg, bw.dq

            # -- early-exit backtracking line search (per-lane alpha) ------
            # two trials per round in ONE rollout launch (the rollout is
            # latency-bound; the second trajectory reuses every loaded
            # input — trial math is bit-identical to separate launches,
            # and first-acceptable-alpha semantics are preserved: trial a
            # wins over trial b).
            def ls_accept(alpha, xs_t, cost_t):
                dV = cost - cost_t
                finite = jnp.isfinite(cost_t) & jnp.all(jnp.isfinite(xs_t), axis=(0, 1))
                if use_gaps:
                    # dv correction (Crocoddyl FDDP::expectedImprovement):
                    # dv = -sum_t fs_t . (Vxx_t dx_t), dx_t = xs (-) xs_try
                    # (state.diff(xs_t, st.xs) in solvers/ddp.py = st.xs - xs_t);
                    # by Vxx symmetry == -sum_t w_t . dx_t with the kernel's
                    # deflection vectors w_t = Vxx_t fs_t ([T+1, ndx, Bp] —
                    # ndx x smaller than the per-node Vxx the backward used
                    # to emit; the [T,ndx,ndx,Bp] retry carry was ~20% of
                    # 7-DoF device time, docs/BENCH.md round 5)
                    dx = st.xs - xs_t
                    dv = -jnp.einsum("tib,tib->b", bw.w, dx) * infeas_f
                    d1 = dg + dv
                    d2 = dq - 2.0 * dv
                    dVexp = alpha * (d1 + 0.5 * alpha * d2)
                    accept_pos = (dVexp >= 0.0) & (
                        (d1 < s.th_grad) | (dV > s.th_acceptstep * dVexp))
                    accept_neg = (dVexp < 0.0) & (dV > s.th_acceptnegstep * dVexp)
                    return finite & (accept_pos | accept_neg)
                dVexp = alpha * (dg + 0.5 * alpha * dq)
                return finite & (dVexp >= 0.0) & (
                    (dg < s.th_grad) | (~feasible) | (dV > s.th_acceptstep * dVexp))

            def ls_pred(i, accepted):
                return (~accepted) & (i < s.n_alphas)

            def ls_cond(c):
                i, accepted = c[0], c[1]
                return jnp.any(ls_pred(i, accepted))

            def ls_body(c):
                i, accepted, xs_b, us_b, cost_b, alpha_b = c
                pred = ls_pred(i, accepted)
                alpha_ks = [jnp.take(alphas, jnp.clip(i + k, 0, s.n_alphas - 1))
                            for k in range(ls_trials)]
                # per-knot boxes are baked into the rollout kernel (SMEM
                # tables); only the shared runtime box rides lane inputs
                roll_box = (lb_l, ub_l) if boxed and not box_pk else ()
                outs = rolln(
                    st.xs, st.us, bw.k, bw.K, x0_l,
                    *[a[None, :] for a in alpha_ks],
                    bw_fs, infeas_f[None, :] if use_gaps else zeros_1B, wterm_l,
                    *roll_box)
                # trial k>0 only counts for a genuinely new alpha (at the
                # ladder's end the later trials re-evaluate the last
                # alpha; dedupe keeps iteration counts identical to the
                # one-trial loop)
                acc = []
                for k in range(ls_trials):
                    a_k = ls_accept(alpha_ks[k], outs[3 * k], outs[3 * k + 2])
                    if k:
                        a_k = a_k & (i + k < s.n_alphas)
                    acc.append(a_k)
                accept = acc[0]
                for a_k in acc[1:]:
                    accept = accept | a_k
                take = accept & pred
                # first accepting trial wins: fold from the last backwards
                last = ls_trials - 1
                xs_t, us_t = outs[3 * last], outs[3 * last + 1]
                cost_t, alpha = outs[3 * last + 2], alpha_ks[last]
                for k in range(ls_trials - 2, -1, -1):
                    xs_t = _sel(acc[k], outs[3 * k], xs_t)
                    us_t = _sel(acc[k], outs[3 * k + 1], us_t)
                    cost_t = jnp.where(acc[k], outs[3 * k + 2], cost_t)
                    alpha = jnp.where(acc[k], alpha_ks[k], alpha)
                return (
                    i + ls_trials * pred.astype(jnp.int32),
                    accepted | take,
                    _sel(take, xs_t, xs_b),
                    _sel(take, us_t, us_b),
                    jnp.where(take, cost_t, cost_b),
                    jnp.where(take, alpha, alpha_b),
                )

            ls0 = pvary_like(
                (jnp.zeros((Bp,), jnp.int32), st.done | bw_failed,
                 st.xs, st.us, cost, jnp.zeros((Bp,), dtype)), st.xs)
            if ls_first_single:
                # round 0: first alpha only, one-trajectory launch — the
                # common full-step acceptance skips trial b's wasted work
                i0, acc0, xs_b0, us_b0, cost_b0, alpha_b0 = ls0
                pred0 = ~acc0
                roll_box = (lb_l, ub_l) if boxed and not box_pk else ()
                xs_t0, us_t0, cost_t0 = roll1(
                    st.xs, st.us, bw.k, bw.K, x0_l,
                    jnp.broadcast_to(alphas[0], (1, Bp)),
                    bw_fs, infeas_f[None, :] if use_gaps else zeros_1B,
                    wterm_l, *roll_box)
                take0 = ls_accept(alphas[0], xs_t0, cost_t0) & pred0
                ls0 = pvary_like((
                    i0 + pred0.astype(jnp.int32),
                    acc0 | take0,
                    _sel(take0, xs_t0, xs_b0),
                    _sel(take0, us_t0, us_b0),
                    jnp.where(take0, cost_t0, cost_b0),
                    jnp.where(take0, jnp.broadcast_to(alphas[0], (Bp,)),
                              alpha_b0),
                ), st.xs)
            _, any_accept, xs_new, us_new, cost_new, alpha_sel = jax.lax.while_loop(
                ls_cond, ls_body, ls0)

            # -- regularization schedule / termination ---------------------
            eff_step = jnp.where(any_accept, alpha_sel, alphas[-1])
            reg_dec = jnp.maximum(reg / s.reg_factor, s.reg_min)
            # full-ladder rejections escalate by reg_reject_factor
            # (solvers/ddp.py semantics)
            inc_f = jnp.where(any_accept, s.reg_factor, s.reg_reject_factor)
            reg_inc = jnp.minimum(reg * inc_f, s.reg_max)
            do_inc = eff_step <= s.th_stepinc
            do_dec = (~do_inc) & (eff_step > s.th_stepdec)
            reg_new = jnp.where(do_inc, reg_inc, jnp.where(do_dec, reg_dec, reg))
            diverged = ((bw_failed & (reg >= s.reg_max))
                        | (do_inc & (reg_new >= s.reg_max))
                        | ~lin_ok)
            # doomed-lane early retirement (solvers/ddp.py semantics): a
            # lane rejecting the full ladder doomed_reject_iters times in
            # a row under a rising reg — or failing the backward
            # non-retryably twice — stops dragging the batch through
            # retry + ladder work and is flagged diverged now rather than
            # after the reg walk reaches reg_max
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

            it1 = st.it + 1
            done = converged | diverged | (it1 >= s.maxiter)
            # per-iteration log (vmap(solve) semantics: a lane's row i is
            # written only while it is active, so rows past its
            # termination stay NaN). All active lanes share the same row
            # index — their ``it`` equals the loop-pass count — so the
            # write is one dynamic row update per series.
            if keep_log:
                gi = jnp.max(st.it)
                def _row(series, val):
                    return series.at[gi].set(jnp.where(active, val, series[gi]))
                log = SolveLog(
                    costs=_row(st.log.costs, cost_new),
                    stops=_row(st.log.stops, bw.stop),
                    regs=_row(st.log.regs, reg_new),
                    steps=_row(st.log.steps,
                               jnp.where(any_accept, alpha_sel, 0.0)),
                    d1=_row(st.log.d1, dg),
                    d2=_row(st.log.d2, dq),
                    gap_norms=_row(st.log.gap_norms, gap_norm),
                )
            else:
                log = st.log
            # masked merge: finished lanes keep their state (vmap semantics)
            return _LaneState(
                xs=_sel(active, xs_new, st.xs),
                us=_sel(active, us_new, st.us),
                cost=jnp.where(active, cost_new, st.cost),
                stop=jnp.where(active, bw.stop, st.stop),
                reg=jnp.where(active, reg_new, st.reg),
                it=jnp.where(active, it1, st.it),
                done=jnp.where(active, done, st.done),
                converged=jnp.where(active, converged, st.converged),
                diverged=jnp.where(active, diverged, st.diverged),
                kprev=_sel(active & bw.ok, bw.k, st.kprev),
                rej_streak=jnp.where(active, rej_streak, st.rej_streak),
                nrt_streak=jnp.where(active, nrt_streak, st.nrt_streak),
                log=log,
            )

        final = jax.lax.while_loop(lambda st: jnp.any(~st.done), body, init)

        if keep_log:
            out_log = SolveLog(*[jnp.transpose(a, (1, 0))[:B]
                                 for a in final.log])
        else:
            empty = jnp.zeros((B, 0), dtype)
            out_log = SolveLog(*[empty for _ in SolveLog._fields])
        return SolveResult(
            xs=jnp.transpose(final.xs, (2, 0, 1))[:B],
            us=jnp.transpose(final.us, (2, 0, 1))[:B],
            cost=final.cost[:B], stop=final.stop[:B],
            iterations=final.it[:B], converged=final.converged[:B],
            diverged=final.diverged[:B], reg=final.reg[:B],
            log=out_log,
        )

    return jax.jit(solve_batch, static_argnames=())


def build_lane_homotopy(
    problem: ShootingProblem,
    settings: SolverSettings = SolverSettings(),
    bounds: Optional[Bounds] = None,
    nb: int = 128,
    interpret: Optional[bool] = None,
    use_gaps: bool = False,
    scales=None,
    ub_stages=None,
    keep_log: bool = False,
    rescue_scales=None,
    rescue_ub_stages=None,
    rescue_size: int = 0,
):
    """Lane-resident terminal-weight continuation (solvers/homotopy.py
    semantics): each stage runs the whole lane solver at a scaled terminal
    goal weight and warm-starts the next from its solution. The scale —
    and, with ``ub_stages`` ([n_stages, nu]), the per-stage control upper
    bound (stiffness-bound continuation) — are runtime lane inputs, so all
    stages share ONE compiled lane program; ``settings.maxiter`` is the
    per-stage budget.

    ``rescue_size`` > 0 adds a diverged-lane RESCUE pass: up to that many
    lanes the main schedule flagged diverged are gathered (argsorted
    diverged-first — all static shapes, one jitted program), re-solved
    COLD under the tighter ``rescue_scales`` / ``rescue_ub_stages``
    schedule (see solvers/homotopy.rescue_continuation), and scattered
    back wherever the rescue itself did not diverge. Lanes that were not
    diverged are never touched, so the main pass's results are
    bit-preserved; the extra compute is honestly inside the same timed
    program (~rescue_size/B x n_rescue_stages/n_stages of the main
    pass)."""
    from ..solvers.homotopy import DEFAULT_SCALES

    if scales is None:
        scales = DEFAULT_SCALES
    if ub_stages is not None and bounds is None:
        raise ValueError("ub_stages requires bounds")
    if rescue_size and rescue_scales is None:
        raise ValueError("rescue_size needs rescue_scales")
    lane = build_lane_solver(problem, settings, bounds, nb=nb,
                             interpret=interpret, use_gaps=use_gaps,
                             keep_log=keep_log)
    T = problem.T
    nu = problem.nu

    def _staged(x0s, xs0, us0, scale_arr, ub_arr):
        def stage(carry, inp):
            scale, ub = inp
            xs, us = carry
            res = lane(x0s, xs, us, wterm_scale=scale, box_ub=ub)
            return (res.xs, res.us), res

        (_, _), results = jax.lax.scan(stage, (xs0, us0), (scale_arr, ub_arr))
        return jax.tree.map(lambda a: a[-1], results)

    def _stage_arrays(n, dtype, sc, ub):
        scale_arr = jnp.asarray(list(sc), dtype=dtype)
        ub_arr = None if ub is None else jnp.asarray(ub, dtype)
        if ub_arr is not None and ub_arr.shape[0] != scale_arr.shape[0]:
            raise ValueError("ub_stages must have one row per scale")
        return scale_arr, ub_arr

    def solve_batch(x0s, xs_init=None, us_init=None):
        B = x0s.shape[0]
        dtype = x0s.dtype
        xs0 = (jnp.broadcast_to(x0s[:, None, :], (B, T + 1) + x0s.shape[1:])
               if xs_init is None else jnp.asarray(xs_init, dtype))
        us0 = (jnp.zeros((B, T, nu), dtype) if us_init is None
               else jnp.asarray(us_init, dtype))
        res = _staged(x0s, xs0, us0,
                      *_stage_arrays(B, dtype, scales, ub_stages))
        if not rescue_size:
            return res

        R = min(rescue_size, B)
        order = jnp.argsort(~res.diverged)          # diverged lanes first
        idx = order[:R]
        x0_r = x0s[idx]
        xs0_r = jnp.broadcast_to(x0_r[:, None, :], (R, T + 1) + x0_r.shape[1:])
        us0_r = jnp.zeros((R, T, nu), dtype)
        res_r = _staged(x0_r, xs0_r, us0_r,
                        *_stage_arrays(R, dtype, rescue_scales,
                                       rescue_ub_stages))
        take = res.diverged[idx] & ~res_r.diverged

        def merge(full, r):
            if full.ndim == 2 and full.shape[1] == 0:   # empty log leaves
                return full
            t = take.reshape((-1,) + (1,) * (r.ndim - 1))
            return full.at[idx].set(jnp.where(t, r, full[idx]))

        # keep_log leaves merge like any other series ([B, maxiter]); the
        # rescued lanes' logs describe the (final) rescue stage, matching
        # every other field's provenance
        return jax.tree.map(merge, res, res_r)

    return jax.jit(solve_batch)
