"""Terminal-weight homotopy — globalization for cold-started solves.

The reference's north-star workload (``examples/two_dof_vsa_boxddp.py``,
cold start, unstable arm) stalls in a poor local solution under plain
BoxDDP — in the reference solver and in this one alike. Ramping the
terminal goal weight geometrically and warm-starting each stage from the
previous solution is a standard continuation scheme that fixes it here:
measured on the 2-DoF VSA reach (T=100, f64, same 400-iteration budget),
final cost 6984 -> 314 and EE error 0.30 -> 0.11 m vs the single cold
solve (scripts/diag_homotopy.py).

The stage weight is a pytree *leaf*, so all stages share one compiled
solver program via ``lax.scan``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .ddp import Bounds, SolveResult, SolverSettings, solve
from .problem import ShootingProblem

DEFAULT_SCALES = (1e-3, 1e-2, 1e-1, 1.0)


def scale_terminal_costs(problem: ShootingProblem, scale) -> ShootingProblem:
    """Scale every terminal cost weight by ``scale`` (a traced scalar is
    fine — weights are pytree leaves, so no recompilation across stages)."""
    term = problem.terminal
    costs = term.differential.costs
    items = tuple(dataclasses.replace(it, weight=it.weight * scale) for it in costs.items)
    return dataclasses.replace(
        problem,
        terminal=dataclasses.replace(
            term,
            differential=dataclasses.replace(
                term.differential,
                costs=dataclasses.replace(costs, items=items))))


def stiffness_continuation(problem: ShootingProblem, bounds: Optional[Bounds],
                           k_cap: float = 3.0):
    """``(scales, ub_stages)`` for the VSA stiffness-bound continuation.

    For bounded VSA problems the staged homotopy is only as good as its
    box schedule: the cold-start fragility comes from the wide stiffness
    box on explicit-Euler-unstable dynamics (docs/PARITY.md), so the first
    ``len(DEFAULT_SCALES)`` stages cap the stiffness channels at ``k_cap``
    (inside the stability region, see :func:`homotopy_solve`) and a final
    extra stage releases the reference's full box
    (``two_dof_vsa_boxddp.py:59-60``). Returns ``(DEFAULT_SCALES, None)``
    unchanged when the problem is not a bounded VSA one. Every entry point
    that runs the homotopy (workloads/run.py, bench.py,
    scripts/boxfddp_study.py) must build its stages here — measured at
    B=2048 T=100 budget 20/stage (scripts/diag_homotopy_warm.py): median
    cost 848 -> 624 (the f64 staged answer is 628) and divergence
    14.5% -> 7.2% versus the bare 4-stage schedule.
    """
    from ..models.dynamics import DifferentialVSADynamics

    if bounds is None or not isinstance(problem.running.differential,
                                        DifferentialVSADynamics):
        return tuple(DEFAULT_SCALES), None
    nk = problem.nu // 2
    cap = jnp.minimum(bounds.ub, jnp.concatenate([
        jnp.full((nk,), jnp.inf, bounds.ub.dtype),
        jnp.full((nk,), k_cap, bounds.ub.dtype)]))
    scales = tuple(DEFAULT_SCALES) + (1.0,)
    ub_stages = jnp.stack([cap] * (len(scales) - 1) + [bounds.ub])
    return scales, ub_stages


def rescue_continuation(problem: ShootingProblem, bounds: Optional[Bounds],
                        k_cap: float = 1.0):
    """``(scales, ub_stages)`` for the diverged-lane RESCUE pass.

    A tighter, longer schedule than :func:`stiffness_continuation` for the
    lanes the production schedule fails to converge (the quality metric's
    ~8% diverged tail, docs/BENCH.md): a gentler terminal-weight ramp
    (7 stages vs 5) under a harder stiffness cap (k_cap=1, well inside
    the explicit-Euler stability region — the default schedule's cap is
    3), releasing the reference's full box only in the final stage.
    Intended for a small gathered sub-batch, so the extra stages cost
    ~(R/B x 7/5) of the main pass (see
    pallas/lane_solver.build_lane_homotopy ``rescue_size``).
    """
    from ..models.dynamics import DifferentialVSADynamics

    scales = (1e-4, 1e-3, 1e-2, 5e-2, 2e-1, 1.0, 1.0)
    if bounds is None or not isinstance(problem.running.differential,
                                        DifferentialVSADynamics):
        return scales, None
    nk = problem.nu // 2
    cap = jnp.minimum(bounds.ub, jnp.concatenate([
        jnp.full((nk,), jnp.inf, bounds.ub.dtype),
        jnp.full((nk,), k_cap, bounds.ub.dtype)]))
    ub_stages = jnp.stack([cap] * (len(scales) - 1) + [bounds.ub])
    return scales, ub_stages


def homotopy_solve(
    problem: ShootingProblem,
    xs_init=None,
    us_init=None,
    settings: SolverSettings = SolverSettings(),
    use_gaps: bool = False,
    bounds: Optional[Bounds] = None,
    fast=None,
    scales: Sequence[float] = DEFAULT_SCALES,
    ub_stages=None,
) -> SolveResult:
    """Continuation solve: for each scale in ``scales`` (ascending, ending
    at 1.0) solve with the terminal costs scaled and warm-start the next
    stage from the result. ``settings.maxiter`` is the per-stage budget.

    ``ub_stages`` (optional, [n_stages, nu]) sets a per-stage control
    upper bound — the stiffness-bound continuation for the VSA workloads:
    early stages cap the stiffness channels inside the explicit-Euler
    stability region (omega*dt = sqrt(K/B)*dt <= 2, i.e. K <= 4*B/dt**2 =
    0.04 at the preset's B=1e-3, dt=1e-2 per unit inertia — empirically
    K <= 3 keeps the coupled system stable), the final stage releases the
    full box. Measured on two_dof_vsa_boxddp T=200 within the reference's
    400-iteration budget: cost 14683 (cold, diverges at iter 28) -> 5735
    (no divergence); T=100 result unchanged (313.98). Supported on the
    generic path and the lane solver (pallas/lane_solver.build_lane_homotopy
    — the box is a runtime lane input). The fused rollout kernels also take
    the box at runtime, but the legacy custom_vmap dispatch (``fast``) does
    not thread per-stage boxes through ``solve``'s Bounds closure, hence
    the guard below; production routes use the lane solver instead.

    Returns the final stage's :class:`SolveResult`. Jit/vmap like
    ``solve`` — all stages run as one ``lax.scan`` over the scale array.
    Works with the fused kernels too (terminal weight is a runtime lane
    input), except for ``ub_stages`` as noted.
    """
    T = problem.T
    x0 = problem.x0
    dtype = x0.dtype
    xs0 = (jnp.broadcast_to(x0, (T + 1,) + x0.shape).astype(dtype)
           if xs_init is None else jnp.asarray(xs_init, dtype=dtype))
    us0 = (jnp.zeros((T, problem.nu), dtype=dtype)
           if us_init is None else jnp.asarray(us_init, dtype=dtype))

    scale_arr = jnp.asarray(list(scales), dtype=dtype)
    if ub_stages is not None:
        if bounds is None:
            raise ValueError("ub_stages requires bounds")
        if fast is not None:
            raise ValueError(
                "ub_stages is not threaded through the custom_vmap fast-path "
                "dispatch; use the lane solver "
                "(pallas/lane_solver.build_lane_homotopy) or the generic path")
        ub_arr = jnp.asarray(ub_stages, dtype=dtype)
        if ub_arr.shape[0] != scale_arr.shape[0]:
            raise ValueError("ub_stages must have one row per scale")
        stage_xs = (scale_arr, ub_arr)
    else:
        stage_xs = (scale_arr, None)

    def stage(carry, inp):
        scale, ub = inp
        xs, us = carry
        p = scale_terminal_costs(problem, scale)
        b = bounds if ub is None else Bounds(lb=bounds.lb, ub=ub)
        res = solve(p, xs, us, settings=settings, use_gaps=use_gaps,
                    bounds=b, fast=fast)
        return (res.xs, res.us), res

    (_, _), results = jax.lax.scan(stage, (xs0, us0), stage_xs)
    # the last stage ran at the true terminal weight — return it
    return jax.tree.map(lambda a: a[-1], results)
