"""Workload runner: solve a preset and report the reference's metrics
(final EE placement, control effort, convergence trace).

Replaces the reference example scripts' solve-and-print logic
(``examples/two_dof_sea.py:78-93``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import rigid_body as rbd
from ..solvers.ddp import SolveResult, SolverSettings, solve
from ..utils.metrics import u_squared
from .presets import PRESETS, Workload


class WorkloadResult(NamedTuple):
    result: SolveResult
    ee_final: jnp.ndarray     # final EE translation (or zeros if no frame)
    u_sq: jnp.ndarray         # per-channel control effort, SURVEY §5


def solve_workload(w: Workload, settings: SolverSettings = None,
                   use_fast_path: str = "auto",
                   globalization: str = None,
                   verbose: bool = False) -> SolveResult:
    """Jit-compiled solve of one workload (warm start included).

    ``use_fast_path``: "auto" enables the fused kernels on TPU for
    supported problems (2-DoF SEA/VSA); True/False force it. The fused
    route is the lane-layout end-to-end solver (pallas/lane_solver.py) run
    as a batch of one — it covers all four families, homotopy, and the
    stiffness-bound continuation (the box is a runtime lane input), so
    nothing falls back silently for speed reasons.
    ``globalization``: "homotopy" ramps the terminal goal weight
    geometrically with warm-started stages (fixes the cold-start stall of
    the VSA BoxDDP workloads — see solvers/homotopy.py); the per-stage
    budget is ``maxiter // n_stages`` so the total budget is unchanged.
    ``verbose`` prints the per-iteration table (CallbackVerbose parity,
    reference ``examples/two_dof_sea.py:75``); since round 5 the lane
    solver records the log too (``keep_log`` — measured at +0.24%,
    within noise), so verbose solves stay on the fast path.
    """
    from ..solvers.homotopy import DEFAULT_SCALES, homotopy_solve, stiffness_continuation

    p = w.problem
    use_gaps = w.solver in ("fddp", "boxfddp")
    bounds = w.bounds if w.solver in ("boxddp", "boxfddp") else None

    # stiffness-bound continuation (see homotopy_solve): for VSA workloads
    # the homotopy adds a 5th full-box stage after four stages capped in the
    # explicit-Euler stability region — measured T=200 cold: cost 14683 ->
    # 6201 within the same 400-iteration budget; T=100 unchanged
    scales, ub_stages = DEFAULT_SCALES, None
    if globalization == "homotopy":
        scales, ub_stages = stiffness_continuation(p, bounds)

    if settings is None:
        maxiter = w.maxiter
        if globalization == "homotopy":
            maxiter = max(1, maxiter // len(scales))
        settings = SolverSettings(maxiter=maxiter, th_stop=w.th_stop)

    if use_fast_path == "auto":
        use_fast_path = jax.default_backend() == "tpu"

    if use_fast_path:
        from ..pallas.vsa_kernels import supports_fast_path
        ok, reason = supports_fast_path(p, bounds)
        if ok:
            from ..parallel.batch import make_batched_solver
            fn = make_batched_solver(
                p, settings, use_gaps=use_gaps, bounds=bounds,
                warm_start=w.warm_start, use_fast_path="lanes",
                globalization=globalization, scales=scales,
                ub_stages=ub_stages, keep_log=verbose)
            res = jax.tree.map(lambda a: a[0], fn(p.x0[None]))
            if verbose:
                from ..utils.verbose import print_iteration_table
                print_iteration_table(res.log, res.iterations)
            return res
        import warnings
        warnings.warn(f"fast path unavailable for this problem ({reason}); "
                      "using the generic XLA path", stacklevel=2)

    def _solve(problem):
        xs0 = jnp.broadcast_to(problem.x0, (p.T + 1,) + problem.x0.shape)
        if w.warm_start:
            us0 = problem.quasi_static(xs0[:-1])
        else:
            us0 = jnp.zeros((p.T, p.nu), dtype=problem.x0.dtype)
        if globalization == "homotopy":
            return homotopy_solve(problem, xs0, us0, settings=settings,
                                  use_gaps=use_gaps, bounds=bounds,
                                  scales=scales, ub_stages=ub_stages)
        return solve(problem, xs0, us0, settings=settings, use_gaps=use_gaps,
                     bounds=bounds)

    res = jax.jit(_solve)(p)
    if verbose:
        from ..utils.verbose import print_iteration_table
        print_iteration_table(res.log, res.iterations)
    return res


def run_workload(name_or_workload, settings: SolverSettings = None,
                 globalization: str = None, verbose: bool = False,
                 **kwargs) -> WorkloadResult:
    w = PRESETS[name_or_workload](**kwargs) if isinstance(name_or_workload, str) else name_or_workload
    res = solve_workload(w, settings, globalization=globalization, verbose=verbose)
    if w.ee_frame is not None:
        q_l = res.xs[-1][: w.problem.state.nl]
        ee = rbd.frame_placement(w.problem.state.robot, q_l, w.ee_frame).trans
    else:
        ee = jnp.zeros(3, dtype=res.xs.dtype)
    return WorkloadResult(result=res, ee_final=ee, u_sq=u_squared(res.us))
