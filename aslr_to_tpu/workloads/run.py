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
                   globalization: str = None) -> SolveResult:
    """Jit-compiled solve of one workload (warm start included).

    ``use_fast_path``: "auto" enables the fused Pallas kernels on TPU for
    supported problems (2-DoF SEA/VSA); True/False force it.
    ``globalization``: "homotopy" ramps the terminal goal weight
    geometrically with warm-started stages (fixes the cold-start stall of
    the VSA BoxDDP workloads — see solvers/homotopy.py); the per-stage
    budget is ``maxiter // n_stages`` so the total budget is unchanged.
    """
    from ..models.dynamics import DifferentialVSADynamics
    from ..solvers.homotopy import DEFAULT_SCALES, homotopy_solve

    p = w.problem
    use_gaps = w.solver in ("fddp", "boxfddp")
    bounds = w.bounds if w.solver in ("boxddp", "boxfddp") else None

    # stiffness-bound continuation (see homotopy_solve): for VSA workloads
    # the homotopy adds a 5th full-box stage after four stages capped in the
    # explicit-Euler stability region — measured T=200 cold: cost 14683 ->
    # 6201 within the same 400-iteration budget; T=100 unchanged
    scales = DEFAULT_SCALES
    ub_stages = None
    if (globalization == "homotopy" and bounds is not None
            and isinstance(p.running.differential, DifferentialVSADynamics)):
        nk = p.nu // 2
        cap = jnp.minimum(bounds.ub, jnp.concatenate([
            jnp.full((nk,), jnp.inf, bounds.ub.dtype),
            jnp.full((nk,), 3.0, bounds.ub.dtype)]))
        scales = tuple(DEFAULT_SCALES) + (1.0,)
        ub_stages = jnp.stack([cap] * (len(scales) - 1) + [bounds.ub])

    if settings is None:
        maxiter = w.maxiter
        if globalization == "homotopy":
            maxiter = max(1, maxiter // len(scales))
        settings = SolverSettings(maxiter=maxiter, th_stop=w.th_stop)

    fast = None
    if use_fast_path == "auto":
        # fused kernels for every supported problem shape on TPU — the
        # FDDP kernel set now compiles in ~30s like the BoxDDP set
        # (measured via scripts/diag_fddp_solve.py; the round-1 ~547s
        # compile no longer reproduces after the solver-loop rework)
        use_fast_path = jax.default_backend() == "tpu"
    if use_fast_path and ub_stages is not None:
        # the fused rollout kernels bake the control box as static
        # constants; the stiffness-bound continuation needs per-stage
        # boxes, and solution quality beats throughput on a single solve
        import warnings
        warnings.warn("stiffness-bound continuation uses the generic path "
                      "(fused rollouts bake the box); disabling fast path "
                      "for this solve", stacklevel=2)
        use_fast_path = False
    if use_fast_path:
        from ..pallas.vsa_kernels import build_fast_path, supports_fast_path
        ok, reason = supports_fast_path(p, bounds)
        if ok:
            fast = build_fast_path(p, bounds, use_gaps=use_gaps)
            settings = SolverSettings(**{**settings.__dict__, "use_pallas_backward": True})
        else:
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
                                  use_gaps=use_gaps, bounds=bounds, fast=fast,
                                  scales=scales, ub_stages=ub_stages)
        return solve(problem, xs0, us0, settings=settings, use_gaps=use_gaps,
                     bounds=bounds, fast=fast)

    if fast is not None:
        # the fused kernels dispatch through custom_vmap — run as a batch of 1
        import dataclasses as _dc

        batched = jax.jit(jax.vmap(lambda x0: _solve(_dc.replace(p, x0=x0))))
        res = batched(p.x0[None])
        return jax.tree.map(lambda a: a[0], res)
    return jax.jit(_solve)(p)


def run_workload(name_or_workload, settings: SolverSettings = None,
                 globalization: str = None, **kwargs) -> WorkloadResult:
    w = PRESETS[name_or_workload](**kwargs) if isinstance(name_or_workload, str) else name_or_workload
    res = solve_workload(w, settings, globalization=globalization)
    if w.ee_frame is not None:
        q_l = res.xs[-1][: w.problem.state.nl]
        ee = rbd.frame_placement(w.problem.state.robot, q_l, w.ee_frame).trans
    else:
        ee = jnp.zeros(3, dtype=res.xs.dtype)
    return WorkloadResult(result=res, ee_final=ee, u_sq=u_squared(res.us))
