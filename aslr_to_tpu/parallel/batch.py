"""Batched and sharded solving — the throughput axis of the framework.

The reference solves one problem per process ("run the script many
times"); here thousands of scenarios (initial states, stiffness settings,
targets) solve per chip under one ``vmap``, and the batch shards over a
device mesh (ICI within a slice, DCN across hosts) via GSPMD. Convergence
is masked per scenario — a diverging batch entry cannot poison the others
(SURVEY §5 failure-detection plan): every scenario runs the same program
with its own done/converged flags, and results carry those flags.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..solvers.ddp import Bounds, SolverSettings, SolveResult, solve
from ..solvers.problem import ShootingProblem
from .mesh import BATCH_AXIS, batch_sharding, make_batch_mesh


def make_batched_solver(
    problem: ShootingProblem,
    settings: SolverSettings = SolverSettings(),
    use_gaps: bool = True,
    bounds: Optional[Bounds] = None,
    warm_start: bool = False,
    keep_log: bool = False,
    use_fast_path: bool = False,
    globalization: Optional[str] = None,
    scales=None,
    ub_stages=None,
    rescue_scales=None,
    rescue_ub_stages=None,
    rescue_size: int = 0,
):
    """Build ``solve_batch(x0s) -> SolveResult`` vmapped over initial states.

    ``x0s`` has shape [B, nx]; every other problem leaf is shared. The
    returned function is jit-compiled; feed it sharded ``x0s`` (see
    :func:`sharded_solve`) to scale across a mesh. ``use_fast_path``
    activates the fused Pallas kernels; the string ``"lanes"`` selects the
    lane-layout end-to-end solver (pallas/lane_solver.py — the whole loop
    stays in lane layout, zero per-iteration relayouts; covers all four
    families: DDP, FDDP, BoxDDP, BoxFDDP). ``globalization="homotopy"``
    runs the terminal-weight continuation (solvers/homotopy.py) — on the
    lane path all stages share one compiled lane program
    (pallas/lane_solver.build_lane_homotopy).
    """
    if use_fast_path == "lanes":
        from ..pallas.lane_solver import build_lane_homotopy, build_lane_solver

        if globalization == "homotopy":
            lane = build_lane_homotopy(problem, settings, bounds, use_gaps=use_gaps,
                                       scales=scales, ub_stages=ub_stages,
                                       keep_log=keep_log,
                                       rescue_scales=rescue_scales,
                                       rescue_ub_stages=rescue_ub_stages,
                                       rescue_size=rescue_size)
        else:
            lane = build_lane_solver(problem, settings, bounds, use_gaps=use_gaps,
                                     keep_log=keep_log)
        if not warm_start:
            return lane

        def solve_warm(x0s):
            # quasi-static warm start computed batch-major (cheap, once per
            # solve); the solver loop itself stays in lane layout
            xs0 = jnp.broadcast_to(x0s[:, None, :], (x0s.shape[0], problem.T + 1) + x0s.shape[1:])
            us0 = jax.vmap(lambda xs: problem.quasi_static(xs[:-1]))(xs0)
            return lane(x0s, xs0, us0)

        return jax.jit(solve_warm)

    fast = None
    if use_fast_path:
        from ..pallas.vsa_kernels import build_fast_path

        fast = build_fast_path(problem, bounds, use_gaps=use_gaps)
        if not settings.use_pallas_backward:
            # the fused linearize/rollout kernels and the fused backward
            # belong together — a scan backward would dominate the profile
            settings = dataclasses.replace(settings, use_pallas_backward=True)

    def one(x0):
        p = dataclasses.replace(problem, x0=x0)
        xs0 = jnp.broadcast_to(x0, (p.T + 1,) + x0.shape)
        if warm_start:
            us0 = p.quasi_static(xs0[:-1])
        else:
            us0 = None
        if globalization == "homotopy":
            from ..solvers.homotopy import DEFAULT_SCALES, homotopy_solve
            res = homotopy_solve(p, xs0, us0, settings=settings,
                                 use_gaps=use_gaps, bounds=bounds, fast=fast,
                                 scales=scales or DEFAULT_SCALES,
                                 ub_stages=ub_stages)
        else:
            res = solve(p, xs0, us0, settings=settings, use_gaps=use_gaps, bounds=bounds, fast=fast)
        if not keep_log:
            res = res._replace(log=jax.tree.map(lambda a: jnp.zeros((0,), a.dtype), res.log))
        return res

    return jax.jit(jax.vmap(one))


def sharded_solve(
    problem: ShootingProblem,
    x0s,
    settings: SolverSettings = SolverSettings(),
    use_gaps: bool = True,
    bounds: Optional[Bounds] = None,
    mesh=None,
    axis: str = BATCH_AXIS,
    use_fast_path=False,
    warm_start: bool = False,
    partitioner: str = "shard_map",
) -> SolveResult:
    """Solve a scenario batch sharded over a device mesh.

    The batch axis is partitioned across devices — each chip runs its
    shard of the batched solver; the scenarios are independent, so scaling
    efficiency is bounded only by batch balance.

    ``partitioner="shard_map"`` (default, all paths): each device runs
    the whole solver on its local shard — the compiled program contains
    ZERO collectives (verified by scripts/scaling.py's HLO audit), and
    Pallas fast paths work (their calls are opaque to GSPMD's automatic
    partitioner). ``partitioner="gspmd"`` (generic path only) lets XLA
    partition the global program instead; measured on the 8-device mesh it
    inserts per-while-iteration all-reduces for the global loop conditions
    AND all-gathers of the trajectory around the LAPACK triangular-solve
    custom call (not batch-partitionable) — kept for comparison, not for
    production.
    """
    mesh = mesh or make_batch_mesh()
    sharding = batch_sharding(mesh, axis)
    x0s = jax.device_put(jnp.asarray(x0s), sharding)
    if partitioner == "gspmd" and not use_fast_path:
        fn = make_batched_solver(problem, settings, use_gaps, bounds,
                                 warm_start=warm_start)
    else:
        from .spmd import make_shard_map_solver
        fn = make_shard_map_solver(problem, settings, use_gaps=use_gaps,
                                   bounds=bounds, warm_start=warm_start,
                                   use_fast_path=use_fast_path,
                                   mesh=mesh, axis=axis)
    return fn(x0s)


def convergence_summary(result: SolveResult):
    """Cross-scenario metrics pytree (host-side convenience): converged
    fraction, mean iterations, cost stats."""
    return dict(
        n=result.cost.shape[0],
        converged_frac=float(jnp.mean(result.converged.astype(jnp.float32))),
        diverged_frac=float(jnp.mean(result.diverged.astype(jnp.float32))),
        mean_iterations=float(jnp.mean(result.iterations.astype(jnp.float32))),
        median_cost=float(jnp.median(result.cost)),
        p90_cost=float(jnp.percentile(result.cost, 90.0)),
        max_cost=float(jnp.max(result.cost)),
    )
