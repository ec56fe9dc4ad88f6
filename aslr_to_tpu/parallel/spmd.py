"""Explicit SPMD solving via shard_map + collectives.

Complement to the GSPMD path in :mod:`.batch`: the batch axis is
partitioned explicitly with ``shard_map``, each device runs the vmapped
solver on its shard, and cross-device metrics (converged counts, cost
sums) ride the ICI/DCN through ``psum`` — the pattern multi-host runs use
for global convergence reporting.

The varying-manual-axes check stays ON: solver loop carries are cast to
the batch axis with ``utils.vma.pvary_like`` instead of silencing the
check (a masked-update bug under sharding would otherwise pass silently).
One documented exception: Pallas *interpret mode* (the CPU emulation the
tests run in) cannot execute under the check — its internal grid loop
does ``dynamic_slice`` with unvarying indices on varying blocks, which
the vma rules reject — so fast-path runs on a non-TPU backend drop to
``check_vma=False``. On TPU (the production path) the check is always on;
the pallas outputs carry explicit ``vma`` annotations (utils.vma.out_structs).

``use_fast_path`` mirrors :func:`..parallel.batch.make_batched_solver`:
``True`` runs the fused Pallas kernels, ``"lanes"`` the lane-layout
end-to-end solver — each device keeps its shard lane-resident, so the
production 3000+ solves/s/chip path is what actually runs at scale.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..solvers.ddp import Bounds, SolverSettings, SolveResult
from ..solvers.problem import ShootingProblem
from .batch import make_batched_solver
from .mesh import BATCH_AXIS


def _check_vma(use_fast_path) -> bool:
    # see module docstring: interpret-mode pallas can't run under the check
    return not (use_fast_path and jax.default_backend() != "tpu")


def make_shard_map_solver(
    problem: ShootingProblem,
    settings: SolverSettings = SolverSettings(),
    use_gaps: bool = True,
    bounds: Optional[Bounds] = None,
    warm_start: bool = False,
    use_fast_path=False,
    mesh=None,
    axis: str = BATCH_AXIS,
):
    """Build ``fn(x0s) -> SolveResult`` with the batch explicitly
    partitioned over ``mesh``; each device runs the (fast-path) batched
    solver on its local shard. Pallas kernels are opaque to GSPMD's
    automatic partitioner, so this is THE way the fused/lane paths scale
    across chips. ``x0s.shape[0]`` must divide evenly by the mesh size."""
    inner = make_batched_solver(problem, settings, use_gaps=use_gaps,
                                bounds=bounds, warm_start=warm_start,
                                use_fast_path=use_fast_path)
    return jax.jit(jax.shard_map(
        inner, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
        check_vma=_check_vma(use_fast_path)))


def shard_map_solve(
    problem: ShootingProblem,
    x0s,
    settings: SolverSettings = SolverSettings(),
    use_gaps: bool = True,
    bounds: Optional[Bounds] = None,
    warm_start: bool = False,
    use_fast_path=False,
    mesh=None,
    axis: str = BATCH_AXIS,
    **solver_kwargs,
):
    """Solve a scenario batch with an explicit shard_map over ``mesh``.

    Returns ``(result, global_stats)`` where ``result`` is the gathered
    :class:`SolveResult` and ``global_stats = (n_converged, mean_cost)``
    is psum-reduced across the mesh — identical on every shard, the
    pattern multi-host runs use for global convergence reporting.
    ``solver_kwargs`` pass through to :func:`..batch.make_batched_solver`
    (globalization/scales/ub_stages for the sharded lane homotopy, etc.).
    """
    inner = make_batched_solver(problem, settings, use_gaps=use_gaps,
                                bounds=bounds, warm_start=warm_start,
                                use_fast_path=use_fast_path, **solver_kwargs)

    def shard_fn(x0_shard):
        res = inner(x0_shard)
        n_conv = jax.lax.psum(jnp.sum(res.converged.astype(jnp.float32)), axis)
        cost_sum = jax.lax.psum(jnp.sum(res.cost.astype(jnp.float32)), axis)
        total = jax.lax.psum(
            jnp.full((), x0_shard.shape[0], jnp.float32), axis)
        return res, n_conv, cost_sum / total

    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=P(axis),
        out_specs=(P(axis), P(), P()),
        check_vma=_check_vma(use_fast_path),
    ))
    res, n_conv, mean_cost = fn(jnp.asarray(x0s))
    return res, (n_conv, mean_cost)
