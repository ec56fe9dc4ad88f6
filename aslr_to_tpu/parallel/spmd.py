"""Explicit SPMD solving via shard_map + collectives.

Complement to the GSPMD path in :mod:`.batch`: the batch axis is
partitioned explicitly with ``shard_map``, each device runs the vmapped
solver on its shard, and cross-device metrics (converged counts, cost
sums) ride the ICI/DCN through ``psum`` — the pattern multi-host runs use
for global convergence reporting.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..solvers.ddp import Bounds, SolverSettings, solve
from ..solvers.problem import ShootingProblem
from .mesh import BATCH_AXIS


def shard_map_solve(
    problem: ShootingProblem,
    x0s,
    settings: SolverSettings = SolverSettings(),
    use_gaps: bool = True,
    bounds: Optional[Bounds] = None,
    mesh=None,
    axis: str = BATCH_AXIS,
):
    """Solve a scenario batch with an explicit shard_map over ``mesh``.

    Returns ``(us [B, T, nu], cost [B], converged [B], global_stats)`` where
    ``global_stats = (n_converged, mean_cost)`` is psum-reduced across the
    mesh — identical on every shard.
    """

    def one(x0):
        p = dataclasses.replace(problem, x0=x0)
        res = solve(p, settings=settings, use_gaps=use_gaps, bounds=bounds)
        return res.us, res.cost, res.converged

    def shard_fn(x0_shard):
        us, cost, conv = jax.vmap(one)(x0_shard)
        n_conv = jax.lax.psum(jnp.sum(conv.astype(jnp.float32)), axis)
        cost_sum = jax.lax.psum(jnp.sum(cost.astype(jnp.float32)), axis)
        total = jax.lax.psum(jnp.asarray(cost.shape[0], jnp.float32), axis)
        return us, cost, conv, n_conv, cost_sum / total

    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=P(axis),
            out_specs=(P(axis), P(axis), P(axis), P(), P()),
            # the solver's scan carries mix device-varying and replicated
            # values; skip the varying-manual-axes check rather than pcast
            # every constant in the loop state
            check_vma=False,
        )
    )
    us, cost, conv, n_conv, mean_cost = fn(jnp.asarray(x0s))
    return us, cost, conv, (n_conv, mean_cost)
