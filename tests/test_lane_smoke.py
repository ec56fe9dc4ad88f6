"""Fast-tier trace+run smoke of every lane-solver production program.

Round 3 shipped a half-finished kernel-signature refactor that broke every
lane-path entry point at TRACE time (pallas/vsa_kernels.py ok_ref hunk,
VERDICT r3) — and the only fast-tier coverage of ``build_linearize`` was
incidental. This suite pins the rule adopted in round 4: the flagship
path must fail the seconds-scale tier, not a 10-minute slow suite. Tiny
shapes (T=4, B=4), interpret mode, maxiter=1 — each case costs seconds;
parity is the slow tier's job (tests/test_lane_solver.py et al.), this
tier only proves the programs trace and execute.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aslr_to_tpu.pallas.lane_solver import build_lane_homotopy, build_lane_solver
from aslr_to_tpu.solvers.ddp import Bounds, SolverSettings
from aslr_to_tpu.solvers.problem import stack_knots
from aslr_to_tpu.workloads.presets import two_dof_sea, two_dof_vsa_boxddp

T = 4
SETTINGS = SolverSettings(maxiter=1, th_stop=1e-7)


def _x0s(key=0, B=4):
    return 0.05 * jax.random.normal(jax.random.PRNGKey(key), (B, 8))


def _run(problem, bounds, use_gaps):
    solve = build_lane_solver(problem, SETTINGS, bounds=bounds,
                              interpret=True, use_gaps=use_gaps)
    res = solve(_x0s())
    assert res.us.shape == (4, problem.T, problem.nu)
    assert res.xs.shape == (4, problem.T + 1, 8)
    assert bool(np.all(np.isfinite(np.asarray(res.cost))))
    assert bool(np.all(np.asarray(res.iterations) == 1))
    return res


@pytest.mark.parametrize("family", ["boxddp", "boxfddp", "ddp", "fddp"])
def test_lane_solver_smoke_all_families(family):
    if family in ("boxddp", "boxfddp"):
        w = two_dof_vsa_boxddp(T=T)
        bounds = w.bounds
    else:
        w = two_dof_sea(T=T)
        bounds = None
    _run(w.problem, bounds, use_gaps=family in ("fddp", "boxfddp"))


def test_lane_solver_smoke_per_knot():
    """Per-knot [T, nu] box + stacked knots (SMEM bound tables)."""
    w = two_dof_vsa_boxddp(T=T)
    prob = dataclasses.replace(
        w.problem,
        running=stack_knots([w.problem.running for _ in range(T)]),
        per_knot=True)
    lb = jnp.tile(jnp.asarray([-50.0, -50.0, 0.0, 0.0]), (T, 1))
    ub = jnp.tile(jnp.asarray([50.0, 50.0, 50.0, 50.0]), (T, 1))
    _run(prob, Bounds(lb=lb, ub=ub), use_gaps=False)


def test_lane_homotopy_smoke():
    """Lane-resident continuation incl. the runtime box_ub stage input."""
    w = two_dof_vsa_boxddp(T=T)
    ub_stages = jnp.asarray([[100.0, 100.0, s, s] for s in (25.0, 100.0)])
    solve = build_lane_homotopy(
        w.problem, SETTINGS, bounds=w.bounds, interpret=True,
        scales=(0.5, 1.0), ub_stages=ub_stages)
    res = solve(_x0s(1))
    assert res.us.shape == (4, T, 4)
    assert bool(np.all(np.isfinite(np.asarray(res.cost))))
