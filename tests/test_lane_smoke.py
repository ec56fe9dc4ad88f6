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


def test_lane_solver_keep_log_renders_table():
    """keep_log=True records the per-iteration SolveLog on the lane path
    (CallbackLogger parity on the production program, reference
    python/aslr_to/__init__.py:17-28) and utils.verbose renders it."""
    from aslr_to_tpu.utils.verbose import format_iteration_table

    w = two_dof_vsa_boxddp(T=T)
    st = SolverSettings(maxiter=3, th_stop=1e-7)
    solve = build_lane_solver(w.problem, st, bounds=w.bounds,
                              interpret=True, use_gaps=False, keep_log=True)
    res = solve(_x0s(2))
    assert res.log.costs.shape == (4, 3)
    one = jax.tree.map(lambda a: a[0], res.log)
    table = format_iteration_table(one, iterations=res.iterations[0])
    assert table.startswith("iter")
    assert len(table.splitlines()) == 1 + int(res.iterations[0])


def test_lane_homotopy_rescue_smoke():
    """Diverged-lane rescue pass: traces+runs, never touches lanes the
    main schedule solved (bit-preserved), and keeps a genuinely hopeless
    lane (non-finite x0) flagged diverged after the rescue re-solve."""
    w = two_dof_vsa_boxddp(T=T)
    ub_stages = jnp.asarray([[100.0, 100.0, s, s] for s in (25.0, 100.0)])
    kw = dict(bounds=w.bounds, interpret=True, scales=(0.5, 1.0),
              ub_stages=ub_stages)
    x0s = _x0s(3)
    x0s = x0s.at[1, 0].set(jnp.inf)   # lane 1: hopeless (linearize NaNs)
    base = build_lane_homotopy(w.problem, SETTINGS, **kw)(x0s)
    resc = build_lane_homotopy(
        w.problem, SETTINGS, **kw,
        rescue_scales=(0.25, 0.5, 1.0),
        rescue_ub_stages=jnp.asarray(
            [[100.0, 100.0, s, s] for s in (10.0, 25.0, 100.0)]),
        rescue_size=2)(x0s)
    bdiv = np.asarray(base.diverged)
    assert bool(bdiv[1])
    assert bool(np.asarray(resc.diverged)[1])     # rescue cannot save inf
    keep = ~bdiv
    for name in ("cost", "us", "xs", "iterations", "converged"):
        a = np.asarray(getattr(base, name))[keep]
        b = np.asarray(getattr(resc, name))[keep]
        assert np.array_equal(a, b, equal_nan=True), name


def test_lane_solver_big_state_traces():
    """Dimension-generic lane path (round 5): the 3- and 7-DoF SEA lane
    programs must TRACE (eval_shape — no interpret-mode compile, which
    takes minutes at ndx=28 on CPU; run-parity is the slow tier's job
    and the hardware bench's)."""
    from aslr_to_tpu.workloads.presets import seven_dof_sea, three_dof_sea

    for preset, nx in ((three_dof_sea, 12), (seven_dof_sea, 28)):
        w = preset(T=3)
        solve = build_lane_solver(w.problem, SETTINGS, bounds=None,
                                  interpret=True, use_gaps=True)
        out = jax.eval_shape(solve, jax.ShapeDtypeStruct((4, nx), jnp.float64))
        assert out.us.shape == (4, 3, nx // 4)


def test_lane_solver_big_state_large_batch_traces():
    """ndx>8 lane batches trace at production sizes (multi-tile grids
    under the raised scoped-VMEM budget; B=1024 is the measured 7-DoF
    throughput knee, scripts/bench_7dof.py)."""
    from aslr_to_tpu.workloads.presets import three_dof_sea

    w = three_dof_sea(T=3)
    solve = build_lane_solver(w.problem, SETTINGS, bounds=None,
                              interpret=True, use_gaps=True)
    out = jax.eval_shape(solve, jax.ShapeDtypeStruct((1024, 12), jnp.float64))
    assert out.us.shape == (1024, 3, 3)
