"""Per-knot problems on the LANE path vs the generic reference.

The reference attaches parameters per action-model instance
(``two_dof_vsa_boxddp.py:59-60``); round 2 covered that generality only on
the generic XLA path. These tests pin the lane solver's per-knot support —
time-varying frame targets (SMEM target tables) and [T, nu] control boxes
(SMEM bound tables) — bit-checked against ``vmap(solve)`` in f64
interpret mode, same bar as tests/test_lane_solver.py.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aslr_to_tpu.ops.se3 import SE3
from aslr_to_tpu.parallel.batch import make_batched_solver
from aslr_to_tpu.solvers.ddp import Bounds, SolverSettings
from aslr_to_tpu.solvers.problem import stack_knots
from aslr_to_tpu.workloads.presets import two_dof_sea, two_dof_vsa_boxddp


def _with_moving_target(problem, target_at):
    """Stack T copies of the running model with the frame target swept by
    ``target_at(t)`` (the examples/mpc_tracking.py construction)."""
    base = problem.running

    def with_target(t):
        diff = base.differential
        items = []
        for it in diff.costs.items:
            c = it.cost
            if hasattr(c, "residual") and hasattr(c.residual, "placement"):
                res = dataclasses.replace(
                    c.residual,
                    placement=SE3(c.residual.placement.rot, target_at(t)))
                c = dataclasses.replace(c, residual=res)
            items.append(dataclasses.replace(it, cost=c))
        costs = dataclasses.replace(diff.costs, items=tuple(items))
        return dataclasses.replace(
            base, differential=dataclasses.replace(diff, costs=costs))

    running = stack_knots([with_target(t) for t in range(problem.T)])
    return dataclasses.replace(problem, running=running, per_knot=True)


def _stack_identical(problem):
    running = stack_knots([problem.running for _ in range(problem.T)])
    return dataclasses.replace(problem, running=running, per_knot=True)


def _check(ref, lane, atol=1e-8):
    assert np.allclose(ref.cost, lane.cost, rtol=1e-8)
    assert np.allclose(ref.us, lane.us, atol=atol)
    assert np.allclose(ref.xs, lane.xs, atol=atol)
    assert np.all(np.asarray(ref.iterations) == np.asarray(lane.iterations))
    assert np.all(np.asarray(ref.converged) == np.asarray(lane.converged))
    assert np.all(np.asarray(ref.diverged) == np.asarray(lane.diverged))
    assert np.allclose(ref.stop, lane.stop, rtol=1e-6)


def test_lane_per_knot_target_sea_matches_reference():
    """Per-knot moving frame target (MPC tracking) on the FDDP lane path."""
    T = 12
    w = two_dof_sea(T=T)

    def target_at(t):
        return jnp.asarray([0.01, 0.05 + 0.15 * t / T, 0.18])

    prob = _with_moving_target(w.problem, target_at)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(11), (4, 8))
    st = SolverSettings(maxiter=6, th_stop=1e-7)
    ref = make_batched_solver(prob, st, use_gaps=True, bounds=None)(x0s)
    lane = make_batched_solver(prob, st, use_gaps=True, bounds=None,
                               use_fast_path="lanes")(x0s)
    assert not np.all(np.asarray(ref.diverged))
    _check(ref, lane)


def test_lane_per_knot_box_matches_reference():
    """[T, nu] control boxes on the BoxDDP lane path (SMEM bound tables);
    one knot's box pinched hard enough to clamp."""
    T = 10
    w = two_dof_vsa_boxddp(T=T)
    prob = _stack_identical(w.problem)
    lb = jnp.tile(jnp.asarray([-2.0, -2.0, 0.0, 0.0]), (T, 1))
    ub = jnp.tile(jnp.asarray([2.0, 2.0, 3.0, 3.0]), (T, 1))
    # pinch the middle knot's torque box so its QP genuinely clamps
    ub = ub.at[T // 2, :2].set(0.05)
    lb = lb.at[T // 2, :2].set(-0.05)
    bounds = Bounds(lb=lb, ub=ub)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(12), (4, 8))
    st = SolverSettings(maxiter=6, th_stop=1e-7)
    ref = make_batched_solver(prob, st, use_gaps=False, bounds=bounds)(x0s)
    lane = make_batched_solver(prob, st, use_gaps=False, bounds=bounds,
                               use_fast_path="lanes")(x0s)
    # the pinched knot must actually clamp for this test to mean anything
    assert np.any(np.abs(np.asarray(lane.us)[:, T // 2, :2]) >= 0.05 - 1e-12)
    _check(ref, lane)


def test_lane_per_knot_boxfddp_matches_reference():
    """Per-knot box + gaps (BoxFDDP lane kernel with SMEM bound tables)."""
    T = 10
    w = two_dof_vsa_boxddp(T=T)
    prob = _stack_identical(w.problem)
    lb = jnp.tile(jnp.asarray([-2.0, -2.0, 0.0, 0.0]), (T, 1))
    ub = jnp.tile(jnp.asarray([2.0, 2.0, 3.0, 3.0]), (T, 1))
    ub = ub.at[2:5, 2:].set(1.5)
    bounds = Bounds(lb=lb, ub=ub)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(13), (4, 8))
    st = SolverSettings(maxiter=5, th_stop=1e-7)
    ref = make_batched_solver(prob, st, use_gaps=True, bounds=bounds)(x0s)
    lane = make_batched_solver(prob, st, use_gaps=True, bounds=bounds,
                               use_fast_path="lanes")(x0s)
    _check(ref, lane)


def test_lane_per_knot_target_and_box_combined():
    """Moving target AND per-knot box together (both SMEM tables live)."""
    T = 10
    w = two_dof_vsa_boxddp(T=T)

    def target_at(t):
        return jnp.asarray([0.01, 0.05 + 0.1 * t / T, 0.18])

    prob = _with_moving_target(w.problem, target_at)
    lb = jnp.tile(jnp.asarray([-2.0, -2.0, 0.0, 0.0]), (T, 1))
    ub = jnp.tile(jnp.asarray([2.0, 2.0, 3.0, 3.0]), (T, 1))
    bounds = Bounds(lb=lb, ub=ub)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(14), (4, 8))
    st = SolverSettings(maxiter=5, th_stop=1e-7)
    ref = make_batched_solver(prob, st, use_gaps=False, bounds=bounds)(x0s)
    lane = make_batched_solver(prob, st, use_gaps=False, bounds=bounds,
                               use_fast_path="lanes")(x0s)
    # atol: the two paths' goal-Jacobian formulations differ by ~1e-11 on
    # the terminal Lx (weight 1e4); this problem's reg=1e-9 QP amplifies
    # that to ~1e-7 on near-zero torque entries in ONE iteration (verified:
    # the backwards match to 3e-14 on identical linearizations, and cost
    # agrees to 1e-14 relative). Inherent formulation roundoff, not drift.
    _check(ref, lane, atol=1e-6)


def test_per_knot_varying_weight_rejected():
    """Only the frame target and the box may vary per knot; a varying cost
    weight must fall back to the generic path with a named reason."""
    from aslr_to_tpu.pallas.vsa_kernels import supports_fast_path

    T = 8
    w = two_dof_sea(T=T)
    base = w.problem.running

    def with_weight(t):
        diff = base.differential
        items = tuple(dataclasses.replace(it, weight=it.weight * (1.0 + 0.1 * t))
                      for it in diff.costs.items)
        costs = dataclasses.replace(diff.costs, items=items)
        return dataclasses.replace(
            base, differential=dataclasses.replace(diff, costs=costs))

    running = stack_knots([with_weight(t) for t in range(T)])
    prob = dataclasses.replace(w.problem, running=running, per_knot=True)
    ok, reason = supports_fast_path(prob, None)
    assert not ok
    assert "knot-constant" in reason


def test_per_knot_box_ub_continuation_rejected():
    """The runtime bound continuation requires a shared box."""
    T = 8
    w = two_dof_vsa_boxddp(T=T)
    prob = _stack_identical(w.problem)
    bounds = Bounds(lb=jnp.tile(w.bounds.lb, (T, 1)),
                    ub=jnp.tile(w.bounds.ub, (T, 1)))
    from aslr_to_tpu.pallas.lane_solver import build_lane_homotopy
    from aslr_to_tpu.solvers.homotopy import DEFAULT_SCALES

    with pytest.raises(ValueError, match="shared"):
        build_lane_homotopy(prob, SolverSettings(maxiter=2), bounds,
                            ub_stages=jnp.tile(w.bounds.ub,
                                               (len(DEFAULT_SCALES), 1)))(
            jnp.zeros((2, 8)))
