"""Per-knot heterogeneous problems (ShootingProblem.per_knot).

The reference attaches parameters per action model (e.g. per-node bounds,
``two_dof_vsa_boxddp.py:59-60``); here per-knot variation is stacked
pytree leaves + ``per_knot=True`` — the solver vmaps the model alongside
the trajectory. Covers: identical-stack equivalence, time-varying target
tracking (the MPC-tracking door), per-knot control bounds, and a real
robot model with a time-varying frame target.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from aslr_to_tpu.solvers.ddp import Bounds, SolverSettings, solve
from aslr_to_tpu.solvers.problem import ShootingProblem, stack_knots
from tests.test_solver import LQRAction, _lqr_problem

from aslr_to_tpu.models.integrator import ActionData, ActionDerivs


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrackingLQRAction:
    """LQR step with a state-tracking cost 0.5 (x-xref)' Q (x-xref)."""
    A: jnp.ndarray
    B: jnp.ndarray
    Q: jnp.ndarray
    R: jnp.ndarray
    xref: jnp.ndarray
    terminal: bool = dataclasses.field(metadata=dict(static=True), default=False)

    @property
    def state(self):
        from tests.test_solver import _EucState
        return _EucState(self.A.shape[0])

    @property
    def nu(self):
        return self.B.shape[1]

    def calc(self, x, u):
        xnext = x if self.terminal else self.A @ x + self.B @ u
        e = x - self.xref
        c = 0.5 * e @ self.Q @ e + (0.0 if self.terminal else 0.5 * u @ self.R @ u)
        return ActionData(xnext=xnext, cost=c)

    def calc_with_diff(self, x, u):
        d = self.calc(x, u)
        ndx, nu = self.A.shape[0], self.nu
        e = x - self.xref
        if self.terminal:
            der = ActionDerivs(
                Fx=jnp.eye(ndx), Fu=jnp.zeros((ndx, nu)), Lx=self.Q @ e,
                Lu=jnp.zeros(nu), Lxx=self.Q, Lxu=jnp.zeros((ndx, nu)),
                Luu=jnp.zeros((nu, nu)))
        else:
            der = ActionDerivs(
                Fx=self.A, Fu=self.B, Lx=self.Q @ e, Lu=self.R @ u,
                Lxx=self.Q, Lxu=jnp.zeros((ndx, nu)), Luu=self.R)
        return d, der


def test_identical_stack_matches_shared_model():
    """A per-knot problem whose knots are all identical must solve
    bit-for-bit like the shared-model problem."""
    prob = _lqr_problem(T=12)
    stacked = stack_knots([prob.running] * prob.T)
    prob_k = dataclasses.replace(prob, running=stacked, per_knot=True)
    st = SolverSettings(maxiter=20, th_stop=1e-14)
    ref = jax.jit(lambda: solve(prob, settings=st))()
    out = jax.jit(lambda: solve(prob_k, settings=st))()
    assert np.array_equal(np.asarray(ref.us), np.asarray(out.us))
    assert np.array_equal(np.asarray(ref.xs), np.asarray(out.xs))
    assert int(ref.iterations) == int(out.iterations)


def _tracking_problem(T=30):
    A = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    B = jnp.array([[0.0], [0.1]])
    Q = 10.0 * jnp.eye(2)
    R = jnp.eye(1) * 0.01
    # reference position ramps 0 -> 1 over the horizon
    refs = [jnp.array([t / T, 0.0]) for t in range(T + 1)]
    models = [TrackingLQRAction(A, B, Q, R, refs[t]) for t in range(T)]
    running = stack_knots(models)
    terminal = TrackingLQRAction(A, B, 100.0 * Q, R, refs[T], terminal=True)
    return ShootingProblem(x0=jnp.zeros(2), running=running,
                           terminal=terminal, T=T, per_knot=True), refs


def test_time_varying_target_tracking_converges():
    """MPC-style tracking: the solution follows the moving reference."""
    prob, refs = _tracking_problem(T=30)
    res = jax.jit(lambda: solve(
        prob, settings=SolverSettings(maxiter=30, th_stop=1e-10)))()
    assert bool(res.converged)
    xs = np.asarray(res.xs)
    # tracks the ramp: position at knot t near t/T (loose — dynamics lag)
    mid_err = abs(xs[15, 0] - 0.5)
    end_err = abs(xs[30, 0] - 1.0)
    assert end_err < 0.05, end_err
    assert mid_err < 0.2, mid_err
    # rollout/calc_cost agree with the solution
    xs2 = prob.rollout(res.us)
    assert np.allclose(np.asarray(xs2), xs, atol=1e-10)
    assert np.isclose(float(prob.calc_cost(res.xs, res.us)), float(res.cost),
                      rtol=1e-10)


def test_per_knot_bounds():
    """[T, nu] Bounds: a knot whose box pins u=0 must emit exactly 0."""
    prob = _lqr_problem(T=10)
    lb = jnp.full((10, 1), -5.0)
    ub = jnp.full((10, 1), 5.0)
    lb = lb.at[3].set(0.0)
    ub = ub.at[3].set(0.0)
    bounds = Bounds(lb=lb, ub=ub)
    res = jax.jit(lambda: solve(
        prob, settings=SolverSettings(maxiter=25, th_stop=1e-12),
        bounds=bounds))()
    us = np.asarray(res.us)
    assert us[3, 0] == 0.0
    assert np.all(us >= -5.0) and np.all(us <= 5.0)
    assert np.any(np.abs(np.delete(us, 3, axis=0)) > 1e-6)

    # per-knot box that equals a shared box solves identically
    shared = Bounds(lb=jnp.array([-5.0]), ub=jnp.array([5.0]))
    knotted = Bounds(lb=jnp.full((10, 1), -5.0), ub=jnp.full((10, 1), 5.0))
    r1 = jax.jit(lambda: solve(prob, settings=SolverSettings(maxiter=25, th_stop=1e-12),
                               bounds=shared))()
    r2 = jax.jit(lambda: solve(prob, settings=SolverSettings(maxiter=25, th_stop=1e-12),
                               bounds=knotted))()
    assert np.allclose(np.asarray(r1.us), np.asarray(r2.us), atol=1e-12)


def test_per_knot_sea_time_varying_frame_target():
    """Real model: two_dof_sea with the frame-placement target moving over
    the horizon (time-varying reach — the reference can express this by
    attaching a different cost per node)."""
    from aslr_to_tpu.ops.se3 import SE3
    from aslr_to_tpu.workloads.presets import two_dof_sea

    T = 12
    w = two_dof_sea(T=T)
    base = w.problem.running

    def with_target(t):
        # move the target's y-coordinate across knots
        tgt = jnp.asarray([0.01, 0.05 + 0.01 * t, 0.18])

        def retarget(residual):
            return dataclasses.replace(
                residual, placement=SE3(residual.placement.rot, tgt))

        diff = base.differential
        items = []
        for it in diff.costs.items:
            c = it.cost
            if hasattr(c, "residual") and hasattr(c.residual, "placement"):
                c = dataclasses.replace(c, residual=retarget(c.residual))
            items.append(dataclasses.replace(it, cost=c))
        costs = dataclasses.replace(diff.costs, items=tuple(items))
        return dataclasses.replace(
            base, differential=dataclasses.replace(diff, costs=costs))

    running = stack_knots([with_target(t) for t in range(T)])
    prob = dataclasses.replace(w.problem, running=running, per_knot=True)
    res = jax.jit(lambda: solve(
        prob, settings=SolverSettings(maxiter=10, th_stop=1e-7),
        use_gaps=True))()
    assert np.isfinite(float(res.cost))
    assert not bool(res.diverged)
    # quasi-static warm start works on the stacked model too
    xs0 = jnp.broadcast_to(prob.x0, (T + 1, 8))
    us0 = prob.quasi_static(xs0[:-1])
    assert us0.shape == (T, 2)
    assert np.all(np.isfinite(np.asarray(us0)))