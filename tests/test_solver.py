"""Solver tests: analytic LQR, Riccati parity, box constraints, workloads.

Goes beyond the reference's test strategy (which had no solver tests,
SURVEY §4) with: exact LQR solutions, scipy cross-checks for the boxed
case, and convergence tests on the reference workloads.
"""
import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from aslr_to_tpu.models.integrator import ActionData, ActionDerivs
from aslr_to_tpu.solvers.ddp import Bounds, SolverSettings, solve
from aslr_to_tpu.solvers.problem import ShootingProblem


class _EucState(NamedTuple):
    ndx: int

    def diff(self, x0, x1):
        return x1 - x0

    def integrate(self, x, dx):
        return x + dx


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LQRAction:
    A: jnp.ndarray
    B: jnp.ndarray
    Q: jnp.ndarray
    R: jnp.ndarray
    terminal: bool = dataclasses.field(metadata=dict(static=True), default=False)

    @property
    def state(self):
        return _EucState(self.A.shape[0])

    @property
    def nu(self):
        return self.B.shape[1]

    def calc(self, x, u):
        xnext = x if self.terminal else self.A @ x + self.B @ u
        c = 0.5 * x @ self.Q @ x + (0.0 if self.terminal else 0.5 * u @ self.R @ u)
        return ActionData(xnext=xnext, cost=c)

    def calc_with_diff(self, x, u):
        d = self.calc(x, u)
        ndx, nu = self.A.shape[0], self.nu
        if self.terminal:
            der = ActionDerivs(
                Fx=jnp.eye(ndx), Fu=jnp.zeros((ndx, nu)), Lx=self.Q @ x,
                Lu=jnp.zeros(nu), Lxx=self.Q, Lxu=jnp.zeros((ndx, nu)), Luu=jnp.zeros((nu, nu)))
        else:
            der = ActionDerivs(
                Fx=self.A, Fu=self.B, Lx=self.Q @ x, Lu=self.R @ u,
                Lxx=self.Q, Lxu=jnp.zeros((ndx, nu)), Luu=self.R)
        return d, der


def _lqr_problem(T=20):
    A = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    B = jnp.array([[0.0], [0.1]])
    Q = jnp.eye(2)
    R = jnp.eye(1) * 0.1
    run = LQRAction(A, B, Q, R)
    term = LQRAction(A, B, 10 * Q, R, terminal=True)
    return ShootingProblem(x0=jnp.array([1.0, 0.0]), running=run, terminal=term, T=T)


def _lqr_optimal_cost(prob):
    """Exact discrete Riccati recursion for the LQR problem."""
    A, B = np.asarray(prob.running.A), np.asarray(prob.running.B)
    Q, R = np.asarray(prob.running.Q), np.asarray(prob.running.R)
    P = np.asarray(prob.terminal.Q)
    for _ in range(prob.T):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ (A - B @ K)
    x0 = np.asarray(prob.x0)
    return 0.5 * x0 @ P @ x0


@pytest.mark.parametrize("use_gaps", [False, True])
def test_lqr_exact_optimum(use_gaps):
    prob = _lqr_problem()
    res = jax.jit(lambda p: solve(p, settings=SolverSettings(maxiter=20, th_stop=1e-14), use_gaps=use_gaps))(prob)
    assert bool(res.converged)
    assert int(res.iterations) <= 3
    assert np.isclose(float(res.cost), _lqr_optimal_cost(prob), rtol=1e-9)


def test_lqr_infeasible_warm_start():
    """A garbage warm start must still converge (gap handling)."""
    prob = _lqr_problem()
    xs0 = jnp.ones((21, 2)) * 3.0
    us0 = jnp.ones((20, 1)) * -2.0
    res = jax.jit(lambda p, xs, us: solve(p, xs, us, SolverSettings(maxiter=30, th_stop=1e-14)))(prob, xs0, us0)
    assert bool(res.converged)
    assert np.isclose(float(res.cost), _lqr_optimal_cost(prob), rtol=1e-9)


def test_boxed_lqr_matches_scipy():
    prob = _lqr_problem(T=10)
    bounds = Bounds(lb=jnp.array([-0.6]), ub=jnp.array([0.6]))
    res = jax.jit(lambda p: solve(
        p, settings=SolverSettings(maxiter=100, th_stop=1e-20), use_gaps=False, bounds=bounds))(prob)
    # reference: direct bounded optimization over the control sequence
    A, B = np.asarray(prob.running.A), np.asarray(prob.running.B)
    Q, R = np.asarray(prob.running.Q), np.asarray(prob.running.R)
    QT = np.asarray(prob.terminal.Q)

    def total(us):
        us = us.reshape(10, 1)
        x = np.asarray(prob.x0)
        c = 0.0
        for t in range(10):
            c += 0.5 * x @ Q @ x + 0.5 * us[t] @ R @ us[t]
            x = A @ x + B @ us[t]
        return c + 0.5 * x @ QT @ x

    ref = minimize(total, np.zeros(10), bounds=[(-0.6, 0.6)] * 10,
                   method="L-BFGS-B", options=dict(ftol=1e-18, gtol=1e-14, maxiter=2000))
    assert float(res.cost) <= ref.fun + 1e-6
    assert np.allclose(np.asarray(res.us).ravel(), ref.x, atol=1e-4)
    # bounds actually active somewhere
    assert np.any(np.abs(np.asarray(res.us)) > 0.599)


def test_solver_is_vmappable():
    """Batched solves over different x0 equal the sequential ones — the
    scenario-parallel axis (SURVEY §2.3)."""
    prob = _lqr_problem(T=10)
    x0s = jnp.stack([jnp.array([1.0, 0.0]), jnp.array([-0.5, 0.3]), jnp.array([0.2, -0.7])])

    def solve_one(x0):
        p = dataclasses.replace(prob, x0=x0)
        return solve(p, settings=SolverSettings(maxiter=20, th_stop=1e-14))

    batched = jax.jit(jax.vmap(solve_one))(x0s)
    for i in range(3):
        single = jax.jit(solve_one)(x0s[i])
        assert np.allclose(batched.cost[i], single.cost, rtol=1e-12)
        assert np.allclose(batched.us[i], single.us, atol=1e-10)
        assert bool(batched.converged[i])


# ---------------------------------------------------------------------------
# reference workloads
# ---------------------------------------------------------------------------

def test_two_dof_sea_converges():
    from aslr_to_tpu.workloads.run import run_workload
    out = run_workload("two_dof_sea")
    r = out.result
    assert bool(r.converged)
    assert float(r.stop) < 1e-7
    # converges to the reachable optimum of the 6-D placement task
    assert np.allclose(np.asarray(out.ee_final), [-0.053, 0.110, 0.18], atol=2e-2)
    assert float(r.cost) < 70.0


def test_double_pendulum_descends():
    from aslr_to_tpu.workloads.run import run_workload
    out = run_workload("double_pendulum")
    r = out.result
    costs = np.asarray(r.log.costs)
    it = int(r.iterations)
    assert costs[it - 1] < 0.7 * costs[0]
    assert not bool(r.diverged)


def test_vsa_boxddp_descends_and_respects_bounds():
    from aslr_to_tpu.workloads.run import run_workload
    from aslr_to_tpu.workloads.presets import two_dof_vsa_boxddp
    w = two_dof_vsa_boxddp(T=60)
    out = run_workload(w)
    r = out.result
    us = np.asarray(r.us)
    assert us[:, 2:].min() >= -1e-12          # stiffness nonnegative
    assert np.abs(us).max() <= 100.0 + 1e-9
    costs = np.asarray(r.log.costs)
    assert float(r.cost) < 0.7 * costs[0]


def test_seven_dof_sea_generic_path_descends():
    """7-DoF SEA reach (the reference's talos_arm generality,
    unittest/test_asr_free_fwddyn.py:51) solves on the generic path; since
    round 5 the dimension-generic lane kernels also ACCEPT it (parity is
    pinned at 3-DoF where interpret-mode compiles stay fast,
    tests/test_lane_solver.py; hardware numbers: scripts/bench_7dof.py)."""
    from aslr_to_tpu.parallel.batch import make_batched_solver
    from aslr_to_tpu.pallas.vsa_kernels import extract_vsa_spec, supports_fast_path
    from aslr_to_tpu.workloads.presets import seven_dof_sea

    w = seven_dof_sea(T=10)
    ok, reason = supports_fast_path(w.problem, w.bounds)
    assert ok, reason
    spec = extract_vsa_spec(w.problem, w.bounds)
    assert (spec.nl, spec.ndx, spec.nu) == (7, 28, 7)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(3), (2, w.problem.state.nx))
    out = make_batched_solver(
        w.problem, SolverSettings(maxiter=8, th_stop=1e-7),
        use_gaps=True, warm_start=True, keep_log=True)(x0s)
    assert bool(np.all(np.isfinite(np.asarray(out.cost))))
    assert not bool(np.any(np.asarray(out.diverged)))
    costs0 = np.asarray(out.log.costs)[:, 0]
    assert np.all(np.asarray(out.cost) < 0.9 * costs0)


def test_doomed_retirement_generic():
    """Early retirement (SolverSettings.doomed_reject_iters): a scenario
    rejecting the full alpha ladder N consecutive iterations under a
    rising reg is flagged diverged immediately instead of walking reg to
    reg_max. Off (0) and never-firing (100) settings are bit-identical;
    with the cap on, untriggered scenarios are untouched and triggered
    ones retire strictly earlier."""
    import dataclasses

    from aslr_to_tpu.workloads.presets import two_dof_vsa_boxddp

    w = two_dof_vsa_boxddp(T=12)
    x0s = 1.2 * jax.random.normal(jax.random.PRNGKey(2), (6, 8))

    def run(cap):
        st = SolverSettings(maxiter=10, th_stop=1e-7, doomed_reject_iters=cap)

        def one(x0):
            p = dataclasses.replace(w.problem, x0=x0)
            return solve(p, settings=st, use_gaps=False, bounds=w.bounds)

        return jax.jit(jax.vmap(one))(x0s)

    off, never, capped = run(0), run(100), run(3)
    for name in off._fields:
        va, vb = jax.tree.leaves(getattr(off, name)), jax.tree.leaves(getattr(never, name))
        for a, b in zip(va, vb):
            assert np.array_equal(np.asarray(a), np.asarray(b), equal_nan=True), name

    it_off = np.asarray(off.iterations)
    it_cap = np.asarray(capped.iterations)
    retired = np.asarray(capped.diverged) & ~np.asarray(off.diverged)
    assert bool(np.any(retired)), "fixture no longer triggers retirement"
    assert np.all(it_cap[retired] < it_off[retired])
    untouched = ~retired
    assert np.allclose(np.asarray(off.cost)[untouched],
                       np.asarray(capped.cost)[untouched], rtol=0, atol=0)
    assert np.array_equal(it_off[untouched], it_cap[untouched])
