"""BoxQP active-set warm start (SolverSettings.boxqp_warm_iters).

The projected-Newton QP at each knot is warm-started from the previous
solver iteration's du at that knot; the active set barely changes between
consecutive solver iterations, so 2-3 warm iterations reproduce the
6-iteration cold solution. Two bars:

- bit parity: lane solver vs vmap(solve) with IDENTICAL warm settings
  (the same bar as tests/test_lane_solver.py);
- quality: warm-started short QPs converge the solver to the same
  solutions as the cold 6-iteration reference.
"""
import jax
import jax.numpy as jnp
import numpy as np

from aslr_to_tpu.parallel.batch import make_batched_solver
from aslr_to_tpu.solvers.ddp import SolverSettings
from aslr_to_tpu.workloads.presets import two_dof_vsa_boxddp


def _check(ref, lane, atol=1e-8):
    assert np.allclose(ref.cost, lane.cost, rtol=1e-8)
    assert np.allclose(ref.us, lane.us, atol=atol)
    assert np.allclose(ref.xs, lane.xs, atol=atol)
    assert np.all(np.asarray(ref.iterations) == np.asarray(lane.iterations))
    assert np.all(np.asarray(ref.converged) == np.asarray(lane.converged))
    assert np.all(np.asarray(ref.diverged) == np.asarray(lane.diverged))


def test_warm_lane_matches_generic_boxddp():
    """Lane vs generic with warm start on both: bit parity holds because
    both paths run the same warm-started QP schedule."""
    w = two_dof_vsa_boxddp(T=12)
    st = SolverSettings(maxiter=6, th_stop=1e-7, boxqp_warm_iters=2)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    ref = make_batched_solver(w.problem, st, use_gaps=False, bounds=w.bounds)(x0s)
    lane = make_batched_solver(w.problem, st, use_gaps=False, bounds=w.bounds,
                               use_fast_path="lanes")(x0s)
    _check(ref, lane)


def test_warm_lane_matches_generic_boxfddp():
    from aslr_to_tpu.solvers.ddp import Bounds

    w = two_dof_vsa_boxddp(T=10)
    bounds = Bounds(lb=jnp.array([-2.0, -2.0, 0.0, 0.0]),
                    ub=jnp.array([2.0, 2.0, 3.0, 3.0]))
    st = SolverSettings(maxiter=5, th_stop=1e-7, boxqp_warm_iters=2)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(9), (4, 8))
    ref = make_batched_solver(w.problem, st, use_gaps=True, bounds=bounds)(x0s)
    lane = make_batched_solver(w.problem, st, use_gaps=True, bounds=bounds,
                               use_fast_path="lanes")(x0s)
    # atol: a warm-started truncated QP carries the two paths' ~1e-13
    # formulation roundoff in its iterate instead of contracting it away
    # (cold starts reset x0 every iteration), so the gap grows with
    # iterations (measured: 6e-14 after 1, 1e-7 after 5) while the
    # schedule stays identical (iterations/cost match).
    _check(ref, lane, atol=1e-6)


def test_warm_matches_cold_quality():
    """warm-2 must reach the cold-6 solutions on instances the reference
    converges: a bounded LQR whose optimal controls genuinely clamp."""
    import dataclasses

    from aslr_to_tpu.solvers.ddp import Bounds
    from tests.test_solver import _lqr_problem

    prob = _lqr_problem(T=10)
    bounds = Bounds(lb=jnp.array([-0.6]), ub=jnp.array([0.6]))
    x0s = jnp.stack([jnp.array([1.0, 0.0]), jnp.array([-0.5, 0.3]),
                     jnp.array([0.2, -0.7]), jnp.array([2.0, 1.0])])
    # NOTE: genuinely clamped optima never drive sum||Qu||^2 to zero (Qu
    # stays nonzero on clamped dims — same criterion as Crocoddyl), so the
    # bar is solution agreement at an equal generous budget, not the
    # converged flag.
    cold = make_batched_solver(
        prob, SolverSettings(maxiter=40, th_stop=1e-14),
        use_gaps=False, bounds=bounds)(x0s)
    warm = make_batched_solver(
        prob, SolverSettings(maxiter=40, th_stop=1e-14, boxqp_warm_iters=2),
        use_gaps=False, bounds=bounds)(x0s)
    # the x0=[2,1] scenario saturates the box — the warm path must clamp
    assert np.any(np.abs(np.asarray(warm.us)) >= 0.6 - 1e-9)
    assert np.allclose(np.asarray(warm.cost), np.asarray(cold.cost), rtol=1e-9)
    assert np.allclose(np.asarray(warm.us), np.asarray(cold.us), atol=1e-7)


def test_warm_unbounded_ignored():
    """boxqp_warm_iters without bounds must be a no-op (FDDP has no QP)."""
    from aslr_to_tpu.workloads.presets import two_dof_sea

    w = two_dof_sea(T=8)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(5), (3, 8))
    a = make_batched_solver(
        w.problem, SolverSettings(maxiter=4, th_stop=1e-7),
        use_gaps=True, bounds=None)(x0s)
    b = make_batched_solver(
        w.problem, SolverSettings(maxiter=4, th_stop=1e-7, boxqp_warm_iters=2),
        use_gaps=True, bounds=None)(x0s)
    assert np.array_equal(np.asarray(a.us), np.asarray(b.us))
