"""Mesh/sharding tests on the emulated 8-device CPU mesh (SURVEY §4
implication (d)): batched solves shard correctly and match unsharded runs.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from aslr_to_tpu.parallel.batch import convergence_summary, make_batched_solver, sharded_solve
from aslr_to_tpu.parallel.mesh import batch_sharding, make_batch_mesh
from aslr_to_tpu.solvers.ddp import SolverSettings
from tests.test_solver import _lqr_problem


def test_mesh_has_eight_devices():
    mesh = make_batch_mesh()
    assert mesh.devices.size == 8


def test_batched_solver_matches_single():
    prob = _lqr_problem(T=10)
    x0s = jnp.stack([jnp.array([1.0, 0.0]) * (i + 1) * 0.3 for i in range(8)])
    fn = make_batched_solver(prob, SolverSettings(maxiter=20, th_stop=1e-14))
    out = fn(x0s)
    assert out.cost.shape == (8,)
    assert np.all(np.asarray(out.converged))
    # scenario 3 solved alone gives the same answer
    from aslr_to_tpu.solvers.ddp import solve
    single = jax.jit(
        lambda p: solve(p, settings=SolverSettings(maxiter=20, th_stop=1e-14))
    )(dataclasses.replace(prob, x0=x0s[3]))
    assert np.allclose(out.us[3], single.us, atol=1e-10)


def test_sharded_solve_matches_unsharded():
    prob = _lqr_problem(T=10)
    x0s = jnp.stack([jnp.array([0.5, -0.2]) * (i - 3) for i in range(16)])
    mesh = make_batch_mesh()
    out = sharded_solve(prob, x0s, SolverSettings(maxiter=20, th_stop=1e-14), mesh=mesh)
    fn = make_batched_solver(prob, SolverSettings(maxiter=20, th_stop=1e-14))
    ref = fn(x0s)
    assert np.allclose(np.asarray(out.cost), np.asarray(ref.cost), rtol=1e-12, atol=1e-12)
    assert np.allclose(np.asarray(out.us), np.asarray(ref.us), atol=1e-10)
    summ = convergence_summary(out)
    assert summ["n"] == 16


def test_masked_divergence_isolation():
    """A pathological scenario must not poison the rest of the batch."""
    prob = _lqr_problem(T=10)
    x0s = jnp.stack([
        jnp.array([1.0, 0.0]),
        jnp.array([1e12, -1e12]),   # extreme scenario
        jnp.array([-0.3, 0.4]),
    ])
    fn = make_batched_solver(prob, SolverSettings(maxiter=20, th_stop=1e-14))
    out = fn(x0s)
    assert bool(out.converged[0]) and bool(out.converged[2])
    assert np.isfinite(np.asarray(out.cost)[[0, 2]]).all()


def test_shard_map_solve_global_stats():
    """Explicit shard_map path: per-shard solves + psum-reduced global
    stats, with the varying-manual-axes check ON (no check_vma=False)."""
    from aslr_to_tpu.parallel.spmd import shard_map_solve
    prob = _lqr_problem(T=10)
    mesh = make_batch_mesh()
    st = SolverSettings(maxiter=20, th_stop=1e-14)
    x0s = jnp.stack([jnp.array([0.5, -0.2]) * (i - 3) for i in range(16)])
    res, (n_conv, mean_cost) = shard_map_solve(prob, x0s, st, use_gaps=True, mesh=mesh)
    ref = make_batched_solver(prob, st, use_gaps=True)(x0s)
    assert np.allclose(np.asarray(res.us), np.asarray(ref.us), atol=1e-12)
    assert float(n_conv) == float(np.sum(np.asarray(ref.converged)))
    assert np.isclose(float(mean_cost), float(np.mean(np.asarray(ref.cost))), rtol=1e-5)


def test_sharded_lane_solver_bit_parity():
    """The lane-layout fast path partitioned over the mesh must match the
    unsharded lane solve bit-for-bit (VERDICT r1 #2: the production
    per-chip path is what must run at scale)."""
    from aslr_to_tpu.workloads.presets import two_dof_vsa_boxddp
    w = two_dof_vsa_boxddp(T=8)
    mesh = make_batch_mesh()
    st = SolverSettings(maxiter=4, th_stop=1e-7)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    out = sharded_solve(w.problem, x0s, st, use_gaps=False, bounds=w.bounds,
                        mesh=mesh, use_fast_path="lanes")
    ref = make_batched_solver(w.problem, st, use_gaps=False, bounds=w.bounds,
                              use_fast_path="lanes")(x0s)
    assert np.array_equal(np.asarray(out.us), np.asarray(ref.us))
    assert np.array_equal(np.asarray(out.xs), np.asarray(ref.xs))
    assert np.array_equal(np.asarray(out.iterations), np.asarray(ref.iterations))
    assert np.array_equal(np.asarray(out.converged), np.asarray(ref.converged))


def test_sharded_fused_path_fddp():
    """The fused (custom_vmap) kernels under shard_map, FDDP family."""
    from aslr_to_tpu.workloads.presets import two_dof_sea
    w = two_dof_sea(T=8)
    mesh = make_batch_mesh()
    st = SolverSettings(maxiter=4, th_stop=1e-7)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(2), (16, 8))
    out = sharded_solve(w.problem, x0s, st, use_gaps=True, bounds=None,
                        mesh=mesh, use_fast_path=True)
    ref = make_batched_solver(w.problem, st, use_gaps=True, bounds=None,
                              use_fast_path=True)(x0s)
    assert np.array_equal(np.asarray(out.us), np.asarray(ref.us))
    assert np.array_equal(np.asarray(out.cost), np.asarray(ref.cost))


def test_workload_batch_shards():
    """Sharded batch of the SEA reach workload on the CPU mesh."""
    from aslr_to_tpu.workloads.presets import two_dof_sea
    w = two_dof_sea(T=20)
    mesh = make_batch_mesh()
    key = jax.random.PRNGKey(0)
    x0s = 0.1 * jax.random.normal(key, (8, w.problem.state.nx))
    out = sharded_solve(
        w.problem, x0s, SolverSettings(maxiter=12, th_stop=1e-7), use_gaps=True, mesh=mesh)
    assert out.cost.shape == (8,)
    assert np.isfinite(np.asarray(out.cost)).all()
