"""Fused VSA fast-path kernels vs the generic XLA solver (interpret mode)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from aslr_to_tpu.parallel.batch import make_batched_solver
from aslr_to_tpu.pallas.vsa_kernels import build_linearize, build_rollout, extract_vsa_spec
from aslr_to_tpu.solvers import ddp as D
from aslr_to_tpu.solvers.ddp import SolverSettings
from aslr_to_tpu.workloads.presets import two_dof_vsa_boxddp, two_dof_vsa_modified


def _data(T=10, B=4):
    w = two_dof_vsa_boxddp(T=T)
    xs = 0.2 * jax.random.normal(jax.random.PRNGKey(0), (B, T + 1, 8))
    us = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 4)) + jnp.array([0.0, 0.0, 0.5, 0.5])
    return w, xs, us


def test_linearize_kernel_matches_generic():
    w, xs, us = _data()
    spec = extract_vsa_spec(w.problem, w.bounds)
    lin = build_linearize(spec, 10, interpret=True)
    cost, run, term, xnext = lin(xs, us)
    costs_r, run_r, term_r, xnext_r = jax.vmap(
        lambda a, b: D._linearize_core(w.problem, a, b))(xs, us)
    assert np.allclose(cost, costs_r, atol=1e-9)
    for name in ("Fx", "Fu", "Lx", "Lu", "Lxx", "Lxu", "Luu"):
        assert np.allclose(run[name], getattr(run_r, name), atol=1e-9), name
    assert np.allclose(term["Lx"], term_r.Lx, atol=1e-8)
    assert np.allclose(term["Lxx"], term_r.Lxx, atol=1e-8)
    assert np.allclose(xnext, xnext_r, atol=1e-10)


def test_linearize_kernel_modified_preset():
    """Stiffness-cost variant (linear Lu term) also matches."""
    w = two_dof_vsa_modified(T=8)
    spec = extract_vsa_spec(w.problem, w.bounds)
    B = 3
    xs = 0.2 * jax.random.normal(jax.random.PRNGKey(2), (B, 9, 8))
    us = 0.2 * jax.random.normal(jax.random.PRNGKey(3), (B, 8, 4)) + jnp.array([0.0, 0.0, 0.5, 0.5])
    lin = build_linearize(spec, 8, interpret=True)
    cost, run, term, xnext = lin(xs, us)
    costs_r, run_r, _, _ = jax.vmap(lambda a, b: D._linearize_core(w.problem, a, b))(xs, us)
    assert np.allclose(cost, costs_r, atol=1e-9)
    assert np.allclose(run["Lu"], run_r.Lu, atol=1e-10)


def test_rollout_kernel_matches_generic():
    w, xs, us = _data()
    spec = extract_vsa_spec(w.problem, w.bounds)
    roll = build_rollout(spec, 10, interpret=True)
    B = 4
    k = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (B, 10, 4))
    K = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (B, 10, 4, 8))
    x0 = 0.05 * jax.random.normal(jax.random.PRNGKey(4), (B, 8))
    alpha = jnp.array([1.0, 0.5, 0.25, 1.0])
    fs = jnp.zeros((B, 11, 8))
    infeas = jnp.zeros(B, dtype=bool)
    xs_t, us_t, c_t = roll(xs, us, k, K, x0, alpha, fs, infeas)

    def ref(xs1, us1, k1, K1, x01, a1):
        pp = dataclasses.replace(w.problem, x0=x01)
        fs1 = jnp.zeros((11, 8))
        return D._rollout(pp, xs1, us1, k1, K1, fs1, a1, jnp.asarray(False), False, w.bounds)

    xs_r, us_r, c_r = jax.vmap(ref)(xs, us, k, K, x0, alpha)
    assert np.allclose(xs_t, xs_r, atol=1e-9)
    assert np.allclose(us_t, us_r, atol=1e-10)
    assert np.allclose(c_t, c_r, rtol=1e-8)


def test_full_solve_fast_path_matches_reference():
    w = two_dof_vsa_boxddp(T=12)
    B = 4
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (B, 8))
    ref = make_batched_solver(
        w.problem, SolverSettings(maxiter=6, th_stop=1e-7),
        use_gaps=False, bounds=w.bounds)(x0s)
    fast = make_batched_solver(
        w.problem, SolverSettings(maxiter=6, th_stop=1e-7, use_pallas_backward=True),
        use_gaps=False, bounds=w.bounds, use_fast_path=True)(x0s)
    assert np.allclose(ref.cost, fast.cost, rtol=1e-8)
    assert np.allclose(ref.us, fast.us, atol=1e-8)
    assert np.all(np.asarray(ref.iterations) == np.asarray(fast.iterations))


def test_sea_fddp_fast_path_matches_reference():
    """FDDP (gap-aware) fast path on the SEA arm: fused backward + gap-
    contracting rollout + SEA linearize kernels vs the XLA reference."""
    from aslr_to_tpu.workloads.presets import two_dof_sea

    w = two_dof_sea(T=12)
    B = 4
    x0s = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, 8))
    ref = make_batched_solver(
        w.problem, SolverSettings(maxiter=8, th_stop=1e-9), use_gaps=True)(x0s)
    fast = make_batched_solver(
        w.problem, SolverSettings(maxiter=8, th_stop=1e-9, use_pallas_backward=True),
        use_gaps=True, use_fast_path=True)(x0s)
    assert np.allclose(ref.cost, fast.cost, rtol=1e-8)
    assert np.allclose(ref.us, fast.us, atol=1e-8)
    assert np.all(np.asarray(ref.iterations) == np.asarray(fast.iterations))
