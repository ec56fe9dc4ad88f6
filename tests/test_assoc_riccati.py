"""Associative-scan Riccati backward vs the sequential scan (f64).

The log-depth backward (solvers/assoc_riccati.py) must reproduce the
sequential recursion's gains, value functions, and expected-improvement
scalars to reassociation-level floating-point error, including nonzero
FDDP gaps and regularization — and plug into the full solver unchanged.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aslr_to_tpu.solvers import ddp as D
from aslr_to_tpu.solvers.assoc_riccati import fddp_backward_assoc


def _random_lqr(T, ndx, nu, seed, gaps=True):
    ks = jax.random.split(jax.random.PRNGKey(seed), 10)
    n = jax.random.normal
    # near-identity dynamics and SPD-ish cost blocks: the regime the
    # solver's recursion actually sees (Euler integrators, quad costs)
    Fx = jnp.eye(ndx) + 0.05 * n(ks[0], (T, ndx, ndx))
    Fu = 0.1 * n(ks[1], (T, ndx, nu))
    Lx = n(ks[2], (T, ndx))
    Lu = n(ks[3], (T, nu))
    W = 0.3 * n(ks[4], (T, ndx, ndx))
    Lxx = W @ jnp.swapaxes(W, -1, -2) + 0.5 * jnp.eye(ndx)
    Wu = 0.3 * n(ks[5], (T, nu, nu))
    Luu = Wu @ jnp.swapaxes(Wu, -1, -2) + 0.5 * jnp.eye(nu)
    Lxu = 0.05 * n(ks[6], (T, ndx, nu))
    tLx = n(ks[7], (ndx,))
    Wt = 0.3 * n(ks[8], (ndx, ndx))
    tLxx = Wt @ Wt.T + 0.5 * jnp.eye(ndx)
    fs = 0.1 * n(ks[9], (T + 1, ndx)) if gaps else jnp.zeros((T + 1, ndx))
    return Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, tLx, tLxx, fs


@pytest.mark.parametrize("T,gaps,reg", [(7, True, 1e-6), (32, True, 1e-3),
                                        (33, False, 1e-9), (100, True, 1e-6)])
def test_assoc_matches_sequential_scan(T, gaps, reg):
    args = _random_lqr(T, ndx=8, nu=4, seed=T, gaps=gaps)
    reg = jnp.asarray(reg, jnp.float64)
    seq = D._fddp_backward_scan(*args, reg)
    par = fddp_backward_assoc(*args, reg)
    names = ["k", "K", "w", "dg", "dq", "stop", "dg_gap", "dq_gap",
             "ok", "retryable"]
    for name, a, b in zip(names, seq, par):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == bool:
            assert np.array_equal(a, b), name
        else:
            assert np.allclose(a, b, rtol=1e-8, atol=1e-8), (
                name, np.max(np.abs(a - b)))


def test_assoc_full_solve_matches_sequential():
    """Full FDDP solve on the SEA arm with the associative backward:
    same iterates as the sequential backward within f64 tolerance."""
    import dataclasses

    from aslr_to_tpu.solvers.ddp import SolverSettings, solve
    from aslr_to_tpu.workloads.presets import two_dof_sea

    w = two_dof_sea(T=20)
    x0 = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (8,))
    p = dataclasses.replace(w.problem, x0=x0)
    st_seq = SolverSettings(maxiter=8, th_stop=1e-9)
    st_par = SolverSettings(maxiter=8, th_stop=1e-9, assoc_backward=True)
    a = solve(p, settings=st_seq, use_gaps=True)
    b = solve(p, settings=st_par, use_gaps=True)
    assert int(a.iterations) == int(b.iterations)
    assert np.allclose(np.asarray(a.cost), np.asarray(b.cost), rtol=1e-9)
    assert np.allclose(np.asarray(a.us), np.asarray(b.us), atol=1e-7)


def test_assoc_rejects_nothing_silently():
    """assoc_backward with bounds must raise (Box families are
    sequential-only), not silently fall back."""
    from aslr_to_tpu.solvers.ddp import Bounds, SolverSettings, solve
    from aslr_to_tpu.workloads.presets import two_dof_vsa_boxddp

    w = two_dof_vsa_boxddp(T=6)
    with pytest.raises(ValueError, match="assoc_backward"):
        solve(w.problem, settings=SolverSettings(maxiter=2, assoc_backward=True),
              use_gaps=False, bounds=w.bounds)
