"""BoxQP tests against scipy's bounded optimizer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from aslr_to_tpu.solvers.boxqp import boxqp, masked_free_solve


def _rand_qp(seed, n=4):
    rng = np.random.RandomState(seed)
    A = rng.randn(n, n)
    H = A @ A.T + 0.1 * np.eye(n)
    q = rng.randn(n)
    lb = -np.abs(rng.randn(n))
    ub = np.abs(rng.randn(n))
    return jnp.asarray(H), jnp.asarray(q), jnp.asarray(lb), jnp.asarray(ub)


@pytest.mark.parametrize("seed", range(10))
def test_boxqp_matches_scipy(seed):
    H, q, lb, ub = _rand_qp(seed)
    res = boxqp(H, q, lb, ub, jnp.zeros_like(q), maxiter=30)

    f = lambda x: 0.5 * x @ np.asarray(H) @ x + np.asarray(q) @ x
    ref = minimize(f, np.zeros(4), jac=lambda x: np.asarray(H) @ x + np.asarray(q),
                   bounds=list(zip(np.asarray(lb), np.asarray(ub))), method="L-BFGS-B",
                   options=dict(ftol=1e-16, gtol=1e-12))
    assert f(np.asarray(res.x)) <= ref.fun + 1e-8
    assert np.allclose(res.x, ref.x, atol=1e-6)


def test_boxqp_unconstrained_interior():
    H = jnp.asarray([[2.0, 0.3], [0.3, 1.0]])
    q = jnp.asarray([0.1, -0.2])
    x_star = -jnp.linalg.solve(H, q)
    res = boxqp(H, q, jnp.asarray([-10.0, -10.0]), jnp.asarray([10.0, 10.0]), jnp.zeros(2))
    assert np.allclose(res.x, x_star, atol=1e-9)
    assert np.all(np.asarray(res.free))


def test_boxqp_fully_clamped():
    H = jnp.eye(2)
    q = jnp.asarray([-10.0, -10.0])  # unconstrained optimum at +10
    res = boxqp(H, q, jnp.asarray([-1.0, -1.0]), jnp.asarray([1.0, 1.0]), jnp.zeros(2))
    assert np.allclose(res.x, [1.0, 1.0])
    assert not np.any(np.asarray(res.free))


def test_masked_free_solve():
    H = jnp.asarray([[4.0, 1.0, 0.2], [1.0, 3.0, 0.1], [0.2, 0.1, 2.0]])
    free = jnp.asarray([True, False, True])
    b = jnp.asarray([1.0, 2.0, 3.0])
    x = masked_free_solve(H, free, b)
    # clamped dim exact zero; free block solves the submatrix system
    assert x[1] == 0.0
    Hff = np.asarray(H)[np.ix_([0, 2], [0, 2])]
    xf = np.linalg.solve(Hff, [1.0, 3.0])
    assert np.allclose(np.asarray(x)[[0, 2]], xf, atol=1e-12)


def test_boxqp_vmap_batch():
    Hs, qs, lbs, ubs = [], [], [], []
    for s in range(6):
        H, q, lb, ub = _rand_qp(s)
        Hs.append(H); qs.append(q); lbs.append(lb); ubs.append(ub)
    Hs, qs, lbs, ubs = map(jnp.stack, (Hs, qs, lbs, ubs))
    batched = jax.vmap(lambda H, q, lb, ub: boxqp(H, q, lb, ub, jnp.zeros_like(q), maxiter=30))
    out = batched(Hs, qs, lbs, ubs)
    for i in range(6):
        single = boxqp(Hs[i], qs[i], lbs[i], ubs[i], jnp.zeros(4), maxiter=30)
        assert np.allclose(out.x[i], single.x, atol=1e-12)
