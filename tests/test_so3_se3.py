"""SO(3)/SE(3) primitive tests: roundtrips, Jacobians, singular points."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aslr_to_tpu.ops.se3 import SE3, exp6, jlog6, log6
from aslr_to_tpu.ops.so3 import exp3, log3, skew, unskew


def test_skew_unskew_roundtrip():
    w = jnp.array([0.3, -1.2, 0.7])
    W = skew(w)
    assert np.allclose(W, -W.T)
    assert np.allclose(unskew(W), w)


@pytest.mark.parametrize("seed", range(5))
def test_exp_log3_roundtrip(seed):
    w = jax.random.normal(jax.random.PRNGKey(seed), (3,)) * 1.2
    R = exp3(w)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.allclose(log3(R), w, atol=1e-10)


def test_log3_identity_and_small():
    assert np.allclose(log3(jnp.eye(3)), 0.0)
    w = jnp.array([1e-9, -2e-9, 5e-10])
    assert np.allclose(log3(exp3(w)), w, atol=1e-15)


def test_log3_near_pi():
    for axis in ([0.0, 0.0, 1.0], [0.6, -0.3, 0.2]):
        a = jnp.asarray(axis)
        a = a / jnp.linalg.norm(a)
        for ang in (np.pi - 1e-5, np.pi - 1e-8):
            w = a * ang
            assert np.allclose(log3(exp3(w)), w, atol=1e-6)


@pytest.mark.parametrize("seed", range(5))
def test_exp_log6_roundtrip(seed):
    xi = jax.random.normal(jax.random.PRNGKey(seed), (6,)) * 1.5
    if float(jnp.linalg.norm(xi[3:])) >= np.pi:
        # log returns the principal value; only exp(log(M)) == M holds here
        M = exp6(xi)
        M2 = exp6(log6(M))
        assert np.allclose(M.rot, M2.rot, atol=1e-9)
        assert np.allclose(M.trans, M2.trans, atol=1e-9)
    else:
        assert np.allclose(log6(exp6(xi)), xi, atol=1e-10)


def test_jlog6_identity_is_eye():
    assert np.allclose(jlog6(SE3.identity()), np.eye(6), atol=1e-12)


def test_jlog6_matches_finite_difference():
    M = exp6(jnp.array([0.1, 0.2, -0.3, 0.4, -0.2, 0.15]))
    J = jlog6(M)
    eps = 1e-7
    fd = np.zeros((6, 6))
    for i in range(6):
        e = np.zeros(6)
        e[i] = eps
        fd[:, i] = (
            np.asarray(log6(M.compose(exp6(jnp.asarray(e)))))
            - np.asarray(log6(M.compose(exp6(jnp.asarray(-e)))))
        ) / (2 * eps)
    assert np.allclose(J, fd, atol=1e-6)


def test_autodiff_safe_at_identity():
    """No NaNs in either AD mode at the theta = 0 singular point."""
    g = jax.grad(lambda t: jnp.sum(log6(exp6(t * jnp.ones(6)))))(0.0)
    assert np.isfinite(g)
    J = jax.jacfwd(lambda xi: log6(exp6(xi)))(jnp.zeros(6))
    assert np.all(np.isfinite(J))
    assert np.allclose(J, np.eye(6), atol=1e-12)


def test_se3_compose_inverse():
    M = exp6(jnp.array([0.3, -0.1, 0.2, 0.5, 0.4, -0.6]))
    I = M.compose(M.inverse())
    assert np.allclose(I.rot, np.eye(3), atol=1e-12)
    assert np.allclose(I.trans, 0.0, atol=1e-12)
