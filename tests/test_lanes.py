"""Lane-layout dynamics vs the generic rigid-body kernels."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aslr_to_tpu.models import robots
from aslr_to_tpu.ops import lanes, rigid_body as rbd
from aslr_to_tpu.ops.se3 import SE3, log6


@pytest.fixture(params=["asr_twodof", "double_pendulum", "seven_dof_arm"])
def robot(request):
    return robots.load(request.param).with_gravity([9.81, 0.0, 0.0])


def _lanes_of(arr):
    """[B, n] -> list of n [B] arrays."""
    return [arr[:, i] for i in range(arr.shape[1])]


def test_rnea_lanes_matches_generic(robot):
    rc = lanes.RobotConsts(robot)
    B = 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, v, a = (jax.random.normal(k, (B, robot.nv)) for k in ks)
    tau_l = lanes.rnea_lanes(rc, _lanes_of(q), _lanes_of(v), _lanes_of(a))
    tau_r = jax.vmap(lambda q_, v_, a_: rbd.rnea(robot, q_, v_, a_))(q, v, a)
    for i in range(robot.nv):
        assert np.allclose(tau_l[i], tau_r[:, i], atol=1e-10)


def test_mass_nle_lanes_matches_generic(robot):
    rc = lanes.RobotConsts(robot)
    B = 8
    q = jax.random.normal(jax.random.PRNGKey(1), (B, robot.nv))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, robot.nv))
    M_l, nle_l = lanes.mass_nle_lanes(rc, _lanes_of(q), _lanes_of(v))
    M_r = jax.vmap(lambda q_: rbd.mass_matrix(robot, q_))(q)
    nle_r = jax.vmap(lambda q_, v_: rbd.nonlinear_effects(robot, q_, v_))(q, v)
    for i in range(robot.nv):
        assert np.allclose(nle_l[i], nle_r[:, i], atol=1e-10)
        for j in range(robot.nv):
            assert np.allclose(M_l[i][j], M_r[:, i, j], atol=1e-10)


def test_fk_and_placement_lanes(robot):
    rc = lanes.RobotConsts(robot)
    B = 8
    q = jax.random.normal(jax.random.PRNGKey(3), (B, robot.nv))
    rots, trans = lanes.fk_lanes(rc, _lanes_of(q))
    R, p = lanes.frame_placement_lanes(rc, rots, trans, 0)
    ref = jax.vmap(lambda q_: rbd.frame_placement(robot, q_, 0).trans)(q)
    for i in range(3):
        assert np.allclose(p[i], ref[:, i], atol=1e-10)


def test_log6_lanes_matches_se3():
    from aslr_to_tpu.ops.se3 import exp6
    B = 12
    xis = jax.random.normal(jax.random.PRNGKey(4), (B, 6)) * 1.0
    Ms = jax.vmap(exp6)(xis)
    R = tuple(tuple(Ms.rot[:, i, j] for j in range(3)) for i in range(3))
    p = tuple(Ms.trans[:, i] for i in range(3))
    out = lanes.log6_lanes(R, p)
    ref = jax.vmap(log6)(Ms)
    for i in range(6):
        assert np.allclose(out[i], ref[:, i], atol=1e-8)


def test_jvp_through_rnea_lanes():
    """In-kernel derivative mechanism: jvp columns == jacfwd of generic."""
    robot = robots.load("asr_twodof").with_gravity([9.81, 0.0, 0.0])
    rc = lanes.RobotConsts(robot)
    B = 6
    q = jax.random.normal(jax.random.PRNGKey(5), (B, 2))
    v = jax.random.normal(jax.random.PRNGKey(6), (B, 2))
    a = jax.random.normal(jax.random.PRNGKey(7), (B, 2))

    def f(q_lanes):
        return lanes.rnea_lanes(rc, q_lanes, _lanes_of(v), _lanes_of(a))

    ones = jnp.ones(B)
    zeros = jnp.zeros(B)
    _, col0 = jax.jvp(f, (tuple(_lanes_of(q)),), ((ones, zeros),))
    _, col1 = jax.jvp(f, (tuple(_lanes_of(q)),), ((zeros, ones),))
    ref = jax.vmap(lambda q_, v_, a_: rbd.rnea_derivatives(robot, q_, v_, a_)[0])(q, v, a)
    for i in range(2):
        assert np.allclose(col0[i], ref[:, i, 0], atol=1e-9)
        assert np.allclose(col1[i], ref[:, i, 1], atol=1e-9)


def test_solve2():
    M = [[jnp.asarray([2.0, 3.0]), jnp.asarray([0.5, -0.2])],
         [jnp.asarray([0.5, -0.2]), jnp.asarray([1.0, 2.0])]]
    b = [jnp.asarray([1.0, -1.0]), jnp.asarray([0.3, 0.7])]
    x = lanes.solve2(M, b)
    for k in range(2):
        Mk = np.array([[M[0][0][k], M[0][1][k]], [M[1][0][k], M[1][1][k]]])
        bk = np.array([b[0][k], b[1][k]])
        xk = np.linalg.solve(Mk, bk)
        assert np.allclose([x[0][k], x[1][k]], xk, atol=1e-12)
