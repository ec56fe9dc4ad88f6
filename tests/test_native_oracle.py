"""JAX dynamics kernels vs the independently-written C++ oracle
(native/rbd_oracle.cpp) — the Pinocchio-as-oracle role from the
reference's tests, implemented in-tree."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aslr_to_tpu.models import robots
from aslr_to_tpu.ops import rigid_body as rbd
from aslr_to_tpu.utils import native


@pytest.fixture(params=["double_pendulum", "asr_twodof", "seven_dof_arm"])
def robot(request):
    return robots.load(request.param)


def test_rnea_matches_native(robot):
    for seed in range(3):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        q, v, a = (jax.random.normal(k, (robot.nv,)) for k in ks)
        tau_jax = np.asarray(rbd.rnea(robot, q, v, a))
        tau_cpp = native.rnea(robot, q, v, a)
        assert np.allclose(tau_jax, tau_cpp, atol=1e-10), (tau_jax, tau_cpp)


def test_mass_matrix_matches_native(robot):
    q = jax.random.normal(jax.random.PRNGKey(5), (robot.nv,))
    assert np.allclose(np.asarray(rbd.mass_matrix(robot, q)), native.mass_matrix(robot, q), atol=1e-10)


def test_fk_matches_native(robot):
    q = jax.random.normal(jax.random.PRNGKey(6), (robot.nv,))
    rots_j, trans_j = rbd.forward_kinematics(robot, q)
    rots_c, trans_c = native.fk(robot, q)
    assert np.allclose(np.asarray(rots_j), rots_c, atol=1e-12)
    assert np.allclose(np.asarray(trans_j), trans_c, atol=1e-12)


def test_nle_matches_native(robot):
    q = jax.random.normal(jax.random.PRNGKey(7), (robot.nv,))
    v = jax.random.normal(jax.random.PRNGKey(8), (robot.nv,))
    nle_j = np.asarray(rbd.nonlinear_effects(robot, q, v))
    nle_c = native.rnea(robot, q, v, np.zeros(robot.nv), gravity=True)
    assert np.allclose(nle_j, nle_c, atol=1e-10)
