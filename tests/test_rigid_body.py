"""Rigid-body dynamics kernel tests.

Mirrors the reference's derivative-verification strategy (SURVEY §4) with
stronger oracles: closed-form 2-link formulas, energy conservation, and
autodiff cross-checks, on both a 2-DoF and a 7-DoF chain (the reference
tests against ``asr_twodof`` and ``talos_arm``,
``unittest/test_asr_free_fwddyn.py:51``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aslr_to_tpu.models import robots
from aslr_to_tpu.ops import rigid_body as rbd
from aslr_to_tpu.ops.se3 import log6
from aslr_to_tpu.utils.numdiff import numdiff


@pytest.fixture(params=["double_pendulum", "asr_twodof", "seven_dof_arm"])
def robot(request):
    return robots.load(request.param)


def _rand_qva(robot, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    nv = robot.nv
    return (
        jax.random.normal(k1, (nv,)),
        jax.random.normal(k2, (nv,)),
        jax.random.normal(k3, (nv,)),
    )


def test_mass_matrix_closed_form_double_pendulum():
    m = robots.double_pendulum()
    q = jnp.array([0.3, -0.7])
    M = rbd.mass_matrix(m, q)
    m1 = m2 = 0.3
    l1 = 0.2
    lc = 0.1
    I_rod = 0.3 * 0.04 / 12
    M11 = m1 * lc**2 + I_rod + m2 * (l1**2 + lc**2 + 2 * l1 * lc * np.cos(q[1])) + I_rod
    M12 = m2 * (lc**2 + l1 * lc * np.cos(q[1])) + I_rod
    M22 = m2 * lc**2 + I_rod
    assert np.allclose(M, [[M11, M12], [M12, M22]], atol=1e-12)


def test_rnea_is_M_a_plus_nle(robot):
    q, v, a = _rand_qva(robot)
    M = rbd.mass_matrix(robot, q)
    nle = rbd.nonlinear_effects(robot, q, v)
    tau = rbd.rnea(robot, q, v, a)
    assert np.allclose(M @ a + nle, tau, atol=1e-10)


def test_mass_matrix_spd(robot):
    q, _, _ = _rand_qva(robot, seed=3)
    M = rbd.mass_matrix(robot, q)
    assert np.allclose(M, M.T, atol=1e-12)
    assert np.all(np.linalg.eigvalsh(np.asarray(M)) > 0)


def test_gravity_equilibria_double_pendulum():
    m = robots.double_pendulum()
    z = jnp.zeros(2)
    # q=0 (up) and q=[pi,0] (down) are equilibria of the symmetric pendulum
    assert np.allclose(rbd.nonlinear_effects(m, z, z), 0.0, atol=1e-12)
    assert np.allclose(rbd.nonlinear_effects(m, jnp.array([np.pi, 0.0]), z), 0.0, atol=1e-12)


def test_energy_conservation_double_pendulum():
    m = robots.double_pendulum()

    def acc(q, v):
        return jnp.linalg.solve(rbd.mass_matrix(m, q), -rbd.nonlinear_effects(m, q, v))

    def energy(q, v):
        rots, trans = rbd.forward_kinematics(m, q)
        pe = sum(m.mass[i] * 9.81 * (rots[i] @ m.com[i] + trans[i])[2] for i in range(2))
        return 0.5 * v @ rbd.mass_matrix(m, q) @ v + pe

    def step(carry, _):
        q, v = carry
        dt = 1e-4
        k1 = (v, acc(q, v))
        k2 = (v + dt / 2 * k1[1], acc(q + dt / 2 * k1[0], v + dt / 2 * k1[1]))
        k3 = (v + dt / 2 * k2[1], acc(q + dt / 2 * k2[0], v + dt / 2 * k2[1]))
        k4 = (v + dt * k3[1], acc(q + dt * k3[0], v + dt * k3[1]))
        return (
            q + dt / 6 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0]),
            v + dt / 6 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1]),
        ), None

    q0, v0 = jnp.array([0.4, 0.2]), jnp.zeros(2)
    (qf, vf), _ = jax.jit(lambda c: jax.lax.scan(step, c, None, length=2000))((q0, v0))
    assert abs(float(energy(qf, vf) - energy(q0, v0))) < 1e-10


def test_rnea_derivatives_vs_numdiff(robot):
    q, v, a = _rand_qva(robot, seed=1)
    dtau_dq, dtau_dv = rbd.rnea_derivatives(robot, q, v, a)
    fd_q = numdiff(lambda q_: rbd.rnea(robot, jnp.asarray(q_), v, a), np.asarray(q))
    fd_v = numdiff(lambda v_: rbd.rnea(robot, q, jnp.asarray(v_), a), np.asarray(v))
    assert np.allclose(dtau_dq, fd_q, atol=1e-6)
    assert np.allclose(dtau_dv, fd_v, atol=1e-6)


def test_frame_jacobian_local_vs_autodiff(robot):
    if not robot.frame_names:
        pytest.skip("no frames")
    fid = 0
    q, _, _ = _rand_qva(robot, seed=2)
    J = rbd.frame_jacobian_local(robot, q, fid)
    Mf = rbd.frame_placement(robot, q, fid)

    def local_motion(dq):
        Mf2 = rbd.frame_placement(robot, q + dq, fid)
        return log6(Mf.inverse().compose(Mf2))

    Jad = jax.jacfwd(local_motion)(jnp.zeros(robot.nv))
    assert np.allclose(J, Jad, atol=1e-10)


def test_asr_twodof_initial_ee_matches_reference_printout():
    """FK(q=0) of 'EE' must equal the reference's printed initial placement
    (examples/two_dof_sea.py:35,82)."""
    m = robots.asr_twodof()
    ee = rbd.frame_placement(m, jnp.zeros(2), m.frame_id("EE")).trans
    assert np.allclose(ee, [-0.255, 2.03063311e-04, 0.18], atol=1e-7)


def test_aba_inverts_rnea(robot):
    q, v, _ = _rand_qva(robot, seed=4)
    tau = jax.random.normal(jax.random.PRNGKey(9), (robot.nv,))
    a = rbd.aba(robot, q, v, tau)
    assert np.allclose(rbd.rnea(robot, q, v, a), tau, atol=1e-9)


def test_batched_vmap_consistency(robot):
    keys = jax.random.split(jax.random.PRNGKey(7), 8)
    qs = jax.vmap(lambda k: jax.random.normal(k, (robot.nv,)))(keys)
    Ms = jax.vmap(lambda q: rbd.mass_matrix(robot, q))(qs)
    for i in range(8):
        assert np.allclose(Ms[i], rbd.mass_matrix(robot, qs[i]), atol=1e-12)
