"""Action-layer tests: analytic calcDiff vs autodiff + numdiff oracles.

This is the load-bearing correctness suite the reference builds around
``DifferentialActionModelNumDiff`` (``unittest/test_asr_free_fwddyn.py``,
``test_vsa_freefwddyn.py``), strengthened with exact autodiff cross-checks
(free in JAX, SURVEY §4 implication (a)).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import aslr_to_tpu as asl
from aslr_to_tpu.models import robots
from aslr_to_tpu.ops.se3 import SE3
from aslr_to_tpu.utils.numdiff import NUMDIFF_MODIFIER, numdiff


def _sea_setup(robot_name="asr_twodof", seed=0):
    robot = robots.load(robot_name).with_gravity([9.81, 0.0, 0.0])
    state = asl.StateASR(robot)
    act = asl.ASRActuation(state)
    nu = act.nu
    nl = state.nl
    target = jnp.asarray([0.01, 0.2, 0.18])
    goal = asl.CostModelResidual(
        state, asl.ActivationModelQuad(),
        asl.ResidualModelFramePlacementASR(state, 0, SE3(jnp.eye(3), target), nu))
    xreg = asl.CostModelResidual(
        state,
        asl.ActivationModelWeightedQuad(jnp.concatenate([jnp.ones(2 * nl), jnp.ones(2 * nl) * 0.5])),
        asl.ResidualModelState(state, state.zero(), nu))
    ureg = asl.CostModelResidual(state, asl.ActivationModelQuad(), asl.ResidualModelControl(state, nu))
    costs = (asl.CostModelSum(state, nu)
             .add_cost("goal", goal, 1e-1).add_cost("xReg", xreg, 1e-3).add_cost("uReg", ureg, 1e-2))
    model = asl.DifferentialSEADynamics(state, act, costs, jnp.eye(nl), 0.01 * jnp.eye(nl))
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x = state.rand(k1)
    u = jax.random.normal(k2, (nu,))
    return model, x, u


def _vsa_setup(seed=0):
    robot = robots.load("asr_twodof").with_gravity([9.81, 0.0, 0.0])
    state = asl.StateASR(robot)
    act = asl.VSAASRActuation(state)
    nu = 2 * act.nu
    target = jnp.asarray([0.01, 0.2, 0.18])
    goal = asl.CostModelResidual(
        state, asl.ActivationModelQuad(),
        asl.ResidualModelFramePlacementASR(state, 0, SE3(jnp.eye(3), target), nu))
    stiff = asl.CostModelStiffness(state, nu, lamda=jnp.asarray(10.0), Kref=jnp.zeros(nu // 2))
    costs = (asl.CostModelSum(state, nu)
             .add_cost("goal", goal, 1.0).add_cost("vsa", stiff, 1e-2))
    model = asl.DifferentialVSADynamics(state, act, costs, 1e-3 * jnp.eye(state.nl))
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x = state.rand(k1)
    u = jnp.abs(jax.random.normal(k2, (nu,))) + 0.3
    return model, x, u


@pytest.mark.parametrize("seed", range(3))
def test_sea_dynamics_derivatives_vs_autodiff(seed):
    model, x, u = _sea_setup(seed=seed)
    d = model.calc(x, u)
    dd = model.calc_diff(x, u, d)
    Fx_ad = jax.jacfwd(lambda x_: model.calc(x_, u).xout)(x)
    Fu_ad = jax.jacfwd(lambda u_: model.calc(x, u_).xout)(u)
    Lx_ad = jax.grad(lambda x_: model.calc(x_, u).cost)(x)
    Lu_ad = jax.grad(lambda u_: model.calc(x, u_).cost)(u)
    assert np.allclose(dd.Fx, Fx_ad, atol=1e-10)
    assert np.allclose(dd.Fu, Fu_ad, atol=1e-10)
    assert np.allclose(dd.costs.Lx, Lx_ad, atol=1e-10)
    assert np.allclose(dd.costs.Lu, Lu_ad, atol=1e-10)


@pytest.mark.parametrize("robot_name", ["asr_twodof", "seven_dof_arm"])
def test_sea_dynamics_derivatives_vs_numdiff(robot_name):
    """The reference's own oracle pattern: finite differences with the
    NUMDIFF_MODIFIER tolerance (unittest/test_asr_free_fwddyn.py:19-47)."""
    model, x, u = _sea_setup(robot_name)
    dd = model.calc_diff(x, u)
    fd_Fx = numdiff(lambda x_: model.calc(jnp.asarray(x_), u).xout, np.asarray(x))
    fd_Fu = numdiff(lambda u_: model.calc(x, jnp.asarray(u_)).xout, np.asarray(u))
    tol = NUMDIFF_MODIFIER * 1e-6
    assert np.max(np.abs(dd.Fx - fd_Fx)) < tol
    assert np.max(np.abs(dd.Fu - fd_Fu)) < tol


@pytest.mark.parametrize("seed", range(3))
def test_vsa_dynamics_derivatives_vs_autodiff(seed):
    model, x, u = _vsa_setup(seed=seed)
    d = model.calc(x, u)
    dd = model.calc_diff(x, u, d)
    Fx_ad = jax.jacfwd(lambda x_: model.calc(x_, u).xout)(x)
    Fu_ad = jax.jacfwd(lambda u_: model.calc(x, u_).xout)(u)
    Lu_ad = jax.grad(lambda u_: model.calc(x, u_).cost)(u)
    assert np.allclose(dd.Fx, Fx_ad, atol=1e-10)
    assert np.allclose(dd.Fu, Fu_ad, atol=1e-10)
    assert np.allclose(dd.costs.Lu, Lu_ad, atol=1e-10)


def test_integrated_action_derivatives_vs_autodiff():
    model, x, u = _sea_setup()
    ia = asl.IntegratedActionEuler(model, 1e-2)
    der = ia.calc_diff(x, u)
    Fx_ad = jax.jacfwd(lambda x_: ia.calc(x_, u).xnext)(x)
    Fu_ad = jax.jacfwd(lambda u_: ia.calc(x, u_).xnext)(u)
    assert np.allclose(der.Fx, Fx_ad, atol=1e-10)
    assert np.allclose(der.Fu, Fu_ad, atol=1e-10)


def test_terminal_model_semantics():
    model, x, u = _sea_setup()
    ia = asl.IntegratedActionEuler(model, 0.0)
    data = ia.calc(x, u)
    assert np.allclose(data.xnext, x)
    der = ia.calc_diff(x, u)
    assert np.allclose(der.Fx, np.eye(model.state.ndx))
    assert np.allclose(der.Fu, 0.0)


def test_calc_with_diff_consistency():
    model, x, u = _sea_setup()
    ia = asl.IntegratedActionEuler(model, 1e-2)
    d1 = ia.calc(x, u)
    d2 = ia.calc_diff(x, u)
    d3, d4 = ia.calc_with_diff(x, u)
    assert np.allclose(d1.xnext, d3.xnext)
    assert np.allclose(d1.cost, d3.cost)
    for a, b in zip(d2, d4):
        assert np.allclose(a, b)


def test_actuation_models():
    robot = robots.load("asr_twodof")
    state = asl.StateASR(robot)
    u = jnp.array([0.5, -0.3])
    x_m = jnp.zeros(4)
    for act in (asl.ASRActuation(state), asl.VSAASRActuation(state)):
        tau = act.calc(x_m, u)
        assert np.allclose(tau, [0.0, 0.0, 0.5, -0.3])
        dtau = act.calc_diff(x_m, u)
        ad = jax.jacfwd(lambda u_: act.calc(x_m, u_))(u)
        assert np.allclose(dtau, ad)

    pend = asl.ActuationModelDoublePendulum(state, act_link=0, nu_=2)
    tau = pend.calc(x_m, u)
    assert np.allclose(tau, [0.0, 0.0, 0.5, 0.0])
    pend1 = asl.ActuationModelDoublePendulum(state, act_link=1, nu_=2)
    assert np.allclose(pend1.calc(x_m, u), [0.0, 0.0, 0.0, -0.3])


def test_quasi_static_gravity_compensation():
    """SEA equilibrium: motor torque equals the link gravity torque
    transmitted through the spring (SURVEY §3.4 physical intent)."""
    model, _, _ = _sea_setup()
    state = model.state
    x = state.zero().at[0].set(0.4).at[1].set(-0.2)
    u_qs = model.quasi_static(x)
    from aslr_to_tpu.ops import rigid_body as rbd
    tau_g = rbd.rnea(state.robot, x[:2], jnp.zeros(2), jnp.zeros(2))
    assert np.allclose(u_qs, tau_g, atol=1e-10)


def test_stiffness_cost_derivatives():
    model, x, u = _vsa_setup()
    stiff = [it.cost for it in model.costs.items if it.name == "vsa"][0]
    kin = model.calc(x, u).kin
    c = stiff.calc(x, u, kin)
    assert np.allclose(c, np.sum(10.0 * u[2:]))
    d = stiff.calc_diff(x, u, kin)
    Lu_ad = jax.grad(lambda u_: stiff.calc(x, u_, kin))(u)
    assert np.allclose(d.Lu, Lu_ad)


def test_quadratic_barrier_activation():
    act = asl.ActivationModelQuadraticBarrier(
        asl.ActivationBounds(lb=jnp.array([-1.0, -1.0]), ub=jnp.array([1.0, 1.0])))
    r_in = jnp.array([0.5, -0.5])
    assert float(act.calc(r_in)) == 0.0
    r_out = jnp.array([1.5, -2.0])
    assert np.isclose(float(act.calc(r_out)), 0.5 * (0.25 + 1.0))
    Ar, Arr = act.calc_diff(r_out)
    Ar_ad = jax.grad(act.calc)(r_out)
    assert np.allclose(Ar, Ar_ad)


def test_state_ops():
    robot = robots.load("asr_twodof")
    state = asl.StateASR(robot)
    k = jax.random.PRNGKey(0)
    x0, x1 = state.rand(k), state.rand(jax.random.PRNGKey(1))
    assert np.allclose(state.integrate(x0, state.diff(x0, x1)), x1)
    J0, J1 = state.jintegrate(x0, state.diff(x0, x1))
    assert np.allclose(J0, np.eye(state.ndx))
    assert state.nx == 8 and state.ndx == 8 and state.nq == 4 and state.nv == 4
