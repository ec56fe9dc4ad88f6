"""Condensed-formulation tests, mirroring the reference's stale unit tests
(``unittest/test_softdyn_residual.py``, ``test_vsa_residual.py``,
``actuation_test.py``) with autodiff + numdiff oracles."""
import jax
import jax.numpy as jnp
import numpy as np

import aslr_to_tpu as asl
from aslr_to_tpu.models import robots
from aslr_to_tpu.models.condensed import (
    ASRActuationCondensed,
    QbActuationModel,
    SoftDynamicsResidualModel,
    VSADynamicsResidualModel,
)
from aslr_to_tpu.models.dynamics import DifferentialFreeFwdDynamics
from aslr_to_tpu.models.state import StateMultibody


def _rigid_setup(nu, residual_cls, **res_kwargs):
    robot = robots.load("asr_twodof")
    state = StateMultibody(robot)
    res = residual_cls(state, nu, **res_kwargs)
    feas = asl.CostModelResidual(state, asl.ActivationModelQuad(), res)
    ureg = asl.CostModelResidual(state, asl.ActivationModelQuad(),
                                 asl.ResidualModelControl(state, nu))
    costs = asl.CostModelSum(state, nu).add_cost("feas", feas, float(nu)).add_cost("uReg", ureg, 1e-2)
    return state, costs


def test_softdyn_condensed_derivatives():
    """Reference test_softdyn_residual.py: condensed SEA on a rigid state,
    K = 3 I, B = 1e-4 I, nu = 4."""
    K = 3.0 * jnp.eye(2)
    B = 1e-4 * jnp.eye(2)
    state, costs = _rigid_setup(4, SoftDynamicsResidualModel, K=K, B=B)
    # DifferentialFreeFwdDynamics applies tau = u directly; emulate the
    # condensed actuation by mapping u through it first.
    act = ASRActuationCondensed(state, 4, B)
    robot = state.robot

    import dataclasses
    from aslr_to_tpu.ops import rigid_body as rbd
    from aslr_to_tpu.models.costs import KinData
    from aslr_to_tpu.models.dynamics import DiffData, DiffDerivs

    @jax.tree_util.register_dataclass
    @dataclasses.dataclass(frozen=True)
    class CondensedModel:
        state: StateMultibody
        costs: object
        act: object

        @property
        def nu(self):
            return self.act.nu

        def calc(self, x, u):
            q, v = self.state.split(x)
            tau = self.act.calc(x, u)
            a = rbd.aba(self.state.robot, q, v, tau)
            rots, trans = rbd.forward_kinematics(self.state.robot, q)
            kin = KinData(rots=rots, trans=trans)
            return DiffData(xout=a, cost=self.costs.calc(x, u, kin), kin=kin)

    model = CondensedModel(state, costs, act)
    x = state.rand(jax.random.PRNGKey(0))
    u = jax.random.uniform(jax.random.PRNGKey(1), (4,))
    # autodiff-based oracle on the full calc (Fx, Lx, Lu)
    Lx_ad = jax.grad(lambda x_: model.calc(x_, u).cost)(x)
    Lu_ad = jax.grad(lambda u_: model.calc(x, u_).cost)(u)
    kin = model.calc(x, u).kin
    cd = costs.calc_diff(x, u, kin)
    assert np.allclose(cd.Lx, Lx_ad, atol=1e-10)
    assert np.allclose(cd.Lu, Lu_ad, atol=1e-10)


def test_vsa_condensed_residual_derivatives():
    robot = robots.load("asr_twodof")
    state = StateMultibody(robot)
    res = VSADynamicsResidualModel(state, 6)
    x = state.rand(jax.random.PRNGKey(2))
    u = jax.random.uniform(jax.random.PRNGKey(3), (6,)) + 0.1
    r = res.calc(x, u, None)
    Rx, Ru = res.calc_diff(x, u, None)
    Rx_ad = jax.jacfwd(lambda x_: res.calc(x_, u, None))(x)
    Ru_ad = jax.jacfwd(lambda u_: res.calc(x, u_, None))(u)
    assert np.allclose(Rx, Rx_ad, atol=1e-12)
    assert np.allclose(Ru, Ru_ad, atol=1e-12)
    nv = 2
    assert np.allclose(r, u[:nv] - u[2 * nv:] * (u[nv:2 * nv] - x[:nv]))


def test_softdyn_residual_with_barrier():
    """Deflection barrier at +/- pi K (reference
    test_softdyn_residual.py:24-27)."""
    robot = robots.load("asr_twodof")
    state = StateMultibody(robot)
    K = 3.0 * jnp.eye(2)
    res = SoftDynamicsResidualModel(state, 4, K=K, B=1e-4 * jnp.eye(2))
    lb = -3.14 * 3.0 * jnp.ones(2)
    ub = 3.14 * 3.0 * jnp.ones(2)
    barrier = asl.ActivationModelQuadraticBarrier(asl.ActivationBounds(lb, ub))
    cost = asl.CostModelResidual(state, barrier, res)
    x = state.zero()
    u_in = jnp.array([1.0, -1.0, 0.3, 0.2])       # r well inside the bounds
    assert float(cost.calc(x, u_in, None)) < 1e-10
    u_out = jnp.array([50.0, 0.0, 0.0, 0.0])      # torque violates deflection
    assert float(cost.calc(x, u_out, None)) > 1.0


def test_qb_actuation_probed_derivatives():
    """The reference's hand-rolled FD check of dtau_dx / dtau_du / dK_dx
    (unittest/actuation_test.py:44-69)."""
    robot = robots.load("asr_twodof")
    state = asl.StateASR(robot)
    act = QbActuationModel(state)
    x = state.rand(jax.random.PRNGKey(4))
    u = jax.random.uniform(jax.random.PRNGKey(5), (act.nu,))
    d = act.calc(x, u)
    dtau_dx_ad = jax.jacfwd(lambda x_: act.calc(x_, u).tau)(x)
    dtau_du_ad = jax.jacfwd(lambda u_: act.calc(x, u_).tau)(u)
    dK_dx_ad = jax.jacfwd(lambda x_: act.calc(x_, u).K)(x)
    assert np.allclose(d.dtau_dx, dtau_dx_ad, atol=1e-10)
    assert np.allclose(d.dtau_du, dtau_du_ad, atol=1e-10)
    assert np.allclose(d.dK_dx, dK_dx_ad, atol=1e-10)
    assert np.allclose(d.dK_du, 0.0)
