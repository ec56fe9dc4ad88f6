"""The four reference workloads as declarative configs.

Each builder reproduces one reference example script's problem setup
(models, cost weights, horizons, bounds, solver budgets) as a pytree
problem plus solver options — replacing the hardcoded-constants scripts
(reference ``examples/two_dof_sea.py``, ``examples/double_pendulum.py``,
``examples/two_dof_vsa_boxddp.py``, ``examples/two_dof_vsa_modified.py``)
with dataclass presets (SURVEY §5 "config system").
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

from .. import (
    ASRActuation,
    ActivationModelQuad,
    ActivationModelWeightedQuad,
    ActuationModelDoublePendulum,
    Bounds,
    CostModelDoublePendulum,
    CostModelResidual,
    CostModelStiffness,
    CostModelSum,
    DifferentialSEADynamics,
    DifferentialVSADynamics,
    IntegratedActionEuler,
    ResidualModelControl,
    ResidualModelFramePlacementASR,
    ResidualModelState,
    ShootingProblem,
    StateASR,
    VSAASRActuation,
)
from ..models import robots
from ..ops.se3 import SE3


class Workload(NamedTuple):
    name: str
    problem: ShootingProblem
    bounds: Optional[Bounds]
    solver: str              # "fddp" | "boxddp"
    maxiter: int
    th_stop: float
    warm_start: bool         # quasi-static warm start (two_dof_sea.py:78)
    ee_frame: Optional[int]  # frame id for the reach metric
    target: Optional[jnp.ndarray]


def double_pendulum(T: int = 10, dt: float = 1e-2, dtype=jnp.float64,
                    robot=None) -> Workload:
    """Soft-actuated double-pendulum swing-up
    (reference ``examples/double_pendulum.py``)."""
    model = robot if robot is not None else robots.double_pendulum(dtype=dtype)
    state = StateASR(model)
    act = ActuationModelDoublePendulum(state, act_link=0, nu_=2)
    nu = act.nu

    xact = ActivationModelWeightedQuad(jnp.asarray([1.0] * 2 + [0.0] * 2 + [1.0] * 2 + [0.0] * 2, dtype=dtype))
    xreg = CostModelResidual(state, xact, ResidualModelState(state, state.zero(), nu))
    uact = ActivationModelWeightedQuad(jnp.asarray([1.0, 0.0], dtype=dtype))
    ureg = CostModelResidual(state, uact, ResidualModelControl(state, nu))
    pend_w = ActivationModelWeightedQuad(jnp.asarray([1.0] * 4 + [0.1] * 2, dtype=dtype))
    x_pend = CostModelDoublePendulum(state, pend_w, nu)

    running_costs = (
        CostModelSum(state, nu)
        .add_cost("uReg", ureg, 1e-1)
        .add_cost("xReg", xreg, 1e-2)
        .add_cost("xGoalR", x_pend, 1e-1)
    )
    terminal_costs = CostModelSum(state, nu).add_cost("xGoal", x_pend, 1e4)

    K = 1.0 * jnp.eye(2, dtype=dtype)
    B = 1e-3 * jnp.eye(2, dtype=dtype)
    running = IntegratedActionEuler(DifferentialSEADynamics(state, act, running_costs, K, B), dt)
    terminal = IntegratedActionEuler(DifferentialSEADynamics(state, act, terminal_costs, K, B), 0.0)

    x0 = jnp.asarray([3.14, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], dtype=dtype)
    problem = ShootingProblem(x0=x0, running=running, terminal=terminal, T=T)
    return Workload(
        name="double_pendulum", problem=problem, bounds=None, solver="fddp",
        maxiter=100, th_stop=1e-9, warm_start=False, ee_frame=None, target=None)


def two_dof_sea(T: int = 100, dt: float = 1e-2, dtype=jnp.float64,
                robot=None) -> Workload:
    """2-DoF SEA arm reach (reference ``examples/two_dof_sea.py``).

    ``robot`` overrides the registry model (e.g. an inertial-perturbed
    variant for the parity sensitivity study, docs/PARITY.md)."""
    model = (robot if robot is not None
             else robots.asr_twodof(dtype=dtype)).with_gravity([9.81, 0.0, 0.0])
    state = StateASR(model)
    act = ASRActuation(state)
    nu = act.nu
    ee = model.frame_id("EE")
    target = jnp.asarray([0.01, 2.03063311e-01, 1.80000000e-01], dtype=dtype)

    frame_res = ResidualModelFramePlacementASR(
        state, ee, SE3(jnp.eye(3, dtype=dtype), target), nu)
    goal = CostModelResidual(state, ActivationModelQuad(), frame_res)
    xact = ActivationModelWeightedQuad(jnp.asarray([1.0] * 2 + [0.0] * 2 + [1.0] * 2 + [0.0] * 2, dtype=dtype))
    xreg = CostModelResidual(state, xact, ResidualModelState(state, state.zero(), nu))
    ureg = CostModelResidual(state, ActivationModelQuad(), ResidualModelControl(state, nu))

    running_costs = (
        CostModelSum(state, nu)
        .add_cost("gripperPose", goal, 1e-1)
        .add_cost("xReg", xreg, 1e-3)
        .add_cost("uReg", ureg, 1e-2)
    )
    terminal_costs = CostModelSum(state, nu).add_cost("gripperPose", goal, 1e4)

    K = 1.0 * jnp.eye(2, dtype=dtype)
    B = 0.01 * jnp.eye(2, dtype=dtype)
    running = IntegratedActionEuler(DifferentialSEADynamics(state, act, running_costs, K, B), dt)
    terminal = IntegratedActionEuler(DifferentialSEADynamics(state, act, terminal_costs, K, B), 0.0)

    x0 = jnp.zeros(state.nx, dtype=dtype)
    problem = ShootingProblem(x0=x0, running=running, terminal=terminal, T=T)
    return Workload(
        name="two_dof_sea", problem=problem, bounds=None, solver="fddp",
        maxiter=100, th_stop=1e-7, warm_start=True, ee_frame=ee, target=target)


def three_dof_sea(T: int = 100, dt: float = 1e-2, dtype=jnp.float64) -> Workload:
    """3-DoF SEA arm reach — the smallest non-2-DoF chain.

    Exists to pin the dimension-generic lane kernels (round 5) against
    the generic path at a chain length whose interpret-mode kernel
    bodies still compile in seconds (the 7-DoF bodies take minutes on
    CPU); the hardware target is :func:`seven_dof_sea`."""
    import numpy as np

    from ..ops.rigid_body import frame_placement

    eye = np.eye(3)
    model = robots.make_chain(
        name="three_dof_sea",
        joint_pos=[[0.0, 0.0, 0.12], [0.02, 0.0, 0.1], [0.0, 0.01, 0.11]],
        joint_rot=[eye, robots._rot_x(0.1), robots._rot_y(-0.1)],
        axes=[[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]],
        masses=[1.5, 1.0, 0.6],
        coms=[[0.0, 0.01, 0.05], [0.04, 0.0, 0.04], [0.0, 0.0, 0.05]],
        inertias=[[2e-3, 2e-3, 1e-3], [1.5e-3, 1.5e-3, 8e-4],
                  [8e-4, 8e-4, 4e-4]],
        frames=[("gripper", 2, eye, [0.0, 0.0, 0.1])],
        dtype=dtype,
    ).with_gravity([0.0, 0.0, -9.81])
    state = StateASR(model)
    act = ASRActuation(state)
    nu = act.nu
    ee = model.frame_id("gripper")
    q_tgt = jnp.asarray([0.4, -0.5, 0.3], dtype=dtype)
    tgt = frame_placement(model, q_tgt, ee)

    frame_res = ResidualModelFramePlacementASR(
        state, ee, SE3(tgt.rot, tgt.trans), nu)
    goal = CostModelResidual(state, ActivationModelQuad(), frame_res)
    nq = 3
    xact = ActivationModelWeightedQuad(jnp.asarray(
        [1.0] * nq + [0.0] * nq + [1.0] * nq + [0.0] * nq, dtype=dtype))
    xreg = CostModelResidual(state, xact, ResidualModelState(state, state.zero(), nu))
    ureg = CostModelResidual(state, ActivationModelQuad(), ResidualModelControl(state, nu))

    running_costs = (
        CostModelSum(state, nu)
        .add_cost("gripperPose", goal, 1e-1)
        .add_cost("xReg", xreg, 1e-3)
        .add_cost("uReg", ureg, 1e-2)
    )
    terminal_costs = CostModelSum(state, nu).add_cost("gripperPose", goal, 1e4)

    K = 1.0 * jnp.eye(nq, dtype=dtype)
    B = 0.01 * jnp.eye(nq, dtype=dtype)
    running = IntegratedActionEuler(DifferentialSEADynamics(state, act, running_costs, K, B), dt)
    terminal = IntegratedActionEuler(DifferentialSEADynamics(state, act, terminal_costs, K, B), 0.0)

    x0 = jnp.zeros(state.nx, dtype=dtype)
    problem = ShootingProblem(x0=x0, running=running, terminal=terminal, T=T)
    return Workload(
        name="three_dof_sea", problem=problem, bounds=None, solver="fddp",
        maxiter=100, th_stop=1e-7, warm_start=True, ee_frame=ee,
        target=tgt.trans)


def seven_dof_sea(T: int = 100, dt: float = 1e-2, dtype=jnp.float64) -> Workload:
    """7-DoF SEA arm reach — the reference's ``talos_arm`` generality.

    The reference's own test-suite runs SEA dynamics on the 7-DoF
    ``talos_arm`` (``unittest/test_asr_free_fwddyn.py:51``); this preset
    is the solve-level equivalent on the :func:`..models.robots.seven_dof_arm`
    stand-in (nx=28, nu=7). Since round 5 the lane fast path covers it
    too (dimension-generic kernels, ndx=28 — 2326 solves/s at B=1024 vs
    the generic path's 16, scripts/bench_7dof.py / docs/BENCH.md)."""
    from ..ops.rigid_body import frame_placement

    model = robots.seven_dof_arm(dtype=dtype).with_gravity([0.0, 0.0, -9.81])
    state = StateASR(model)
    act = ASRActuation(state)
    nu = act.nu
    ee = model.frame_id("gripper")
    # reach target: the gripper pose at a bent posture away from x0=0
    q_tgt = jnp.asarray([0.4, -0.5, 0.3, -0.8, 0.2, 0.6, -0.3], dtype=dtype)
    tgt = frame_placement(model, q_tgt, ee)

    frame_res = ResidualModelFramePlacementASR(
        state, ee, SE3(tgt.rot, tgt.trans), nu)
    goal = CostModelResidual(state, ActivationModelQuad(), frame_res)
    nq = 7
    xact = ActivationModelWeightedQuad(jnp.asarray(
        [1.0] * nq + [0.0] * nq + [1.0] * nq + [0.0] * nq, dtype=dtype))
    xreg = CostModelResidual(state, xact, ResidualModelState(state, state.zero(), nu))
    ureg = CostModelResidual(state, ActivationModelQuad(), ResidualModelControl(state, nu))

    running_costs = (
        CostModelSum(state, nu)
        .add_cost("gripperPose", goal, 1e-1)
        .add_cost("xReg", xreg, 1e-3)
        .add_cost("uReg", ureg, 1e-2)
    )
    terminal_costs = CostModelSum(state, nu).add_cost("gripperPose", goal, 1e4)

    K = 1.0 * jnp.eye(nq, dtype=dtype)
    B = 0.01 * jnp.eye(nq, dtype=dtype)
    running = IntegratedActionEuler(DifferentialSEADynamics(state, act, running_costs, K, B), dt)
    terminal = IntegratedActionEuler(DifferentialSEADynamics(state, act, terminal_costs, K, B), 0.0)

    x0 = jnp.zeros(state.nx, dtype=dtype)
    problem = ShootingProblem(x0=x0, running=running, terminal=terminal, T=T)
    return Workload(
        name="seven_dof_sea", problem=problem, bounds=None, solver="fddp",
        maxiter=100, th_stop=1e-7, warm_start=True, ee_frame=ee,
        target=tgt.trans)


def _two_dof_vsa(
    T: int,
    dt: float,
    stiffness_cost: bool,
    k_lb: float,
    dtype=jnp.float64,
    x_weights=None,
    u_weights=None,
    xreg_w: float = 1e-1,
    ureg_w: float = 1e-1,
    goal_term_w: float = 4e4,
    robot=None,
) -> Workload:
    model = (robot if robot is not None
             else robots.asr_twodof(dtype=dtype)).with_gravity([9.81, 0.0, 0.0])
    state = StateASR(model)
    act = VSAASRActuation(state)
    nu = 2 * act.nu
    ee = model.frame_id("EE")
    target = jnp.asarray([0.01, 0.2, 0.18], dtype=dtype)

    frame_res = ResidualModelFramePlacementASR(
        state, ee, SE3(jnp.eye(3, dtype=dtype), target), nu)
    goal = CostModelResidual(state, ActivationModelQuad(), frame_res)
    xw = x_weights if x_weights is not None else [1.0] * 8
    xact = ActivationModelWeightedQuad(jnp.asarray(xw, dtype=dtype))
    xreg = CostModelResidual(state, xact, ResidualModelState(state, state.zero(), nu))
    uw = u_weights if u_weights is not None else [1.0] * 4
    uact = ActivationModelWeightedQuad(jnp.asarray(uw, dtype=dtype))
    ureg = CostModelResidual(state, uact, ResidualModelControl(state, nu))

    running_costs = (
        CostModelSum(state, nu)
        .add_cost("gripperPose", goal, 1e0)
        .add_cost("xReg", xreg, xreg_w)
        .add_cost("uReg", ureg, ureg_w)
    )
    if stiffness_cost:
        vsa_cost = CostModelStiffness(
            state, nu, lamda=jnp.asarray(10.0, dtype=dtype),
            Kref=k_lb * jnp.ones(nu // 2, dtype=dtype))
        running_costs = running_costs.add_cost("vsa", vsa_cost, 1e-2)
    terminal_costs = CostModelSum(state, nu).add_cost("gripperPose", goal, goal_term_w)

    B = 1e-3 * jnp.eye(2, dtype=dtype)
    running = IntegratedActionEuler(DifferentialVSADynamics(state, act, running_costs, B), dt)
    terminal = IntegratedActionEuler(DifferentialVSADynamics(state, act, terminal_costs, B), 0.0)

    x0 = jnp.zeros(state.nx, dtype=dtype)
    problem = ShootingProblem(x0=x0, running=running, terminal=terminal, T=T)
    bounds = Bounds(
        lb=jnp.asarray([-100.0, -100.0, k_lb, k_lb], dtype=dtype),
        ub=jnp.asarray([100.0, 100.0, 100.0, 100.0], dtype=dtype),
    )
    return Workload(
        name="two_dof_vsa", problem=problem, bounds=bounds, solver="boxddp",
        maxiter=400, th_stop=1e-7, warm_start=False, ee_frame=ee, target=target)


def two_dof_vsa_boxddp(T: int = 200, dt: float = 1e-2, dtype=jnp.float64,
                       robot=None) -> Workload:
    """VSA reach with BoxDDP bounds — the north-star config
    (reference ``examples/two_dof_vsa_boxddp.py``: u in [-100,100]^2,
    K in [0,100]^2, T=200, cold start, maxiter 400)."""
    w = _two_dof_vsa(T, dt, stiffness_cost=False, k_lb=0.0, dtype=dtype,
                     robot=robot)
    return w._replace(name="two_dof_vsa_boxddp")


def two_dof_vsa_modified(T: int = 200, dt: float = 1e-2, dtype=jnp.float64,
                         robot=None) -> Workload:
    """VSA with linear stiffness cost and tightened stiffness lower bound
    (reference ``examples/two_dof_vsa_modified.py``: K lower bound 0.002,
    lambda=10 stiffness cost, xReg 1e-3 / uReg 1e-2 with zeroed stiffness
    u-weights, terminal goal 1e4)."""
    w = _two_dof_vsa(
        T, dt, stiffness_cost=True, k_lb=0.002, dtype=dtype,
        u_weights=[1.0, 1.0, 0.0, 0.0], xreg_w=1e-3, ureg_w=1e-2, goal_term_w=1e4,
        robot=robot)
    return w._replace(name="two_dof_vsa_modified")


PRESETS = {
    "double_pendulum": double_pendulum,
    "two_dof_sea": two_dof_sea,
    "two_dof_vsa_boxddp": two_dof_vsa_boxddp,
    "two_dof_vsa_modified": two_dof_vsa_modified,
    # beyond the reference's four example scripts: the chain-length
    # generality its own test-suite exercises (talos_arm SEA), plus the
    # small-chain parity fixture
    "seven_dof_sea": seven_dof_sea,
    "three_dof_sea": three_dof_sea,
}
