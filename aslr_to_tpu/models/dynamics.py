"""Soft-actuation differential dynamics models (SEA, VSA) and rigid free
forward dynamics.

TPU-native replacement for the reference's core action-model layer:
  - ``DifferentialFreeASRFwdDynamicsModel`` (SEA, spring coupling K)
    — reference ``python/aslr_to/free_fwddyn_asr.py:6-134``
  - ``DifferentialFreeFwdDynamicsModelVSA`` (variable stiffness as control)
    — reference ``python/aslr_to/free_fwddyn_vsa.py:6-135``
  - Crocoddyl's ``DifferentialActionModelFreeFwdDynamics`` (rigid, used by
    the condensed-formulation tests, ``unittest/test_softdyn_residual.py:33``)

The math mirrors the reference exactly (same Fx/Fu block structure built
from RNEA derivatives), but everything is a pure function of pytrees:
no model/data object pairs, no Python-per-knot callbacks — the solver jits
and vmaps straight through these.

``calc`` returns ``(xout, cost, kin)`` where ``kin`` is the shared forward
kinematics (the functional analogue of Crocoddyl's DataCollectorMultibody).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import rigid_body as rbd
from .costs import CostDerivs, CostModelSum, KinData
from .state import StateASR, StateMultibody


class DiffData(NamedTuple):
    """Output of a differential model's calc."""

    xout: jnp.ndarray    # accelerations [state.nv]
    cost: jnp.ndarray    # scalar
    kin: KinData


class DiffDerivs(NamedTuple):
    Fx: jnp.ndarray      # [nv, ndx] acceleration jacobian wrt state
    Fu: jnp.ndarray      # [nv, nu]
    costs: CostDerivs


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DifferentialSEADynamics:
    """Series-elastic actuation forward dynamics.

    Link side:  ``a_l = M(q_l)^-1 (tau_link - nle - K (q_l - q_m))``
    Motor side: ``a_m = B^-1     (tau_motor + K (q_l - q_m))``

    Defaults ``K = 0.1 I``, ``B = 1e-3 I`` as in the reference
    (``free_fwddyn_asr.py:11-18``).
    """

    state: StateASR
    actuation: object
    costs: CostModelSum
    K: jnp.ndarray = None
    B: jnp.ndarray = None

    def __post_init__(self):
        nl = self.state.nl
        if self.K is None:
            object.__setattr__(self, "K", 1e-1 * jnp.eye(nl))
        if self.B is None:
            object.__setattr__(self, "B", 1e-3 * jnp.eye(nl))

    @property
    def nu(self) -> int:
        return self.actuation.nu

    def _split(self, x):
        return self.state.split(x)

    def calc(self, x, u) -> DiffData:
        nl = self.state.nl
        q_l, q_m, v_l, v_m = self._split(x)
        x_m = jnp.concatenate([q_m, v_m])

        tau = self.actuation.calc(x_m, u)
        tau_couple = self.K @ (q_l - q_m)

        M, nle = rbd.compute_all_terms(self.state.robot, q_l, v_l)
        a_l = jnp.linalg.solve(M, tau[:nl] - nle - tau_couple)
        a_m = jnp.linalg.solve(self.B, tau[nl:] + tau_couple)
        xout = jnp.concatenate([a_l, a_m])

        rots, trans = rbd.forward_kinematics(self.state.robot, q_l)
        kin = KinData(rots=rots, trans=trans)
        cost = self.costs.calc(x, u, kin)
        return DiffData(xout=xout, cost=cost, kin=kin)

    def calc_diff(self, x, u, data: DiffData = None) -> DiffDerivs:
        nl = self.state.nl
        ndx = self.state.ndx
        q_l, q_m, v_l, v_m = self._split(x)
        x_m = jnp.concatenate([q_m, v_m])
        if data is None:
            data = self.calc(x, u)
        a_l = data.xout[:nl]

        dtau_du = self.actuation.calc_diff(x_m, u)

        # RNEA derivatives at (q_l, v_l, a_l): dtau_dq includes the dM/dq a
        # terms, so Minv(-dtau_dq - K) is the total link-acceleration
        # jacobian (reference ``free_fwddyn_asr.py:75-86``).
        dtau_dq, dtau_dv = rbd.rnea_derivatives(self.state.robot, q_l, v_l, a_l)
        M = rbd.mass_matrix(self.state.robot, q_l)
        Minv = jnp.linalg.inv(M)
        Binv = jnp.linalg.inv(self.B)

        Fx = jnp.zeros((2 * nl, ndx), dtype=x.dtype)
        Fx = Fx.at[:nl, :nl].set(Minv @ (-dtau_dq - self.K))
        Fx = Fx.at[:nl, nl:2 * nl].set(Minv @ self.K)
        Fx = Fx.at[:nl, 2 * nl:3 * nl].set(Minv @ (-dtau_dv))
        Fx = Fx.at[nl:, :nl].set(Binv @ self.K)
        Fx = Fx.at[nl:, nl:2 * nl].set(-(Binv @ self.K))

        Fu = jnp.zeros((2 * nl, self.nu), dtype=x.dtype)
        # Reference guards this with ``if nu > 1`` (free_fwddyn_asr.py:88);
        # we set it unconditionally — the guard is dead weight.
        Fu = Fu.at[nl:, :].set(Binv @ dtau_du[nl:, :])
        Fu = Fu.at[:nl, :].set(Minv @ dtau_du[:nl, :])

        cd = self.costs.calc_diff(x, u, data.kin)
        return DiffDerivs(Fx=Fx, Fu=Fu, costs=cd)

    def quasi_static(self, x):
        """Gravity-compensation warm start.

        Reference ``free_fwddyn_asr.py:94-115`` computes
        ``pinv(dtau_du)^T rnea(q_l, 0, 0)`` (dimensionally inconsistent as
        written — SURVEY §3.4); we implement the physical intent: at SEA
        equilibrium the spring transmits the gravity torque, so the motor
        input is the least-squares gravity compensation through the
        motor-side actuation block.
        """
        nl = self.state.nl
        q_l, q_m, v_l, v_m = self._split(x)
        zeros = jnp.zeros_like(q_l)
        tau_g = rbd.rnea(self.state.robot, q_l, zeros, zeros)
        x_static = jnp.concatenate([q_m, zeros])
        dtau_du = self.actuation.calc_diff(x_static, jnp.zeros(self.nu, dtype=x.dtype))
        return jnp.linalg.pinv(dtau_du[nl:, :]) @ tau_g


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DifferentialVSADynamics:
    """Variable-stiffness actuation: stiffness is a control input.

    ``u = [tau_m (nl); k_diag (nl)]``, ``K = diag(u[nl:])``; the link side
    receives no direct motor torque (reference ``free_fwddyn_vsa.py:44``),
    and ``calcDiff`` gains the stiffness control columns
    ``da_l/dk = Minv * (q_m - q_l)`` / ``da_m/dk = Binv * (q_l - q_m)``
    (reference ``free_fwddyn_vsa.py:89-92``, diag-by-broadcast trick).
    """

    state: StateASR
    actuation: object
    costs: CostModelSum
    B: jnp.ndarray = None

    def __post_init__(self):
        if self.B is None:
            object.__setattr__(self, "B", 1e-3 * jnp.eye(self.state.nl))

    @property
    def nu(self) -> int:
        return 2 * self.actuation.nu

    def default_u(self, dtype=None):
        """u=None default in the reference: zero torque, K = 3
        (``free_fwddyn_vsa.py:20-23``)."""
        nl = self.state.nl
        dtype = dtype or self.state.robot.gravity.dtype
        return jnp.concatenate([jnp.zeros(nl, dtype=dtype), 3.0 * jnp.ones(nl, dtype=dtype)])

    def calc(self, x, u) -> DiffData:
        nl = self.state.nl
        q_l, q_m, v_l, v_m = self.state.split(x)

        k_diag = u[nl:]
        tau_m = u[:nl]
        tau_couple = k_diag * (q_l - q_m)

        M, nle = rbd.compute_all_terms(self.state.robot, q_l, v_l)
        a_l = jnp.linalg.solve(M, -nle - tau_couple)
        a_m = jnp.linalg.solve(self.B, tau_m + tau_couple)
        xout = jnp.concatenate([a_l, a_m])

        rots, trans = rbd.forward_kinematics(self.state.robot, q_l)
        kin = KinData(rots=rots, trans=trans)
        cost = self.costs.calc(x, u, kin)
        return DiffData(xout=xout, cost=cost, kin=kin)

    def calc_diff(self, x, u, data: DiffData = None) -> DiffDerivs:
        nl = self.state.nl
        ndx = self.state.ndx
        q_l, q_m, v_l, v_m = self.state.split(x)
        if data is None:
            data = self.calc(x, u)
        a_l = data.xout[:nl]

        k_diag = u[nl:]
        K = jnp.diag(k_diag)

        dtau_dq, dtau_dv = rbd.rnea_derivatives(self.state.robot, q_l, v_l, a_l)
        M = rbd.mass_matrix(self.state.robot, q_l)
        Minv = jnp.linalg.inv(M)
        Binv = jnp.linalg.inv(self.B)

        Fx = jnp.zeros((2 * nl, ndx), dtype=x.dtype)
        Fx = Fx.at[:nl, :nl].set(Minv @ (-dtau_dq - K))
        Fx = Fx.at[:nl, nl:2 * nl].set(Minv @ K)
        Fx = Fx.at[:nl, 2 * nl:3 * nl].set(Minv @ (-dtau_dv))
        Fx = Fx.at[nl:, :nl].set(Binv @ K)
        Fx = Fx.at[nl:, nl:2 * nl].set(-(Binv @ K))

        Fu = jnp.zeros((2 * nl, self.nu), dtype=x.dtype)
        # Stiffness columns (diag-by-broadcast, reference :89-90).
        Fu = Fu.at[:nl, nl:].set(Minv * (q_m - q_l)[None, :])
        Fu = Fu.at[nl:, nl:].set(Binv * (q_l - q_m)[None, :])
        # Motor-torque columns.
        Fu = Fu.at[nl:, :nl].set(Binv)

        cd = self.costs.calc_diff(x, u, data.kin)
        return DiffDerivs(Fx=Fx, Fu=Fu, costs=cd)

    def quasi_static(self, x):
        """Gravity-compensation warm start (motor-torque half only, zero
        stiffness command) — see ``DifferentialSEADynamics.quasi_static``."""
        nl = self.state.nl
        q_l, q_m, v_l, v_m = self.state.split(x)
        zeros = jnp.zeros_like(q_l)
        tau_g = rbd.rnea(self.state.robot, q_l, zeros, zeros)
        return jnp.concatenate([tau_g, jnp.zeros(nl, dtype=x.dtype)])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DifferentialFreeFwdDynamics:
    """Rigid free forward dynamics ``a = M^-1 (tau - nle)`` (ABA semantics).

    Crocoddyl's ``DifferentialActionModelFreeFwdDynamics`` equivalent, the
    base the reference's condensed formulation builds on
    (``unittest/test_softdyn_residual.py:33``).
    """

    state: StateMultibody
    costs: CostModelSum

    @property
    def nu(self) -> int:
        return self.state.nv

    def calc(self, x, u) -> DiffData:
        q, v = self.state.split(x)
        a = rbd.aba(self.state.robot, q, v, u)
        rots, trans = rbd.forward_kinematics(self.state.robot, q)
        kin = KinData(rots=rots, trans=trans)
        cost = self.costs.calc(x, u, kin)
        return DiffData(xout=a, cost=cost, kin=kin)

    def calc_diff(self, x, u, data: DiffData = None) -> DiffDerivs:
        nv = self.state.nv
        q, v = self.state.split(x)
        if data is None:
            data = self.calc(x, u)
        a = data.xout

        dtau_dq, dtau_dv = rbd.rnea_derivatives(self.state.robot, q, v, a)
        M = rbd.mass_matrix(self.state.robot, q)
        Minv = jnp.linalg.inv(M)

        Fx = jnp.concatenate([Minv @ (-dtau_dq), Minv @ (-dtau_dv)], axis=1)
        Fu = Minv
        cd = self.costs.calc_diff(x, u, data.kin)
        return DiffDerivs(Fx=Fx, Fu=Fu, costs=cd)

    def quasi_static(self, x):
        q, v = self.state.split(x)
        zeros = jnp.zeros_like(q)
        return rbd.rnea(self.state.robot, q, zeros, zeros)
