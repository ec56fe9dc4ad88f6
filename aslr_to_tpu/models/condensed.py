"""Condensed soft-dynamics formulation on a rigid state.

The reference explored (and later removed from the package, leaving only
its unit tests) a second formulation where the soft dynamics live on the
*rigid* state and the spring coupling is imposed as a penalized residual:
``QbActuationModel`` / ``ASRActuationCondensed`` /
``SoftDynamicsResidualModel`` / ``VSADynamicsResidualModel``
(call sites: ``unittest/actuation_test.py:12``,
``unittest/test_softdyn_residual.py:19-23``,
``unittest/test_vsa_residual.py:17-22``; SURVEY §2.1
"removed-but-tested"). This is exactly the formulation that batches well
(half the state, standard rigid dynamics), so the framework supports it
as a first-class variant.

Conventions (reconstructed from the tests' probed quantities — the
original source is not in the reference tree):

  - ``ASRActuationCondensed(state, nu, B)``: the control is
    ``u = [tau (nv), q_m (nv)]`` (SEA, nu = 2 nv) or
    ``u = [tau (nv), q_m (nv), k (nv)]`` (VSA, nu = 3 nv); the link
    receives the direct torque ``tau = u[:nv]`` and the remaining entries
    are decision variables consumed by the feasibility residuals.
  - ``SoftDynamicsResidualModel(state, nu, K, B)``:
    ``r = tau - K (q_m - q_l)`` — the applied torque must match the
    spring force (penalize with a quadratic or a barrier with the
    reference's deflection bounds ``+/- pi K``,
    ``unittest/test_softdyn_residual.py:24-27``).
  - ``VSADynamicsResidualModel(state, nu)``:
    ``r = tau - k * (q_m - q_l)`` with per-joint stiffness decision
    variables ``k = u[2nv:]``.
  - ``QbActuationModel(state_asr)``: qbmove-style variable-stiffness
    actuation on the augmented state with deflection-hardening stiffness
    ``K(x) = k0 + k1 (q_l - q_m)^2`` and the derivative set the
    reference's test probes (``dK_dx``, ``dtau_dx``, ``dtau_du``,
    ``dK_du`` — ``unittest/actuation_test.py:39-42``).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .state import StateASR, StateMultibody


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ASRActuationCondensed:
    """Condensed actuation: link torque is a direct decision variable."""

    state: StateMultibody
    nu_: int = dataclasses.field(metadata=dict(static=True))
    B: jnp.ndarray = None

    @property
    def nu(self) -> int:
        return self.nu_

    def calc(self, x, u):
        return u[: self.state.nv]

    def calc_diff(self, x, u):
        nv = self.state.nv
        S = jnp.zeros((nv, self.nu_), dtype=u.dtype)
        return S.at[:, :nv].set(jnp.eye(nv, dtype=u.dtype))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SoftDynamicsResidualModel:
    """Feasibility residual ``r = tau - K (q_m - q_l)`` (SEA, fixed K)."""

    state: StateMultibody
    nu: int = dataclasses.field(metadata=dict(static=True))
    K: jnp.ndarray = None
    B: jnp.ndarray = None

    @property
    def nr(self) -> int:
        return self.state.nv

    def calc(self, x, u, kin):
        nv = self.state.nv
        q_l = x[:nv]
        tau = u[:nv]
        q_m = u[nv:2 * nv]
        return tau - self.K @ (q_m - q_l)

    def calc_diff(self, x, u, kin):
        nv = self.state.nv
        Rx = jnp.zeros((nv, self.state.ndx), dtype=x.dtype).at[:, :nv].set(self.K)
        Ru = jnp.zeros((nv, self.nu), dtype=x.dtype)
        Ru = Ru.at[:, :nv].set(jnp.eye(nv, dtype=x.dtype))
        Ru = Ru.at[:, nv:2 * nv].set(-self.K)
        return Rx, Ru


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VSADynamicsResidualModel:
    """Feasibility residual ``r = tau - k * (q_m - q_l)`` (VSA, k in u)."""

    state: StateMultibody
    nu: int = dataclasses.field(metadata=dict(static=True))

    @property
    def nr(self) -> int:
        return self.state.nv

    def calc(self, x, u, kin):
        nv = self.state.nv
        q_l = x[:nv]
        tau = u[:nv]
        q_m = u[nv:2 * nv]
        k = u[2 * nv:3 * nv]
        return tau - k * (q_m - q_l)

    def calc_diff(self, x, u, kin):
        nv = self.state.nv
        q_l = x[:nv]
        q_m = u[nv:2 * nv]
        k = u[2 * nv:3 * nv]
        Rx = jnp.zeros((nv, self.state.ndx), dtype=x.dtype).at[:, :nv].set(jnp.diag(k))
        Ru = jnp.zeros((nv, self.nu), dtype=x.dtype)
        Ru = Ru.at[:, :nv].set(jnp.eye(nv, dtype=x.dtype))
        Ru = Ru.at[:, nv:2 * nv].set(jnp.diag(-k))
        Ru = Ru.at[:, 2 * nv:3 * nv].set(jnp.diag(-(q_m - q_l)))
        return Rx, Ru


class QbActuationData(NamedTuple):
    tau: jnp.ndarray
    K: jnp.ndarray
    dtau_dx: jnp.ndarray
    dtau_du: jnp.ndarray
    dK_dx: jnp.ndarray
    dK_du: jnp.ndarray


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QbActuationModel:
    """qbmove-style actuation with deflection-hardening stiffness.

    ``K_i(x) = k0 + k1 (q_l_i - q_m_i)^2``;
    ``tau = [K(x) * (q_m - q_l); u]`` — the spring torque drives the link
    side, motor torques are the controls. Provides the probed derivative
    set of the reference's test (``unittest/actuation_test.py:39-42``).
    """

    state: StateASR
    k0: jnp.ndarray = 1.0
    k1: jnp.ndarray = 0.5

    @property
    def nu(self) -> int:
        return self.state.nl

    def _K(self, q_l, q_m):
        d = q_l - q_m
        return self.k0 + self.k1 * d * d

    def calc(self, x, u) -> QbActuationData:
        nl = self.state.nl
        q_l, q_m, v_l, v_m = self.state.split(x)
        K = self._K(q_l, q_m)
        tau = jnp.concatenate([K * (q_m - q_l), u[:nl]])

        d = q_l - q_m
        # dK/d(q_l) = 2 k1 d ; dK/d(q_m) = -2 k1 d
        dK_dql = jnp.diag(2.0 * self.k1 * d)
        ndx = self.state.ndx
        dK_dx = jnp.zeros((nl, ndx), dtype=x.dtype)
        dK_dx = dK_dx.at[:, :nl].set(dK_dql).at[:, nl:2 * nl].set(-dK_dql)

        # tau_link = K(d) * (-d): dtau_link/dd = -K - k1*2*d*d = -(k0 + 3 k1 d^2)
        dtl_dd = jnp.diag(-(self.k0 + 3.0 * self.k1 * d * d))
        dtau_dx = jnp.zeros((2 * nl, ndx), dtype=x.dtype)
        dtau_dx = dtau_dx.at[:nl, :nl].set(dtl_dd).at[:nl, nl:2 * nl].set(-dtl_dd)

        dtau_du = jnp.zeros((2 * nl, nl), dtype=x.dtype).at[nl:, :].set(jnp.eye(nl, dtype=x.dtype))
        dK_du = jnp.zeros((nl, nl), dtype=x.dtype)
        return QbActuationData(tau=tau, K=K, dtau_dx=dtau_dx, dtau_du=dtau_du,
                               dK_dx=dK_dx, dK_du=dK_du)

    def calc_diff(self, x, u) -> QbActuationData:
        return self.calc(x, u)
