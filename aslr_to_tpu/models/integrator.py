"""Semi-implicit Euler integrator turning a differential model into a
discrete action model.

TPU-native replacement for ``IntegratedActionModelEulerASR``
(reference ``python/aslr_to/integrated_action.py:6-52``):

  ``dx = [v dt + a dt^2, a dt]``, ``xnext = state.integrate(x, dx)``

``dt = 0`` makes it a terminal model (Fx = I, Fu = 0, cost terms only).
Cost is the per-knot differential cost, NOT scaled by dt — matching the
reference's semantics (``integrated_action.py:20``).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .costs import CostDerivs


class ActionData(NamedTuple):
    xnext: jnp.ndarray
    cost: jnp.ndarray


class ActionDerivs(NamedTuple):
    Fx: jnp.ndarray
    Fu: jnp.ndarray
    Lx: jnp.ndarray
    Lu: jnp.ndarray
    Lxx: jnp.ndarray
    Lxu: jnp.ndarray
    Luu: jnp.ndarray


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IntegratedActionEuler:
    """Discrete action model = Euler(differential model, dt)."""

    differential: object
    dt: float = dataclasses.field(metadata=dict(static=True), default=1e-3)

    @property
    def state(self):
        return self.differential.state

    @property
    def nu(self) -> int:
        return self.differential.nu

    def _dx(self, x, acc):
        nq = self.state.nq
        dt = self.dt
        v = x[nq:]
        return jnp.concatenate([v * dt + acc * dt * dt, acc * dt])

    def calc(self, x, u) -> ActionData:
        data = self.differential.calc(x, u)
        if self.dt == 0.0:
            return ActionData(xnext=x, cost=data.cost)
        dx = self._dx(x, data.xout)
        return ActionData(xnext=self.state.integrate(x, dx), cost=data.cost)

    def calc_diff(self, x, u) -> ActionDerivs:
        """Chain rule through the integrator (reference
        ``integrated_action.py:28-42``)."""
        nv = self.state.nv
        ndx = self.state.ndx
        dt = self.dt
        data = self.differential.calc(x, u)
        d = self.differential.calc_diff(x, u, data)
        cd: CostDerivs = d.costs

        if dt == 0.0:
            return ActionDerivs(
                Fx=jnp.eye(ndx, dtype=x.dtype),
                Fu=jnp.zeros((ndx, self.nu), dtype=x.dtype),
                Lx=cd.Lx, Lu=cd.Lu, Lxx=cd.Lxx, Lxu=cd.Lxu, Luu=cd.Luu,
            )

        dx = self._dx(x, data.xout)
        dxnext_dx, dxnext_ddx = self.state.jintegrate(x, dx)

        da_dx, da_du = d.Fx, d.Fu
        # ddx_dx = [[da_dx dt + I_v], [da_dx]]  (identity shift on the
        # position rows wrt the velocity columns, integrated_action.py:35).
        shift = jnp.zeros((nv, ndx), dtype=x.dtype).at[:, nv:2 * nv].set(jnp.eye(nv, dtype=x.dtype))
        ddx_dx = jnp.concatenate([da_dx * dt + shift, da_dx], axis=0)
        Fx = dxnext_dx + dt * (dxnext_ddx @ ddx_dx)

        ddx_du = jnp.concatenate([da_du * dt, da_du], axis=0)
        Fu = dt * (dxnext_ddx @ ddx_du)

        return ActionDerivs(Fx=Fx, Fu=Fu, Lx=cd.Lx, Lu=cd.Lu, Lxx=cd.Lxx, Lxu=cd.Lxu, Luu=cd.Luu)

    def calc_with_diff(self, x, u):
        """(ActionData, ActionDerivs) sharing one dynamics evaluation —
        the fused path the solver's linearization sweep uses."""
        nv = self.state.nv
        ndx = self.state.ndx
        dt = self.dt
        data = self.differential.calc(x, u)
        d = self.differential.calc_diff(x, u, data)
        cd: CostDerivs = d.costs

        if dt == 0.0:
            action = ActionData(xnext=x, cost=data.cost)
            derivs = ActionDerivs(
                Fx=jnp.eye(ndx, dtype=x.dtype),
                Fu=jnp.zeros((ndx, self.nu), dtype=x.dtype),
                Lx=cd.Lx, Lu=cd.Lu, Lxx=cd.Lxx, Lxu=cd.Lxu, Luu=cd.Luu,
            )
            return action, derivs

        dx = self._dx(x, data.xout)
        action = ActionData(xnext=self.state.integrate(x, dx), cost=data.cost)

        dxnext_dx, dxnext_ddx = self.state.jintegrate(x, dx)
        da_dx, da_du = d.Fx, d.Fu
        shift = jnp.zeros((nv, ndx), dtype=x.dtype).at[:, nv:2 * nv].set(jnp.eye(nv, dtype=x.dtype))
        ddx_dx = jnp.concatenate([da_dx * dt + shift, da_dx], axis=0)
        Fx = dxnext_dx + dt * (dxnext_ddx @ ddx_dx)
        ddx_du = jnp.concatenate([da_du * dt, da_du], axis=0)
        Fu = dt * (dxnext_ddx @ ddx_du)
        derivs = ActionDerivs(Fx=Fx, Fu=Fu, Lx=cd.Lx, Lu=cd.Lu, Lxx=cd.Lxx, Lxu=cd.Lxu, Luu=cd.Luu)
        return action, derivs

    def quasi_static(self, x):
        return self.differential.quasi_static(x)
