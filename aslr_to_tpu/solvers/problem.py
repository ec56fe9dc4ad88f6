"""Shooting problem container.

TPU-native replacement for ``crocoddyl.ShootingProblem`` (reference
``examples/two_dof_sea.py:66``): T running knots sharing one action model
plus a terminal model, as a pytree the solver jits over. The reference
builds ``[runningModel] * T`` — the same object at every knot — which maps
exactly to one shared model here; per-knot parameter variation can be added
by stacking pytree leaves and switching the linearization vmap axes.

Unlike the reference there is no ``nthreads`` (the single-thread constraint
of ``examples/double_pendulum.py:54`` does not exist here): parallelism
comes from vmap over scenarios and the width-parallel line search.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShootingProblem:
    x0: jnp.ndarray
    running: object
    terminal: object
    T: int = dataclasses.field(metadata=dict(static=True))

    @property
    def state(self):
        return self.running.state

    @property
    def nu(self) -> int:
        return self.running.nu

    def quasi_static(self, xs):
        """Warm-start controls for a state trajectory [T, nx] — replaces
        ``problem.quasiStatic([x0] * T)`` (reference ``two_dof_sea.py:78``)."""
        return jax.vmap(self.running.quasi_static)(xs)

    def rollout(self, us, x0=None):
        """Nonlinear rollout of a control trajectory -> xs [T+1, nx]."""
        x0 = self.x0 if x0 is None else x0

        def step(x, u):
            data = self.running.calc(x, u)
            return data.xnext, x

        xT, xs = jax.lax.scan(step, x0, us)
        return jnp.concatenate([xs, xT[None]], axis=0)

    def calc_cost(self, xs, us):
        """Total trajectory cost."""
        run = jax.vmap(self.running.calc)(xs[:-1], us)
        u0 = jnp.zeros(self.terminal.nu, dtype=xs.dtype)
        term = self.terminal.calc(xs[-1], u0)
        return jnp.sum(run.cost) + term.cost
