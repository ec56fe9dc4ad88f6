"""Shooting problem container.

TPU-native replacement for ``crocoddyl.ShootingProblem`` (reference
``examples/two_dof_sea.py:66``): T running knots sharing one action model
plus a terminal model, as a pytree the solver jits over. The reference
builds ``[runningModel] * T`` — the same object at every knot — which maps
exactly to one shared model here.

Per-knot heterogeneity (the reference's models-attached-per-node
generality, e.g. per-node bounds at ``two_dof_vsa_boxddp.py:59-60``, or
time-varying tracking targets for MPC): build T distinct models, stack
them with :func:`stack_knots`, and set ``per_knot=True`` — every leaf of
``running`` then carries a leading [T] axis and the solver vmaps/scans the
model alongside the trajectory. Per-knot control bounds are [T, nu]
``Bounds`` arrays. The fused lane kernels cover per-knot variation in the
frame target and the control box (SMEM tables, tests/test_lane_per_knot.py);
any other varying leaf runs the generic path (``supports_fast_path`` names
the reason).

Unlike the reference there is no ``nthreads`` (the single-thread constraint
of ``examples/double_pendulum.py:54`` does not exist here): parallelism
comes from vmap over scenarios and the width-parallel line search.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def stack_knots(models):
    """Stack a sequence of structurally-identical action models into one
    per-knot model pytree (every leaf gains a leading [T] axis). Use with
    ``ShootingProblem(per_knot=True)``."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *models)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShootingProblem:
    x0: jnp.ndarray
    running: object
    terminal: object
    T: int = dataclasses.field(metadata=dict(static=True))
    per_knot: bool = dataclasses.field(default=False, metadata=dict(static=True))

    @property
    def state(self):
        # shape-derived properties (nx, nu, ...) must come from ONE knot's
        # leaves, not the stacked [T, ...] arrays
        return self.knot_model(0).state

    @property
    def nu(self) -> int:
        return self.knot_model(0).nu

    def knot_model(self, t: int):
        """The action model at knot ``t`` (slices per-knot leaves)."""
        if not self.per_knot:
            return self.running
        return jax.tree.map(lambda leaf: leaf[t], self.running)

    def quasi_static(self, xs):
        """Warm-start controls for a state trajectory [T, nx] — replaces
        ``problem.quasiStatic([x0] * T)`` (reference ``two_dof_sea.py:78``)."""
        if self.per_knot:
            return jax.vmap(type(self.running).quasi_static)(self.running, xs)
        return jax.vmap(self.running.quasi_static)(xs)

    def rollout(self, us, x0=None):
        """Nonlinear rollout of a control trajectory -> xs [T+1, nx]."""
        x0 = self.x0 if x0 is None else x0

        if self.per_knot:
            def step_k(x, inp):
                m, u = inp
                return m.calc(x, u).xnext, x
            xT, xs = jax.lax.scan(step_k, x0, (self.running, us))
        else:
            def step(x, u):
                return self.running.calc(x, u).xnext, x
            xT, xs = jax.lax.scan(step, x0, us)
        return jnp.concatenate([xs, xT[None]], axis=0)

    def calc_cost(self, xs, us):
        """Total trajectory cost."""
        if self.per_knot:
            run = jax.vmap(type(self.running).calc)(self.running, xs[:-1], us)
        else:
            run = jax.vmap(self.running.calc)(xs[:-1], us)
        u0 = jnp.zeros(self.terminal.nu, dtype=xs.dtype)
        term = self.terminal.calc(xs[-1], u0)
        return jnp.sum(run.cost) + term.cost
