"""Cost library: activations, residuals, residual costs, and cost sums.

TPU-native replacement for the Crocoddyl cost stack the reference assembles
its problems from (``crocoddyl.CostModelSum`` / ``CostModelResidual`` /
activation models — reference ``examples/two_dof_sea.py:27-47``) plus the
reference's own cost models (``python/aslr_to/stiffness_cost.py``,
``python/aslr_to/residual_frame_placement.py``,
``python/aslr_to/residual_acrobot.py``,
``CostModelDoublePendulum`` at ``python/aslr_to/__init__.py:223-259``).

Derivative semantics follow Crocoddyl's Gauss-Newton convention: second
derivatives come from ``Rx' Arr Rx``, not the full residual Hessian — this
is what the reference solver consumes and what keeps DDP iterations cheap.

Everything is a frozen-dataclass pytree: weights/targets are leaves (so a
batch of problems can vmap over targets), dimensions are static. Shared
kinematics are passed in as ``KinData`` — the functional analogue of
Crocoddyl's ``DataCollectorMultibody`` memory sharing.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import rigid_body as rbd
from ..ops.se3 import SE3, jlog6, log6
from .state import StateASR


class KinData(NamedTuple):
    """Precomputed forward kinematics of the link side (shared by dynamics
    and costs the way Crocoddyl shares ``data.pinocchio``)."""

    rots: jnp.ndarray    # [nj,3,3] world rotations of joint frames
    trans: jnp.ndarray   # [nj,3]


class CostDerivs(NamedTuple):
    Lx: jnp.ndarray
    Lu: jnp.ndarray
    Lxx: jnp.ndarray
    Lxu: jnp.ndarray
    Luu: jnp.ndarray


def zero_derivs(ndx, nu, dtype):
    return CostDerivs(
        Lx=jnp.zeros(ndx, dtype=dtype),
        Lu=jnp.zeros(nu, dtype=dtype),
        Lxx=jnp.zeros((ndx, ndx), dtype=dtype),
        Lxu=jnp.zeros((ndx, nu), dtype=dtype),
        Luu=jnp.zeros((nu, nu), dtype=dtype),
    )


# ---------------------------------------------------------------------------
# activation models (crocoddyl.ActivationModel*)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ActivationModelQuad:
    """a(r) = 0.5 ||r||^2."""

    def calc(self, r):
        return 0.5 * jnp.dot(r, r)

    def calc_diff(self, r):
        return r, jnp.ones_like(r)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ActivationModelWeightedQuad:
    """a(r) = 0.5 r' diag(w) r (reference usage: ``two_dof_sea.py:30``)."""

    weights: jnp.ndarray

    def calc(self, r):
        return 0.5 * jnp.dot(r, self.weights * r)

    def calc_diff(self, r):
        return self.weights * r, self.weights


class ActivationBounds(NamedTuple):
    lb: jnp.ndarray
    ub: jnp.ndarray


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ActivationModelQuadraticBarrier:
    """Quadratic penalty outside [lb, ub] (crocoddyl semantics; used by the
    reference's condensed soft-dynamics tests,
    ``unittest/test_softdyn_residual.py:24-26``)."""

    bounds: ActivationBounds

    def calc(self, r):
        lo = jnp.minimum(r - self.bounds.lb, 0.0)
        hi = jnp.maximum(r - self.bounds.ub, 0.0)
        return 0.5 * (jnp.dot(lo, lo) + jnp.dot(hi, hi))

    def calc_diff(self, r):
        lo = jnp.minimum(r - self.bounds.lb, 0.0)
        hi = jnp.maximum(r - self.bounds.ub, 0.0)
        Ar = lo + hi
        Arr = jnp.where((lo < 0.0) | (hi > 0.0), 1.0, 0.0).astype(r.dtype)
        return Ar, Arr


# ---------------------------------------------------------------------------
# residual models
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ResidualModelState:
    """r = diff(xref, x) — Lie-aware state regularizer
    (crocoddyl ``ResidualModelState``; reference ``two_dof_sea.py:31``)."""

    state: StateASR
    xref: jnp.ndarray
    nu: int = dataclasses.field(metadata=dict(static=True))

    @property
    def nr(self) -> int:
        return self.state.ndx

    def calc(self, x, u, kin):
        return self.state.diff(self.xref, x)

    def calc_diff(self, x, u, kin):
        ndx = self.state.ndx
        Rx = jnp.eye(ndx, dtype=x.dtype)
        Ru = jnp.zeros((ndx, self.nu), dtype=x.dtype)
        return Rx, Ru


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ResidualModelControl:
    """r = u (crocoddyl ``ResidualModelControl``; reference ``two_dof_sea.py:33``)."""

    state: StateASR
    nu: int = dataclasses.field(metadata=dict(static=True))

    @property
    def nr(self) -> int:
        return self.nu

    def calc(self, x, u, kin):
        return u

    def calc_diff(self, x, u, kin):
        Rx = jnp.zeros((self.nu, self.state.ndx), dtype=x.dtype)
        Ru = jnp.eye(self.nu, dtype=x.dtype)
        return Rx, Ru


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ResidualModelFramePlacementASR:
    """6-D task-space residual ``r = log6(target^-1 * oMf[frame])``.

    Reference ``python/aslr_to/residual_frame_placement.py:7-38``: only the
    link-side configuration block of Rx is populated ("Currently only
    supports Fully actuated case" — the frame depends only on q_l).
    """

    state: StateASR
    frame_id: int = dataclasses.field(metadata=dict(static=True))
    placement: SE3 = None   # target placement (pytree leaf)
    nu: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def nr(self) -> int:
        return 6

    def _rMf(self, kin):
        oMf = rbd.frame_placement_from_fk(self.state.robot, kin.rots, kin.trans, self.frame_id)
        return self.placement.inverse().compose(oMf)

    def calc(self, x, u, kin):
        return log6(self._rMf(kin))

    def calc_diff(self, x, u, kin):
        nl = self.state.nl
        rMf = self._rMf(kin)
        rJf = jlog6(rMf)
        fJf = rbd.frame_jacobian_local_from_fk(
            self.state.robot, kin.rots, kin.trans, self.frame_id, dtype=x.dtype)
        J = rJf @ fJf
        Rx = jnp.zeros((6, self.state.ndx), dtype=x.dtype)
        Rx = Rx.at[:, :nl].set(J)
        Ru = jnp.zeros((6, self.nu), dtype=x.dtype)
        return Rx, Ru


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ResidualModelDoublePendulum:
    """Swing-up residual ``r = [s1, s2, 1+c1, 1-c2, v1, v2]`` with analytic Rx.

    Reference ``python/aslr_to/residual_acrobot.py:5-29`` (including its
    sign conventions in calcDiff).
    """

    state: StateASR
    nu: int = dataclasses.field(metadata=dict(static=True))

    @property
    def nr(self) -> int:
        return 6

    def calc(self, x, u, kin):
        c1, c2 = jnp.cos(x[0]), jnp.cos(x[1])
        s1, s2 = jnp.sin(x[0]), jnp.sin(x[1])
        return jnp.stack([s1, s2, 1.0 + c1, 1.0 - c2, x[4], x[5]])

    def calc_diff(self, x, u, kin):
        c1, c2 = jnp.cos(x[0]), jnp.cos(x[1])
        s1, s2 = jnp.sin(x[0]), jnp.sin(x[1])
        Rx = jnp.zeros((6, self.state.ndx), dtype=x.dtype)
        Rx = Rx.at[0, 0].set(c1)
        Rx = Rx.at[1, 1].set(c2)
        Rx = Rx.at[2, 0].set(-s1)
        Rx = Rx.at[3, 1].set(s2)
        Rx = Rx.at[4, 4].set(1.0)
        Rx = Rx.at[5, 5].set(1.0)
        Ru = jnp.zeros((6, self.nu), dtype=x.dtype)
        return Rx, Ru


# ---------------------------------------------------------------------------
# cost models
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CostModelResidual:
    """cost = activation(residual(x, u)) with Gauss-Newton derivatives
    (crocoddyl ``CostModelResidual``)."""

    state: StateASR
    activation: object
    residual: object

    @property
    def nu(self) -> int:
        return self.residual.nu

    def calc(self, x, u, kin):
        return self.activation.calc(self.residual.calc(x, u, kin))

    def calc_diff(self, x, u, kin) -> CostDerivs:
        r = self.residual.calc(x, u, kin)
        Rx, Ru = self.residual.calc_diff(x, u, kin)
        Ar, Arr = self.activation.calc_diff(r)
        ArrRx = Arr[:, None] * Rx
        ArrRu = Arr[:, None] * Ru
        return CostDerivs(
            Lx=Rx.T @ Ar,
            Lu=Ru.T @ Ar,
            Lxx=Rx.T @ ArrRx,
            Lxu=Rx.T @ ArrRu,
            Luu=Ru.T @ ArrRu,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CostModelStiffness:
    """Linear cost on the stiffness half of the VSA control.

    ``r = lamda (K - Kref)``, ``cost = sum(r)``, ``Lu[nu/2:] = lamda``
    (linear, deliberately not quadratic — reference
    ``python/aslr_to/stiffness_cost.py:6-27``).
    """

    state: StateASR
    nu: int = dataclasses.field(metadata=dict(static=True))
    lamda: jnp.ndarray = 1.0
    Kref: jnp.ndarray = None

    def calc(self, x, u, kin):
        K = u[self.nu // 2:]
        Kref = jnp.zeros_like(K) if self.Kref is None else self.Kref
        return jnp.sum(self.lamda * (K - Kref))

    def calc_diff(self, x, u, kin) -> CostDerivs:
        d = zero_derivs(self.state.ndx, self.nu, x.dtype)
        half = self.nu // 2
        Lu = d.Lu.at[half:].set(jnp.asarray(self.lamda, dtype=x.dtype) * jnp.ones(self.nu - half, dtype=x.dtype))
        return d._replace(Lu=Lu)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CostModelDoublePendulum:
    """Legacy self-contained swing-up cost (``r = [s1,s2,1+c1,1+c2,v1,v2]``)
    with the reference's hand-rolled diagonal Lxx
    (``python/aslr_to/__init__.py:223-259``, formulas replicated verbatim,
    including their small-angle approximations)."""

    state: StateASR
    activation: object
    nu: int = dataclasses.field(metadata=dict(static=True))

    def _residual(self, x):
        c1, c2 = jnp.cos(x[0]), jnp.cos(x[1])
        s1, s2 = jnp.sin(x[0]), jnp.sin(x[1])
        return jnp.stack([s1, s2, 1.0 + c1, 1.0 + c2, x[4], x[5]])

    def calc(self, x, u, kin):
        return self.activation.calc(self._residual(x))

    def calc_diff(self, x, u, kin) -> CostDerivs:
        ndx = self.state.ndx
        c1, c2 = jnp.cos(x[0]), jnp.cos(x[1])
        s1, s2 = jnp.sin(x[0]), jnp.sin(x[1])
        r = self._residual(x)
        Ar, Arr = self.activation.calc_diff(r)

        Rx = jnp.zeros((6, ndx), dtype=x.dtype)
        Rx = Rx.at[0, 0].set(c1)
        Rx = Rx.at[1, 1].set(c2)
        Rx = Rx.at[2, 0].set(-s1)
        Rx = Rx.at[3, 1].set(-s2)
        Rx = Rx.at[4, 4].set(1.0)
        Rx = Rx.at[5, 5].set(1.0)
        Lx = Rx.T @ Ar

        # Reference's diagonal second-order model (__init__.py:249-253):
        # Lxx = diag(Rxx' diag(Arr)) with Rxx rows as below.
        Rxx = jnp.zeros((6, ndx), dtype=x.dtype)
        Rxx = Rxx.at[0, 0].set(c1 ** 2 - s1 ** 2)
        Rxx = Rxx.at[1, 1].set(c2 ** 2 - s2 ** 2)
        Rxx = Rxx.at[2, 0].set(s1 ** 2 + (1.0 - c1) * c1)
        Rxx = Rxx.at[3, 1].set(s2 ** 2 + (1.0 - c2) * c2)
        Rxx = Rxx.at[4, 4].set(1.0)
        Rxx = Rxx.at[5, 5].set(1.0)
        Lxx = jnp.diag(Rxx.T @ Arr)

        return CostDerivs(
            Lx=Lx,
            Lu=jnp.zeros(self.nu, dtype=x.dtype),
            Lxx=Lxx,
            Lxu=jnp.zeros((ndx, self.nu), dtype=x.dtype),
            Luu=jnp.zeros((self.nu, self.nu), dtype=x.dtype),
        )


# ---------------------------------------------------------------------------
# cost sum (crocoddyl.CostModelSum)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CostItem:
    name: str = dataclasses.field(metadata=dict(static=True))
    cost: object = None
    weight: jnp.ndarray = 1.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CostModelSum:
    """Weighted sum of cost models (crocoddyl ``CostModelSum``;
    reference usage ``examples/two_dof_sea.py:44-47``)."""

    state: StateASR
    nu: int = dataclasses.field(metadata=dict(static=True))
    items: Tuple[CostItem, ...] = ()

    def add_cost(self, name, cost, weight) -> "CostModelSum":
        """Functional addCost — returns a new CostModelSum."""
        return dataclasses.replace(
            self, items=self.items + (CostItem(name=name, cost=cost, weight=weight),))

    def calc(self, x, u, kin):
        total = jnp.asarray(0.0, dtype=x.dtype)
        for it in self.items:
            total = total + it.weight * it.cost.calc(x, u, kin)
        return total

    def calc_diff(self, x, u, kin) -> CostDerivs:
        acc = zero_derivs(self.state.ndx, self.nu, x.dtype)
        for it in self.items:
            d = it.cost.calc_diff(x, u, kin)
            acc = CostDerivs(*(a + it.weight * b for a, b in zip(acc, d)))
        return acc
