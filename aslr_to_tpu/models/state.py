"""State spaces for soft-actuated and rigid multibody systems.

TPU-native replacement for the reference's ``StateMultibodyASR``
(``python/aslr_to/statemultibody_aslr.py:13-109``) and Crocoddyl's
``StateMultibody`` (used by the condensed-formulation tests,
``unittest/test_softdyn_residual.py:16``).

The soft-robot state is ``x = [q_l, q_m, v_l, v_m]`` — link configuration,
motor configuration, and their velocities (``nx = 2(nq + nv)``,
``ndx = 4 nv`` in the reference's terms). For the revolute-chain robots in
the registry the configuration manifold is Euclidean, so ``integrate``/
``diff`` reduce to vector addition/subtraction with identity Jacobians —
but the API stays manifold-shaped (diff/integrate/Jdiff/Jintegrate) so
SO(2)/SE(3) joints can slot in later, exactly as the reference keeps the
Pinocchio Lie API for what is effectively vector data (SURVEY §2.2).

All methods are pure and jit/vmap-safe; classes are frozen dataclasses
registered as pytrees.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.rigid_body import RobotModel


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StateASR:
    """Soft-robot augmented state ``x = [q_l, q_m, v_l, v_m]``."""

    robot: RobotModel

    @property
    def nl(self) -> int:
        """Link-side DoF count (= robot nv)."""
        return self.robot.nv

    @property
    def nq(self) -> int:
        """Configuration size of the augmented state (link + motor)."""
        return 2 * self.robot.nq

    @property
    def nv(self) -> int:
        """Velocity size of the augmented state (link + motor)."""
        return 2 * self.robot.nv

    @property
    def nx(self) -> int:
        return self.nq + self.nv

    @property
    def ndx(self) -> int:
        return 2 * self.nv

    # -- splitting helpers -------------------------------------------------

    def split(self, x):
        """x -> (q_l, q_m, v_l, v_m)."""
        nl = self.nl
        return x[..., :nl], x[..., nl:2 * nl], x[..., 2 * nl:3 * nl], x[..., 3 * nl:]

    # -- Lie-structured API ------------------------------------------------

    def zero(self):
        return jnp.zeros(self.nx, dtype=self.robot.gravity.dtype)

    def rand(self, key):
        return jax.random.uniform(key, (self.nx,), dtype=self.robot.gravity.dtype, minval=-1.0, maxval=1.0)

    def diff(self, x0, x1):
        """Tangent vector from x0 to x1 (Euclidean configs: x1 - x0)."""
        return x1 - x0

    def integrate(self, x, dx):
        return x + dx

    def jdiff(self, x0, x1):
        """(d diff/d x0, d diff/d x1) — identity blocks for Euclidean configs.

        Mirrors ``StateMultibodyASR.Jdiff`` (reference
        ``statemultibody_aslr.py:63-90``) which returns ``(-I, I)`` here.
        """
        eye = jnp.eye(self.ndx, dtype=x0.dtype)
        return -eye, eye

    def jintegrate(self, x, dx):
        """(d integrate/d x, d integrate/d dx) — identities (reference
        ``statemultibody_aslr.py:92-109``)."""
        eye = jnp.eye(self.ndx, dtype=x.dtype)
        return eye, eye


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StateMultibody:
    """Rigid-robot state ``x = [q, v]`` (Crocoddyl ``StateMultibody``)."""

    robot: RobotModel

    @property
    def nq(self) -> int:
        return self.robot.nq

    @property
    def nv(self) -> int:
        return self.robot.nv

    @property
    def nx(self) -> int:
        return self.nq + self.nv

    @property
    def ndx(self) -> int:
        return 2 * self.nv

    def split(self, x):
        return x[..., :self.nq], x[..., self.nq:]

    def zero(self):
        return jnp.zeros(self.nx, dtype=self.robot.gravity.dtype)

    def rand(self, key):
        return jax.random.uniform(key, (self.nx,), dtype=self.robot.gravity.dtype, minval=-1.0, maxval=1.0)

    def diff(self, x0, x1):
        return x1 - x0

    def integrate(self, x, dx):
        return x + dx

    def jdiff(self, x0, x1):
        eye = jnp.eye(self.ndx, dtype=x0.dtype)
        return -eye, eye

    def jintegrate(self, x, dx):
        eye = jnp.eye(self.ndx, dtype=x.dtype)
        return eye, eye
