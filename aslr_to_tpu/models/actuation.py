"""Actuation maps: motor inputs -> generalized torques on the soft state.

TPU-native replacement for the reference's actuation models
(``python/aslr_to/actuation_asr.py``, ``actuation_vsa.py``, and
``ActuationModelDoublePendulum`` in ``python/aslr_to/__init__.py:262-290``).

An actuation model maps ``(x_m, u)`` to the full-state torque vector
``tau`` of size ``state.nv = 2 nl`` — link-side torques first, motor-side
second. All reference models are state-independent linear maps, so
``calc_diff`` returns the constant ``dtau_du``.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .state import StateASR


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ASRActuation:
    """Motor-side torque actuation for SEA robots: ``tau = [0; u]``.

    Reference ``python/aslr_to/actuation_asr.py:5-13``.
    """

    state: StateASR

    @property
    def nu(self) -> int:
        return self.state.nl

    def calc(self, x_m, u):
        nl = self.state.nl
        return jnp.concatenate([jnp.zeros(nl, dtype=u.dtype), u[:nl]])

    def calc_diff(self, x_m, u):
        nl = self.state.nl
        dtype = u.dtype if hasattr(u, "dtype") else self.state.robot.gravity.dtype
        return jnp.concatenate([jnp.zeros((nl, nl), dtype=dtype), jnp.eye(nl, dtype=dtype)], axis=0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VSAASRActuation:
    """Motor-torque half of the VSA control (stiffness handled inside the
    VSA dynamics model, not here — mirroring the reference split,
    ``python/aslr_to/actuation_vsa.py:5-13``)."""

    state: StateASR

    @property
    def nu(self) -> int:
        return self.state.nl

    def calc(self, x_m, u):
        nl = self.state.nl
        return jnp.concatenate([jnp.zeros(nl, dtype=u.dtype), u[:nl]])

    def calc_diff(self, x_m, u):
        nl = self.state.nl
        dtype = u.dtype if hasattr(u, "dtype") else self.state.robot.gravity.dtype
        return jnp.concatenate([jnp.zeros((nl, nl), dtype=dtype), jnp.eye(nl, dtype=dtype)], axis=0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ActuationModelDoublePendulum:
    """Selection-matrix actuation for underactuated pendulums.

    ``tau = S u`` with ``S`` picking one motor-side joint
    (reference ``python/aslr_to/__init__.py:262-290``; ``act_link`` selects
    which joint as in the reference's data constructor at :281-289).
    """

    state: StateASR
    act_link: int = dataclasses.field(metadata=dict(static=True))
    nu_: int = dataclasses.field(metadata=dict(static=True), default=2)

    @property
    def nu(self) -> int:
        return self.nu_

    def _S(self, dtype):
        nv = self.state.nv
        S = jnp.zeros((nv, self.nu_), dtype=dtype)
        if self.act_link == 1:
            S = S.at[-1, -1].set(1.0)
        else:
            S = S.at[nv // 2, 0].set(1.0)
        return S

    def calc(self, x_m, u):
        return self._S(u.dtype) @ u

    def calc_diff(self, x_m, u):
        dtype = u.dtype if hasattr(u, "dtype") else self.state.robot.gravity.dtype
        return self._S(dtype)
