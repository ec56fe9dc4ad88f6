"""Robot model registry.

Self-contained replacement for the ``example_robot_data`` URDF loaders the
reference depends on (reference ``examples/two_dof_sea.py:18``,
``examples/double_pendulum.py:13``, ``CMakeLists.txt:25``).

``example_robot_data``'s URDF assets are not redistributable here, so the
registry carries explicit kinematic/inertial parameter structs:

  - ``asr_twodof``: 2-DoF planar soft arm. Geometry reconstructed from the
    reference's own FK printouts — at ``q = 0`` the "EE" frame sits at
    ``[-0.255, 2.03063311e-4, 0.18]`` (the commented target / initial
    placement in ``examples/two_dof_sea.py:35`` and the printed initial
    position), reach 0.255 m in the x-y plane with a 0.18 m z offset.
    Inertial parameters are plausible values for a small soft arm; exact
    URDF masses were not recoverable offline. Load a real URDF through
    ``aslr_to_tpu.utils.urdf`` for exact numerical parity.
  - ``double_pendulum``: 2-DoF pendulum matching the
    ``double_pendulum_description`` layout (two revolute joints, planar).
  - ``seven_dof_arm``: 7-DoF serial arm with non-trivial joint placements,
    standing in for ``talos_arm`` in derivative tests (reference
    ``unittest/test_asr_free_fwddyn.py:51``) — it exercises the same
    general-chain code paths.

All models are :class:`~aslr_to_tpu.ops.rigid_body.RobotModel` pytrees; use
``model.with_gravity([9.81, 0, 0])`` for the reference's gravity override
(``examples/two_dof_sea.py:20``).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.rigid_body import RobotModel


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def make_chain(
    name,
    joint_pos,
    joint_rot,
    axes,
    masses,
    coms,
    inertias,
    frames=(),
    gravity=(0.0, 0.0, -9.81),
    dtype=jnp.float64,
) -> RobotModel:
    """Build a serial-chain RobotModel (parent of joint i is i-1)."""
    nj = len(masses)
    frame_names = tuple(f[0] for f in frames)
    frame_parents = tuple(f[1] for f in frames)
    frame_rot = np.stack([np.asarray(f[2], dtype=np.float64) for f in frames]) if frames else np.zeros((0, 3, 3))
    frame_pos = np.stack([np.asarray(f[3], dtype=np.float64) for f in frames]) if frames else np.zeros((0, 3))
    as_inertia = []
    for I in inertias:
        I = np.asarray(I, dtype=np.float64)
        if I.ndim == 1:
            I = np.diag(I)
        as_inertia.append(I)
    return RobotModel(
        name=name,
        parents=tuple(range(-1, nj - 1)),
        frame_names=frame_names,
        frame_parents=frame_parents,
        joint_rot=jnp.asarray(np.stack([np.asarray(r, dtype=np.float64) for r in joint_rot]), dtype=dtype),
        joint_pos=jnp.asarray(np.stack([np.asarray(p, dtype=np.float64) for p in joint_pos]), dtype=dtype),
        axis=jnp.asarray(np.stack([np.asarray(a, dtype=np.float64) for a in axes]), dtype=dtype),
        mass=jnp.asarray(np.asarray(masses, dtype=np.float64), dtype=dtype),
        com=jnp.asarray(np.stack([np.asarray(c, dtype=np.float64) for c in coms]), dtype=dtype),
        inertia=jnp.asarray(np.stack(as_inertia), dtype=dtype),
        frame_rot=jnp.asarray(frame_rot, dtype=dtype),
        frame_pos=jnp.asarray(frame_pos, dtype=dtype),
        gravity=jnp.asarray(np.asarray(gravity, dtype=np.float64), dtype=dtype),
    )


def asr_twodof(dtype=jnp.float64) -> RobotModel:
    """2-DoF planar soft arm ('asr_twodof').

    Matches the reference workload geometry: planar motion in x-y (joints
    about +z), total reach 0.255 m pointing along -x at q=0, EE frame at
    z = 0.18 with the reference's small y offset, so FK(q=0) of "EE" equals
    the initial placement the reference prints
    (``examples/two_dof_sea.py:82``).
    """
    eye = np.eye(3)
    l1, l2 = 0.13, 0.125
    # Small off-axis offsets as in the real URDF (the reference's own FK
    # printout at q=0 is [-2.54999919e-01, 2.03063311e-04, 0.18] — not
    # perfectly axis-aligned). These break the exact gravity equilibrium at
    # q=0, which the VSA cold-start workload relies on to escape the
    # zero-stiffness saddle (examples/two_dof_vsa_boxddp.py solves from
    # us=0 where a perfectly symmetric arm would have zero gradient).
    return make_chain(
        name="asr_twodof",
        joint_pos=[[0.0, 0.0, 0.09], [-l1, 1.0e-04, 0.05]],
        joint_rot=[eye, eye],
        axes=[[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]],
        masses=[0.3, 0.25],
        coms=[[-l1 / 2, 5.0e-04, 0.02], [-l2 / 2, 5.0e-04, 0.02]],
        inertias=[
            [1e-5, 0.3 * l1 ** 2 / 12, 0.3 * l1 ** 2 / 12],
            [1e-5, 0.25 * l2 ** 2 / 12, 0.25 * l2 ** 2 / 12],
        ],
        frames=[("EE", 1, np.eye(3), [-l2, 1.03063311e-04, 0.04])],
        dtype=dtype,
    )


def double_pendulum(dtype=jnp.float64) -> RobotModel:
    """2-DoF pendulum ('double_pendulum').

    Planar in x-z (joints about +y); q=0 points up (+z), so the reference's
    initial state ``x0 = [3.14, 0, ...]`` (``examples/double_pendulum.py:52``)
    is the hanging configuration. Default gravity [0, 0, -9.81].
    """
    eye = np.eye(3)
    l1, l2 = 0.2, 0.2
    m1, m2 = 0.3, 0.3
    return make_chain(
        name="double_pendulum",
        joint_pos=[[0.0, 0.0, 0.1], [0.0, 0.0, l1]],
        joint_rot=[eye, eye],
        axes=[[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]],
        masses=[m1, m2],
        coms=[[0.0, 0.0, l1 / 2], [0.0, 0.0, l2 / 2]],
        inertias=[
            [m1 * l1 ** 2 / 12, m1 * l1 ** 2 / 12, 1e-5],
            [m2 * l2 ** 2 / 12, m2 * l2 ** 2 / 12, 1e-5],
        ],
        frames=[("tip", 1, np.eye(3), [0.0, 0.0, l2])],
        dtype=dtype,
    )


def seven_dof_arm(dtype=jnp.float64) -> RobotModel:
    """7-DoF serial arm with mixed axes and offsets (talos_arm stand-in).

    Used by the derivative test-suite the way the reference uses
    ``talos_arm`` (``unittest/test_asr_free_fwddyn.py:51``): a deeper chain
    with non-planar axes that exercises every branch of the generic
    dynamics kernels.
    """
    eye = np.eye(3)
    axes = [
        [0, 0, 1], [0, 1, 0], [1, 0, 0], [0, 1, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
    ]
    joint_pos = [
        [0.0, 0.0, 0.15],
        [0.02, 0.0, 0.1],
        [0.0, 0.02, 0.12],
        [0.1, 0.0, 0.02],
        [0.0, 0.0, 0.12],
        [0.08, 0.01, 0.0],
        [0.0, 0.0, 0.08],
    ]
    joint_rot = [eye, _rot_x(0.1), eye, _rot_y(-0.15), eye, _rot_x(0.05), eye]
    masses = [2.0, 1.5, 1.2, 1.0, 0.8, 0.5, 0.3]
    coms = [
        [0.0, 0.01, 0.06],
        [0.03, 0.0, 0.05],
        [0.0, 0.01, 0.06],
        [0.05, 0.0, 0.01],
        [0.0, 0.0, 0.06],
        [0.04, 0.0, 0.0],
        [0.0, 0.0, 0.04],
    ]
    inertias = [
        [8e-3, 8e-3, 3e-3],
        [6e-3, 6e-3, 2e-3],
        [5e-3, 5e-3, 2e-3],
        [4e-3, 4e-3, 1.5e-3],
        [3e-3, 3e-3, 1e-3],
        [1.5e-3, 1.5e-3, 6e-4],
        [8e-4, 8e-4, 4e-4],
    ]
    return make_chain(
        name="seven_dof_arm",
        joint_pos=joint_pos,
        joint_rot=joint_rot,
        axes=axes,
        masses=masses,
        coms=coms,
        inertias=inertias,
        frames=[("gripper", 6, np.eye(3), [0.0, 0.0, 0.08])],
        dtype=dtype,
    )


_REGISTRY = {
    "asr_twodof": asr_twodof,
    "double_pendulum": double_pendulum,
    "seven_dof_arm": seven_dof_arm,
}


def load(name: str, dtype=jnp.float64) -> RobotModel:
    """Load a named robot — replaces ``example_robot_data.load``."""
    try:
        return _REGISTRY[name](dtype=dtype)
    except KeyError:
        raise KeyError(f"unknown robot '{name}'; available: {sorted(_REGISTRY)}")
