"""URDF-lite parser: URDF XML -> RobotModel.

Replaces the ``example_robot_data`` / Pinocchio URDF loading path
(reference ``examples/two_dof_sea.py:18``) for the fixed-base serial
chains this framework targets. Supports revolute/continuous joints with
``<origin>`` (xyz + rpy), ``<axis>``, ``<inertial>`` (mass, com origin,
full inertia tensor), and fixed joints (folded into frames). Use this to
load the *real* ``asr_twodof``/``double_pendulum`` URDFs for exact
numerical parity with the reference when the assets are available; the
registry in ``models/robots.py`` carries reconstructed parameters
otherwise.
"""
from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import jax.numpy as jnp

from ..ops.rigid_body import RobotModel


def _rpy_to_matrix(r, p, y):
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return Rz @ Ry @ Rx


def _parse_origin(el):
    if el is None:
        return np.eye(3), np.zeros(3)
    xyz = np.array([float(v) for v in el.get("xyz", "0 0 0").split()])
    rpy = [float(v) for v in el.get("rpy", "0 0 0").split()]
    return _rpy_to_matrix(*rpy), xyz


def _parse_inertial(link_el):
    inertial = link_el.find("inertial")
    if inertial is None:
        return 0.0, np.zeros(3), np.zeros((3, 3)), np.eye(3)
    mass = float(inertial.find("mass").get("value"))
    R, com = _parse_origin(inertial.find("origin"))
    iel = inertial.find("inertia")
    ixx = float(iel.get("ixx", 0))
    iyy = float(iel.get("iyy", 0))
    izz = float(iel.get("izz", 0))
    ixy = float(iel.get("ixy", 0))
    ixz = float(iel.get("ixz", 0))
    iyz = float(iel.get("iyz", 0))
    I = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
    # inertia given in the inertial frame; rotate into the link frame
    return mass, com, R @ I @ R.T, R


def parse_urdf(source: str, gravity=(0.0, 0.0, -9.81), dtype=jnp.float64) -> RobotModel:
    """Parse a URDF string or file path into a RobotModel.

    The robot must be a fixed-base serial chain of revolute/continuous
    joints (fixed joints become frames; other joint types raise).
    """
    if "<robot" not in source:
        with open(source) as f:
            source = f.read()
    root = ET.fromstring(source)
    name = root.get("name", "urdf_robot")

    links = {l.get("name"): l for l in root.findall("link")}
    joints = root.findall("joint")

    # child link -> (joint element); find root link (never a child)
    children = {j.find("child").get("link") for j in joints}
    roots = [ln for ln in links if ln not in children]
    if len(roots) != 1:
        raise ValueError(f"expected one root link, got {roots}")

    # walk the chain from the root
    by_parent = {}
    for j in joints:
        by_parent.setdefault(j.find("parent").get("link"), []).append(j)

    joint_pos, joint_rot, axes, masses, coms, inertias = [], [], [], [], [], []
    frames = []
    parent_joint_idx = -1
    # accumulated fixed-joint transform to apply to the next moving joint
    acc_R, acc_p = np.eye(3), np.zeros(3)

    link_name = roots[0]
    while True:
        js = by_parent.get(link_name, [])
        if not js:
            break
        if len(js) > 1:
            raise ValueError("branching kinematic trees are not supported yet")
        j = js[0]
        jtype = j.get("type")
        R, p = _parse_origin(j.find("origin"))
        R, p = acc_R @ R, acc_R @ p * 1.0 + acc_p
        child = j.find("child").get("link")

        if jtype == "fixed":
            # fold into the accumulated transform; expose as a frame
            frames.append((j.get("name", child), parent_joint_idx if parent_joint_idx >= 0 else 0, R, p))
            frames.append((child, parent_joint_idx if parent_joint_idx >= 0 else 0, R, p))
            acc_R, acc_p = R, p
            link_name = child
            continue
        if jtype not in ("revolute", "continuous"):
            raise ValueError(f"unsupported joint type '{jtype}'")

        axis_el = j.find("axis")
        axis = np.array([float(v) for v in (axis_el.get("xyz", "1 0 0") if axis_el is not None else "1 0 0").split()])
        axis = axis / np.linalg.norm(axis)

        mass, com, I, _ = _parse_inertial(links[child])
        joint_pos.append(p)
        joint_rot.append(R)
        axes.append(axis)
        masses.append(mass)
        coms.append(com)
        inertias.append(I)
        parent_joint_idx += 1
        acc_R, acc_p = np.eye(3), np.zeros(3)
        # the child link's frame is also addressable
        frames.append((child, parent_joint_idx, np.eye(3), np.zeros(3)))
        link_name = child

    nj = len(masses)
    frame_names, frame_parents, f_rot, f_pos = [], [], [], []
    for (fname, fparent, R, p) in frames:
        if fname in frame_names:
            continue
        frame_names.append(fname)
        frame_parents.append(min(fparent, nj - 1))
        f_rot.append(R)
        f_pos.append(p)

    return RobotModel(
        name=name,
        parents=tuple(range(-1, nj - 1)),
        frame_names=tuple(frame_names),
        frame_parents=tuple(frame_parents),
        joint_rot=jnp.asarray(np.stack(joint_rot), dtype=dtype),
        joint_pos=jnp.asarray(np.stack(joint_pos), dtype=dtype),
        axis=jnp.asarray(np.stack(axes), dtype=dtype),
        mass=jnp.asarray(np.asarray(masses), dtype=dtype),
        com=jnp.asarray(np.stack(coms), dtype=dtype),
        inertia=jnp.asarray(np.stack(inertias), dtype=dtype),
        frame_rot=jnp.asarray(np.stack(f_rot), dtype=dtype),
        frame_pos=jnp.asarray(np.stack(f_pos), dtype=dtype),
        gravity=jnp.asarray(np.asarray(gravity, dtype=np.float64), dtype=dtype),
    )
