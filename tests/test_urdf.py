"""URDF-lite parser tests: a URDF reproducing the registry double pendulum
must yield identical kinematics and dynamics."""
import jax.numpy as jnp
import numpy as np

from aslr_to_tpu.models import robots
from aslr_to_tpu.ops import rigid_body as rbd
from aslr_to_tpu.utils.urdf import parse_urdf

URDF = """
<robot name="double_pendulum">
  <link name="base_link"/>
  <joint name="joint1" type="revolute">
    <parent link="base_link"/><child link="link1"/>
    <origin xyz="0 0 0.1"/><axis xyz="0 1 0"/>
    <limit lower="-3.14" upper="3.14" effort="10" velocity="10"/>
  </joint>
  <link name="link1">
    <inertial>
      <origin xyz="0 0 0.1"/>
      <mass value="0.3"/>
      <inertia ixx="0.001" iyy="0.001" izz="1e-5" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="joint2" type="continuous">
    <parent link="link1"/><child link="link2"/>
    <origin xyz="0 0 0.2"/><axis xyz="0 1 0"/>
  </joint>
  <link name="link2">
    <inertial>
      <origin xyz="0 0 0.1"/>
      <mass value="0.3"/>
      <inertia ixx="0.001" iyy="0.001" izz="1e-5" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="tip_joint" type="fixed">
    <parent link="link2"/><child link="tip"/>
    <origin xyz="0 0 0.2"/>
  </joint>
  <link name="tip"/>
</robot>
"""


def test_urdf_matches_registry_double_pendulum():
    parsed = parse_urdf(URDF)
    reg = robots.double_pendulum()
    q = jnp.array([0.4, -0.9])
    v = jnp.array([0.3, 0.8])
    a = jnp.array([-0.2, 0.5])
    assert np.allclose(rbd.mass_matrix(parsed, q), rbd.mass_matrix(reg, q), atol=1e-12)
    assert np.allclose(
        rbd.nonlinear_effects(parsed, q, v), rbd.nonlinear_effects(reg, q, v), atol=1e-12)
    assert np.allclose(rbd.rnea(parsed, q, v, a), rbd.rnea(reg, q, v, a), atol=1e-12)
    tip_p = rbd.frame_placement(parsed, q, parsed.frame_id("tip"))
    tip_r = rbd.frame_placement(reg, q, reg.frame_id("tip"))
    assert np.allclose(tip_p.trans, tip_r.trans, atol=1e-12)
    assert np.allclose(tip_p.rot, tip_r.rot, atol=1e-12)


def test_urdf_rpy_origin():
    urdf = URDF.replace('<origin xyz="0 0 0.1"/><axis xyz="0 1 0"/>',
                        '<origin xyz="0 0 0.1" rpy="0 0 1.57"/><axis xyz="0 1 0"/>', 1)
    m = parse_urdf(urdf)
    R0 = np.asarray(m.joint_rot[0])
    assert np.allclose(R0[0, 0], np.cos(1.57), atol=1e-12)
    assert np.allclose(R0[1, 0], np.sin(1.57), atol=1e-12)
