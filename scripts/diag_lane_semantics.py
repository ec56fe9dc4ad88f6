#!/usr/bin/env python
"""Pinpoint the fast-path vs XLA discrepancy: compare lane dynamics and
lane goal-cost against the XLA models pointwise in f64."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from aslr_to_tpu.pallas import vsa_kernels as vk
from aslr_to_tpu.workloads.presets import two_dof_vsa_boxddp

dtype = jnp.float64
w = two_dof_vsa_boxddp(T=12, dtype=dtype)
p = w.problem
diff_model = p.running.differential
spec = vk.extract_vsa_spec(p, w.bounds)

N = 512
key = jax.random.PRNGKey(0)
xscale = float(os.environ.get("XSCALE", "0.5"))
x = xscale * jax.random.normal(key, (N, 8), dtype=dtype)
u = jnp.concatenate([
    5.0 * jax.random.normal(jax.random.PRNGKey(1), (N, 2), dtype=dtype),
    3.0 + 2.0 * jax.random.uniform(jax.random.PRNGKey(2), (N, 2), dtype=dtype),
], axis=-1)

# --- dynamics ---
a_ref = jax.vmap(lambda xx, uu: diff_model.calc(xx, uu).xout)(x, u)
xl = [x[:, i] for i in range(8)]
ul = [u[:, i] for i in range(4)]
a_lane = jnp.stack(vk._dynamics_lanes(spec, xl, ul), axis=-1)
d = np.abs(np.asarray(a_lane) - np.asarray(a_ref))
print("dynamics max abs diff:", d.max(), "at", np.unravel_index(d.argmax(), d.shape))

# --- running cost ---
c_ref = jax.vmap(lambda xx, uu: diff_model.calc(xx, uu).cost)(x, u)
c_lane = vk._running_cost_lanes(spec, xl, ul)
dc = np.abs(np.asarray(c_lane) - np.asarray(c_ref))
rc = dc / np.maximum(np.abs(np.asarray(c_ref)), 1e-9)
print("running cost: max abs diff", dc.max(), "max rel", rc.max(),
      "at", rc.argmax(), "cost there", float(c_ref[rc.argmax()]))

# --- goal cost alone ---
from aslr_to_tpu.ops.rigid_body import frame_placement
from aslr_to_tpu.ops.se3 import SE3, log6

robot = p.state.robot
target = SE3(jnp.eye(3, dtype=dtype), jnp.asarray(spec.target_pos, dtype=dtype))

def ref_goal(xx):
    oMf = frame_placement(robot, xx[:2], spec.frame_id)
    rMf = target.inverse().compose(oMf)
    r = log6(rMf)
    return 0.5 * jnp.sum(r * r), r

cg_ref, r_ref = jax.vmap(ref_goal)(x)
cg_lane, r6 = vk._goal_cost_lanes(spec, [x[:, 0], x[:, 1]])
r_lane = jnp.stack(r6, axis=-1)
dg = np.abs(np.asarray(cg_lane) - np.asarray(cg_ref))
dr = np.abs(np.asarray(r_lane) - np.asarray(r_ref))
i = dg.argmax()
print("goal cost: max abs diff", dg.max(), "rel", (dg / np.maximum(np.abs(np.asarray(cg_ref)), 1e-12)).max())
print("residual max abs diff", dr.max(), "worst q_l:", np.asarray(x[i, :2]), "cost", float(cg_ref[i]))
j = np.unravel_index(dr.argmax(), dr.shape)
print("worst residual at sample", j, "q_l:", np.asarray(x[j[0], :2]),
      "r_ref", np.asarray(r_ref[j[0]]), "r_lane", np.asarray(r_lane[j[0]]))
