"""Per-knot MPC tracking: the SEA arm follows a moving frame target.

Demonstrates the per-knot heterogeneous problem API (new in this
framework; the reference expresses the same generality by attaching a
different cost model per node, e.g. ``two_dof_vsa_boxddp.py:59-60`` for
bounds): T distinct action models — here with the frame-placement target
swept along an arc — are stacked into one pytree (``stack_knots``) and the
solver vmaps/scans the model alongside the trajectory.

Run: python examples/mpc_tracking.py   (CPU f64 by default; TPU if present)
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from aslr_to_tpu.ops import rigid_body as rbd
from aslr_to_tpu.ops.se3 import SE3
from aslr_to_tpu.solvers.ddp import SolverSettings, solve
from aslr_to_tpu.solvers.problem import stack_knots
from aslr_to_tpu.workloads.presets import two_dof_sea


def main():
    T = 60
    w = two_dof_sea(T=T)
    base = w.problem.running

    # target arc: sweep y from 0.05 to 0.2 at fixed x/z
    def target_at(t):
        frac = t / T
        return jnp.asarray([0.01, 0.05 + 0.15 * frac, 0.18])

    def with_target(t):
        diff = base.differential
        items = []
        for it in diff.costs.items:
            c = it.cost
            if hasattr(c, "residual") and hasattr(c.residual, "placement"):
                res = dataclasses.replace(
                    c.residual,
                    placement=SE3(c.residual.placement.rot, target_at(t)))
                c = dataclasses.replace(c, residual=res)
            items.append(dataclasses.replace(it, cost=c))
        costs = dataclasses.replace(diff.costs, items=tuple(items))
        return dataclasses.replace(
            base, differential=dataclasses.replace(diff, costs=costs))

    running = stack_knots([with_target(t) for t in range(T)])
    prob = dataclasses.replace(w.problem, running=running, per_knot=True)

    res = jax.jit(lambda: solve(
        prob, settings=SolverSettings(maxiter=60, th_stop=1e-7),
        use_gaps=True))()

    print(f"converged={bool(res.converged)} iterations={int(res.iterations)} "
          f"cost={float(res.cost):.4f}")
    robot = w.problem.state.robot
    for t in (0, T // 2, T):
        q_l = res.xs[t][:2]
        ee = rbd.frame_placement(robot, q_l, w.ee_frame).trans
        tgt = target_at(min(t, T - 1))
        err = float(jnp.linalg.norm(ee - tgt))
        print(f"  t={t:3d}: EE={np.asarray(ee).round(4)} "
              f"target={np.asarray(tgt).round(4)} err={err:.4f}")


if __name__ == "__main__":
    main()
