"""Per-knot MPC tracking: the SEA arm follows a moving frame target.

Demonstrates the per-knot heterogeneous problem API (new in this
framework; the reference expresses the same generality by attaching a
different cost model per node, e.g. ``two_dof_vsa_boxddp.py:59-60`` for
bounds): T distinct action models — here with the frame-placement target
swept along an arc — are stacked into one pytree (``stack_knots``) and the
solver vmaps/scans the model alongside the trajectory.

Per-knot problems run on the LANE path too (the target rides an SMEM
table through the fused kernels): set MPC_BATCH to time a batched
lane-path solve of this tracking problem at the production rate.

Run: python examples/mpc_tracking.py   (CPU f64 by default; TPU if present)
     MPC_BATCH=2048 python examples/mpc_tracking.py   (lane-path bench)
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from aslr_to_tpu.ops import rigid_body as rbd
from aslr_to_tpu.ops.se3 import SE3
from aslr_to_tpu.solvers.ddp import SolverSettings, solve
from aslr_to_tpu.solvers.problem import stack_knots
from aslr_to_tpu.workloads.presets import two_dof_sea


def bench_lane_batch(prob, B):
    """Batched lane-path solves of the per-knot tracking problem."""
    from aslr_to_tpu.parallel.batch import convergence_summary, make_batched_solver
    from aslr_to_tpu.utils.compilation_cache import enable

    enable()
    dtype = prob.x0.dtype
    fn = make_batched_solver(prob, SolverSettings(maxiter=30, th_stop=1e-5),
                             use_gaps=True, bounds=None, use_fast_path="lanes")
    x0s = prob.x0 + 0.05 * jax.random.normal(
        jax.random.PRNGKey(0), (B, prob.x0.shape[0]), dtype=dtype)
    out = fn(x0s)
    np.asarray(out.cost)            # compile + warm (fetch to host)
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(x0s + jnp.asarray(1e-4 * (i + 1), dtype))
        np.asarray(out.cost)
    rate = B * reps / (time.perf_counter() - t0)
    print(f"lane-path per-knot tracking: {rate:.0f} solves/s at B={B}, "
          f"convergence {convergence_summary(out)}")


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

    B = int(os.environ.get("MPC_BATCH", "0"))
    if B:
        bench_lane_batch(prob, B)
        return

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
