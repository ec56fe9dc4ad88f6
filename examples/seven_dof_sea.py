"""7-DoF SEA arm reach — the reference's talos_arm-class generality as a
first-class example (its test-suite runs SEA dynamics at 7-DoF,
``unittest/test_asr_free_fwddyn.py:51``; it ships no 7-DoF example
script). FDDP, T=100, dt=1e-2, quasi-static warm start. Since round 5
this family runs the dimension-generic lane kernels at 2326 solves/s
batched (scripts/bench_7dof.py); this script is the single-solve,
reference-script-shaped view. Run with ``plot`` argv for figures.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from aslr_to_tpu.ops import rigid_body as rbd
from aslr_to_tpu.workloads.run import run_workload

WITHPLOT = "plot" in sys.argv


def main():
    out = run_workload("seven_dof_sea", verbose=True)
    res = out.result

    from aslr_to_tpu.workloads.presets import seven_dof_sea
    w = seven_dof_sea()
    robot = w.problem.state.robot
    ee0 = rbd.frame_placement(robot, w.problem.x0[:7], w.ee_frame).trans
    print("Initial position = ", np.asarray(ee0))
    print("Target position  = ", np.asarray(w.target))
    print("Finally reached = ", np.asarray(out.ee_final))
    print("converged:", bool(res.converged), "iterations:", int(res.iterations),
          "cost:", float(res.cost), "stop:", float(res.stop))
    print("printing usquared")
    print(float(jnp.sum(out.u_sq)))

    if WITHPLOT:
        from aslr_to_tpu.utils.plotting import plot_kkt_error, plot_oc_solution
        plot_oc_solution(res.xs, res.us, fig_index=1, show=False)
        plot_kkt_error(res.log.stops, fig_index=2, show=True)


if __name__ == "__main__":
    main()
