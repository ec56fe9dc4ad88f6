"""2-DoF SEA arm reach — TPU-native version of the reference's
``examples/two_dof_sea.py``: FDDP, T=100, dt=1e-2, quasi-static warm
start, th_stop=1e-7. Prints initial/final EE placement and control effort
like the reference (:82-93). Run with ``plot`` argv for figures.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from aslr_to_tpu.ops import rigid_body as rbd
from aslr_to_tpu.utils.metrics import u_squared
from aslr_to_tpu.workloads.run import run_workload

WITHPLOT = "plot" in sys.argv


def main():
    out = run_workload("two_dof_sea", verbose=True)
    res = out.result

    from aslr_to_tpu.workloads.presets import two_dof_sea
    w = two_dof_sea()
    robot = w.problem.state.robot
    ee0 = rbd.frame_placement(robot, w.problem.x0[:2], w.ee_frame).trans
    print("Initial position = ", np.asarray(ee0))
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
