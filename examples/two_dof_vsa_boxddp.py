"""2-DoF VSA reach with BoxDDP — TPU-native version of the reference's
``examples/two_dof_vsa_boxddp.py``: T=200, dt=1e-2, u in [-100,100]^2,
K in [0,100]^2, cold start, maxiter=400. Exports .mat files like the
reference (:125-127). Run with ``plot`` for figures.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys

import jax.numpy as jnp
import numpy as np

from aslr_to_tpu.utils.io import export_mat
from aslr_to_tpu.utils.metrics import u_squared
from aslr_to_tpu.workloads.run import run_workload

WITHPLOT = "plot" in sys.argv
# "homotopy": ramp the terminal goal weight with warm-started stages —
# same iteration budget, much better local solution on this cold-started
# workload (the reference's own BoxDDP stalls here; see solvers/homotopy.py)
GLOBALIZATION = "homotopy" if "homotopy" in sys.argv else None


def main():
    out = run_workload("two_dof_vsa_boxddp", globalization=GLOBALIZATION)
    res = out.result
    print("Finally reached = ", np.asarray(out.ee_final))
    print("iterations:", int(res.iterations), "cost:", float(res.cost))
    print(float(jnp.sum(out.u_sq[:2])))

    export_mat("optimised_trajectory_vsa.mat", res.xs, res.us, 1e-2)

    if WITHPLOT:
        from aslr_to_tpu.utils.plotting import plot_oc_solution
        plot_oc_solution(res.xs, res.us, stiffness=True, fig_index=1, show=True)


if __name__ == "__main__":
    main()
