"""2-DoF VSA with joint trajectory+stiffness optimization — TPU-native
version of the reference's ``examples/two_dof_vsa_modified.py``: linear
stiffness cost (lambda=10), stiffness lower bound 0.002, BoxDDP, T=200.
Run with ``plot`` for figures.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys

import jax.numpy as jnp
import numpy as np

from aslr_to_tpu.utils.metrics import u_squared
from aslr_to_tpu.workloads.run import run_workload

WITHPLOT = "plot" in sys.argv


def main():
    out = run_workload("two_dof_vsa_modified")
    res = out.result
    print("Finally reached = ", np.asarray(out.ee_final))
    print("iterations:", int(res.iterations), "cost:", float(res.cost))
    print("printing usquared")
    print(float(jnp.sum(out.u_sq)))

    from aslr_to_tpu.utils.plotting import plot_stiffness
    if WITHPLOT:
        plot_stiffness(res.us, show=False)
        from aslr_to_tpu.utils.plotting import plot_oc_solution
        plot_oc_solution(res.xs, res.us, stiffness=True, fig_index=1, show=True)


if __name__ == "__main__":
    main()
