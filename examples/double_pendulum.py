"""Soft-actuated double-pendulum swing-up — TPU-native version of the
reference's ``examples/double_pendulum.py``: FDDP, T=10, dt=1e-2,
underactuated (first joint motor only). Run with ``plot`` for figures.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys

import numpy as np

from aslr_to_tpu.workloads.run import run_workload

WITHPLOT = "plot" in sys.argv


def main():
    out = run_workload("double_pendulum")
    res = out.result
    it = int(res.iterations)
    print("iterations:", it, "cost:", float(res.cost), "converged:", bool(res.converged))
    print("final state:", np.asarray(res.xs[-1]).round(4))

    if WITHPLOT:
        from aslr_to_tpu.utils.plotting import plot_convergence, plot_oc_solution
        plot_oc_solution(res.xs, res.us, fig_index=1, show=False)
        plot_convergence(res.log, fig_index=2, show=True)


if __name__ == "__main__":
    main()
