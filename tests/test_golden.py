"""Golden control-trajectory regression fixtures (SURVEY §4 implication (c)).

The reference publishes no trajectories; these fixtures pin OUR solver's
output on fixed configs so solver refactors that change the math get
caught. Regenerate deliberately with tests/golden/ generation commands in
git history if an intentional algorithm change shifts them.
"""
import os

import jax
import numpy as np

from aslr_to_tpu.solvers.ddp import SolverSettings, solve
from aslr_to_tpu.workloads.presets import two_dof_sea, two_dof_vsa_boxddp
from aslr_to_tpu.workloads.run import solve_workload

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_vsa_boxddp_golden_trajectory():
    ref = np.load(os.path.join(GOLDEN, "vsa_boxddp_T30.npz"))
    w = two_dof_vsa_boxddp(T=30)
    res = jax.jit(lambda p: solve(
        p, settings=SolverSettings(maxiter=25, th_stop=1e-7),
        use_gaps=False, bounds=w.bounds))(w.problem)
    assert np.allclose(float(res.cost), float(ref["cost"]), rtol=1e-8)
    assert np.allclose(np.asarray(res.us), ref["us"], atol=1e-6)
    assert int(res.iterations) == int(ref["iters"])


def test_sea_golden_trajectory():
    ref = np.load(os.path.join(GOLDEN, "sea_T40.npz"))
    w = two_dof_sea(T=40)._replace(maxiter=60)
    res = solve_workload(w)
    assert np.allclose(float(res.cost), float(ref["cost"]), rtol=1e-8)
    assert np.allclose(np.asarray(res.us), ref["us"], atol=1e-6)
    assert int(res.iterations) == int(ref["iters"])
