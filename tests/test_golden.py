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


def test_sea_T100_golden_trajectory():
    """T=100 production-scale golden in the FAST tier (VERDICT r4 item
    7): the cold quasi-static-warm SEA solve converges in 43 iterations
    to the known f64 answer (cost 64.98, docs/BENCH.md) — semantic
    drift in any solver layer shows up here within minutes, without
    RUN_SLOW. Regenerate deliberately: tests/golden/gen_t100.py."""
    ref = np.load(os.path.join(GOLDEN, "sea_T100.npz"))
    w = two_dof_sea(T=100)
    res = solve_workload(w)
    assert bool(res.converged)
    assert np.allclose(float(res.cost), float(ref["cost"]), rtol=1e-8)
    assert np.allclose(np.asarray(res.us), ref["us"], atol=1e-6)
    assert int(res.iterations) == int(ref["iters"])


def test_vsa_homotopy_T100_golden_trajectory():
    """T=100 staged stiffness-bound continuation golden (the quality
    metric's schedule at the bench's per-stage budget, single scenario,
    f64). Pins the homotopy stack end-to-end: stage scales, per-stage
    boxes, warm-start threading."""
    from aslr_to_tpu.solvers.homotopy import (homotopy_solve,
                                              stiffness_continuation)

    ref = np.load(os.path.join(GOLDEN, "vsa_homotopy_T100.npz"))
    w = two_dof_vsa_boxddp(T=100)
    scales, ub_stages = stiffness_continuation(w.problem, w.bounds)
    res = jax.jit(lambda p: homotopy_solve(
        p, settings=SolverSettings(maxiter=20, th_stop=1e-5),
        use_gaps=False, bounds=w.bounds, scales=scales,
        ub_stages=ub_stages))(w.problem)
    assert not bool(res.diverged)
    assert np.allclose(float(res.cost), float(ref["cost"]), rtol=1e-8)
    assert np.allclose(np.asarray(res.us), ref["us"], atol=1e-6)
    assert int(res.iterations) == int(ref["iters"])
