#!/usr/bin/env python
"""Generate the T=100 golden fixtures (VERDICT r4 item 7).

Run from the repo root on CPU/f64 (the test environment's config):

    python tests/golden/gen_t100.py

Produces sea_T100.npz (cold quasi-static-warm FDDP solve, converges in
~43 iterations at th_stop=1e-7) and vsa_homotopy_T100.npz (the
production stiffness-bound continuation at the bench's 5x20 budget).
Regenerate deliberately only when an intentional algorithm change
shifts them; the point of the fixtures is to catch unintended semantic
drift in the fast tier.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from aslr_to_tpu.solvers.ddp import SolverSettings
from aslr_to_tpu.solvers.homotopy import homotopy_solve, stiffness_continuation
from aslr_to_tpu.workloads.presets import two_dof_sea, two_dof_vsa_boxddp
from aslr_to_tpu.workloads.run import solve_workload

HERE = os.path.dirname(__file__)


def main():
    w = two_dof_sea(T=100)
    res = solve_workload(w)
    assert bool(res.converged), "SEA T=100 must converge for a golden"
    np.savez(os.path.join(HERE, "sea_T100.npz"),
             cost=np.asarray(res.cost), us=np.asarray(res.us),
             iters=np.asarray(res.iterations))
    print(f"sea_T100: cost={float(res.cost):.6f} iters={int(res.iterations)}")

    v = two_dof_vsa_boxddp(T=100)
    scales, ub_stages = stiffness_continuation(v.problem, v.bounds)
    hres = jax.jit(lambda p: homotopy_solve(
        p, settings=SolverSettings(maxiter=20, th_stop=1e-5),
        use_gaps=False, bounds=v.bounds, scales=scales,
        ub_stages=ub_stages))(v.problem)
    np.savez(os.path.join(HERE, "vsa_homotopy_T100.npz"),
             cost=np.asarray(hres.cost), us=np.asarray(hres.us),
             iters=np.asarray(hres.iterations))
    print(f"vsa_homotopy_T100: cost={float(hres.cost):.6f} "
          f"iters={int(hres.iterations)} diverged={bool(hres.diverged)}")


if __name__ == "__main__":
    main()
