#!/usr/bin/env python
"""Isolate the homotopy quality-median shift seen in the round-3 bench.

Round 2 recorded the VSA staged-homotopy (5x20) median cost 628 at B=2048
with cold 6-iteration BoxQPs; the round-3 bench (B=4096, boxqp_warm_iters=2)
recorded 823.5 with 15.3% divergence. Two variables changed — batch
population and the QP warm start. This runs the homotopy config on the TPU
lane path at a fixed batch for warm in {0, 2} (and optionally both batch
sizes) and prints the convergence summaries side by side.

Usage: python scripts/diag_homotopy_warm.py   (env: DH_BATCH, DH_REPS)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aslr_to_tpu.parallel.batch import convergence_summary, make_batched_solver
    from aslr_to_tpu.solvers.ddp import SolverSettings
    from aslr_to_tpu.solvers.homotopy import stiffness_continuation
    from aslr_to_tpu.utils.compilation_cache import enable
    from aslr_to_tpu.workloads.presets import two_dof_vsa_boxddp

    enable()
    jax.block_until_ready(jnp.zeros(()) + 1.0)

    dtype = jnp.float32
    batches = [int(b) for b in os.environ.get("DH_BATCH", "2048,4096").split(",")]
    reps = int(os.environ.get("DH_REPS", "3"))
    T = 100
    w = two_dof_vsa_boxddp(T=T, dtype=dtype)
    nx = w.problem.state.nx
    # DH_CONT=1: the production stiffness-bound continuation stages
    cont = os.environ.get("DH_CONT", "1") == "1"
    hscales, hub = (stiffness_continuation(w.problem, w.bounds)
                    if cont else (None, None))

    for B in batches:
        x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (B, nx), dtype=dtype)
        for warm in (0, 2):
            settings = SolverSettings(maxiter=20, th_stop=1e-5,
                                      use_pallas_backward=True,
                                      boxqp_warm_iters=warm)
            fn = make_batched_solver(w.problem, settings, use_gaps=False,
                                     bounds=w.bounds, use_fast_path="lanes",
                                     globalization="homotopy",
                                     scales=hscales, ub_stages=hub)
            out = fn(x0s)
            np.asarray(out.cost)
            t0 = time.perf_counter()
            for i in range(reps):
                out = fn(x0s + jnp.asarray(1e-4 * (i + 1), dtype=dtype))
                np.asarray(out.cost)
            rate = B * reps / (time.perf_counter() - t0)
            s = convergence_summary(out)
            print(json.dumps({"B": B, "qp_warm": warm, "continuation": cont,
                              "solves_per_s": round(rate, 1),
                              "median_cost": round(s["median_cost"], 2),
                              "diverged_frac": round(s["diverged_frac"], 4)}),
                  flush=True)


if __name__ == "__main__":
    main()
