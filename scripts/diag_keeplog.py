#!/usr/bin/env python
"""A/B the lane-path SolveLog cost on the bench workload (real TPU).

``build_lane_solver(keep_log=True)`` adds 7 dynamic [Bp]-row updates to
[maxiter, Bp] series per solver iteration plus ~2.4 MB of loop carry at
the bench config — this script measures what that costs end-to-end so
the keep_log default (off on the driver metric) is a recorded decision,
not a guess.

Usage: python scripts/diag_keeplog.py  (knobs: B, T, MAXITER, REPS, ROUNDS)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B = int(os.environ.get("B", "4096"))
T = int(os.environ.get("T", "100"))
MAXITER = int(os.environ.get("MAXITER", "20"))
REPS = int(os.environ.get("REPS", "8"))
ROUNDS = int(os.environ.get("ROUNDS", "3"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aslr_to_tpu.pallas.lane_solver import build_lane_solver
    from aslr_to_tpu.solvers.ddp import SolverSettings
    from aslr_to_tpu.utils.compilation_cache import enable
    from aslr_to_tpu.workloads.presets import two_dof_vsa_boxddp

    enable()
    jax.block_until_ready(jnp.zeros(()) + 1.0)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    w = two_dof_vsa_boxddp(T=T, dtype=dtype)
    settings = SolverSettings(maxiter=MAXITER, th_stop=1e-5, boxqp_warm_iters=2)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (B, 8), dtype=dtype)
    x0s_all = [x0s + jnp.asarray(1e-4 * (i + 1), dtype=dtype) for i in range(REPS)]
    jax.block_until_ready(x0s_all)

    results = {}
    for keep in (False, True):
        fn = build_lane_solver(w.problem, settings, bounds=w.bounds,
                               use_gaps=False, keep_log=keep)
        out = fn(x0s)
        jax.block_until_ready(out.cost)
        rates = []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            outs = [fn(x) for x in x0s_all]
            for o in outs:
                np.asarray(o.cost)
            rates.append(B * REPS / (time.perf_counter() - t0))
        print(f"keep_log={keep}: {['%.0f' % r for r in rates]} solves/s "
              f"(best {max(rates):.0f})", flush=True)
        results[keep] = (max(rates), out)
    print(f"keep_log cost: {1.0 - results[True][0] / results[False][0]:+.2%}")
    same = np.array_equal(np.asarray(results[True][1].cost),
                          np.asarray(results[False][1].cost), equal_nan=True)
    print(f"costs bit-identical across variants: {same}")


if __name__ == "__main__":
    main()
