#!/usr/bin/env python
"""A/B the diverged-lane rescue pass on the quality metric (real TPU).

The driver JSON's quality metric (VSA 5-stage stiffness-bound homotopy,
20 iters/stage, B=4096) carries a ~7.9% diverged tail that equal-budget
f64 shares (docs/BENCH.md) — but a production framework can re-solve
exactly those lanes under a tighter schedule for a small, honestly-timed
surcharge. Variants:

- base:        stiffness_continuation schedule, no rescue
- rescue:      + rescue pass (rescue_continuation, R lanes)
- capN+rescue: + doomed-lane retirement inside the stages (the retired
               lanes land in the rescue set)

Usage: python scripts/diag_rescue.py  (knobs: B, T, MAXITER, REPS, ROUNDS,
R, CAPS env; CAPS=0,8 etc. — every cap variant includes the rescue)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B = int(os.environ.get("B", "4096"))
T = int(os.environ.get("T", "100"))
MAXITER = int(os.environ.get("MAXITER", "20"))
REPS = int(os.environ.get("REPS", "6"))
ROUNDS = int(os.environ.get("ROUNDS", "2"))
R = int(os.environ.get("R", "512"))
CAPS = [int(c) for c in os.environ.get("CAPS", "0,4,8").split(",")]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aslr_to_tpu.parallel.batch import make_batched_solver
    from aslr_to_tpu.solvers.ddp import SolverSettings
    from aslr_to_tpu.solvers.homotopy import (rescue_continuation,
                                              stiffness_continuation)
    from aslr_to_tpu.utils.compilation_cache import enable
    from aslr_to_tpu.workloads.presets import two_dof_vsa_boxddp

    enable()
    jax.block_until_ready(jnp.zeros(()) + 1.0)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    w = two_dof_vsa_boxddp(T=T, dtype=dtype)
    hscales, hub = stiffness_continuation(w.problem, w.bounds)
    rscales, rub = rescue_continuation(w.problem, w.bounds)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (B, 8), dtype=dtype)
    x0s_all = [x0s + jnp.asarray(1e-4 * (i + 1), dtype=dtype) for i in range(REPS)]
    jax.block_until_ready(x0s_all)

    def timed(fn):
        out = fn(x0s)
        jax.block_until_ready(out.cost)
        rates = []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            outs = [fn(x) for x in x0s_all]
            for o in outs:
                np.asarray(o.cost)
            rates.append(B * REPS / (time.perf_counter() - t0))
        return rates, out

    variants = [("base", 0, 0)]
    for cap in CAPS:
        variants.append((f"cap{cap}+rescue{R}", cap, R))
    for label, cap, rr in variants:
        settings = SolverSettings(maxiter=MAXITER, th_stop=1e-5,
                                  boxqp_warm_iters=2,
                                  doomed_reject_iters=cap)
        t0 = time.perf_counter()
        fn = make_batched_solver(
            w.problem, settings, use_gaps=False, bounds=w.bounds,
            use_fast_path="lanes", globalization="homotopy",
            scales=hscales, ub_stages=hub,
            rescue_scales=rscales if rr else None,
            rescue_ub_stages=rub if rr else None, rescue_size=rr)
        rates, out = timed(fn)
        div = np.asarray(out.diverged)
        cost = np.asarray(out.cost)
        print(f"{label:>14}: {['%.0f' % r for r in rates]} solves/s "
              f"(best {max(rates):.0f}) div {div.mean():.2%} "
              f"median_cost {np.median(cost):.2f} "
              f"median(alive) {np.median(cost[~div]):.2f} "
              f"p90(alive) {np.percentile(cost[~div], 90):.1f} "
              f"[{time.perf_counter() - t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
