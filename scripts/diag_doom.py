#!/usr/bin/env python
"""A/B doomed-lane early retirement on the bench workload (real TPU).

Sweeps ``SolverSettings.doomed_reject_iters`` at the driver bench config
(VSA cold BoxDDP, B=4096, T=100, maxiter=20, f32) and reports throughput
plus the convergence stats the retirement must NOT change: converged
fraction, median/p90 cost over surviving lanes, and the overlap between
the lanes each cap retires and the baseline's doomed set (lanes that
reject the full ladder to the end of the budget).

Background (docs/BENCH.md round 4): the cold workload's ~21% doomed tail
owns ~60% of device time — backward reg-retries (34%, some lane's
factorization failing almost every iteration) + full line-search ladders
(26%, some lane rejecting everything). Retirement freezes those lanes
after ``cap`` consecutive full-ladder rejections instead of letting them
drag the batch for the rest of the 20 iterations.

Usage: python scripts/diag_doom.py  (knobs: B, T, MAXITER, REPS, ROUNDS, CAPS env)
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
CAPS = [int(c) for c in os.environ.get("CAPS", "0,3,4,6,8").split(",")]
# reg_reject_factor variants (paired with cap=0 unless CAPS has one entry)
FACTORS = [float(f) for f in os.environ.get("FACTORS", "").split(",") if f]


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

    variants = [(cap, 10.0) for cap in CAPS]
    variants += [(CAPS[0] if len(CAPS) == 1 else 0, f) for f in FACTORS]
    results = {}
    base_out = None
    for cap, factor in variants:
        settings = SolverSettings(maxiter=MAXITER, th_stop=1e-5,
                                  boxqp_warm_iters=2, doomed_reject_iters=cap,
                                  reg_reject_factor=factor)
        fn = build_lane_solver(w.problem, settings, bounds=w.bounds,
                               use_gaps=False)
        t0 = time.perf_counter()
        rates, out = timed(fn)
        div = np.asarray(out.diverged)
        conv = np.asarray(out.converged)
        it = np.asarray(out.iterations)
        cost = np.asarray(out.cost)
        alive = ~div
        print(f"cap={cap:>2} f={factor:>5.0f}: {['%.0f' % r for r in rates]} solves/s "
              f"(best {max(rates):.0f}) conv {conv.mean():.2%} "
              f"div {div.mean():.2%} mean_it {it.mean():.1f} "
              f"median_cost(alive) {np.median(cost[alive]):.2f} "
              f"p90 {np.percentile(cost[alive], 90):.1f} "
              f"[{time.perf_counter() - t0:.0f}s]", flush=True)
        results[(cap, factor)] = (max(rates), out)
        if cap == 0 and factor == 10.0:
            base_out = out

    base_key = (0, 10.0)
    if base_out is not None:
        bdiv = np.asarray(base_out.diverged)
        bcost = np.asarray(base_out.cost)
        for key in results:
            if key == base_key:
                continue
            cap, factor = key
            rate, out = results[key]
            div = np.asarray(out.diverged)
            cost = np.asarray(out.cost)
            # retired = newly-diverged vs the un-capped run
            retired = div & ~bdiv
            # cost agreement on lanes neither run flagged
            both_alive = ~div & ~bdiv
            same = np.array_equal(cost[both_alive], bcost[both_alive])
            mad = (np.max(np.abs(cost[both_alive] - bcost[both_alive]) /
                          np.maximum(1.0, np.abs(bcost[both_alive])))
                   if both_alive.any() else 0.0)
            print(f"cap={cap} f={factor:.0f}: {rate / results[base_key][0] - 1.0:+.2%} vs base | "
                  f"retired {retired.mean():.2%} of batch | "
                  f"survivor costs identical: {same} (max rel diff {mad:.2e})")


if __name__ == "__main__":
    main()
