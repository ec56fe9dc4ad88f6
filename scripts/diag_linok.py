#!/usr/bin/env python
"""A/B lane-solver variants on the bench workload (real TPU, idle host).

Variants (each vs the default build):
- ``hbm_reduce``: the pre-round-4 linearization health check (leaf-by-leaf
  isfinite over all nine derivative tensors re-read from HBM, ~360
  MB/iteration at B=4096 T=100 f32) instead of the in-kernel ok flag.
- ``ls_single``: single-trial first line-search round (skip trial b's
  wasted work when the full step accepts) instead of always-two-trial.
- ``roll_tiles2`` / ``tiles2+single``: two (8,128) batch tiles per
  rollout grid step (serial-chain ILP).

Timing mirrors bench.py's pipelined loop. Results belong in docs/BENCH.md
(measured deltas or recorded negative results, per the noise-floor rule).
Note on the "costs bit-identical" check: variants that change the
rollout's VMEM footprint (tiles, extra trials) can change the
time-chunk plan, so their on-device costs differ from baseline by
cost-sum reassociation ulps — expected, not a correctness signal; the
correctness bar is the interpret-mode bit-parity tests in
tests/test_lane_solver.py.

Usage: python scripts/diag_linok.py  (knobs: B, T, MAXITER, REPS, ROUNDS env)
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

    def timed(fn):
        out = fn(x0s)
        ref_cost = np.asarray(out.cost)   # full compile+run before timing
        rates = []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            outs = [fn(x) for x in x0s_all]
            for o in outs:
                np.asarray(o.cost)
            rates.append(B * REPS / (time.perf_counter() - t0))
        return rates, ref_cost

    variants = [
        ("baseline", {}),
        ("hbm_reduce", dict(kernel_ok=False)),
        ("ls_single", dict(ls_first_single=True)),
        ("roll_tiles2", dict(rollout_tiles=2)),
        ("tiles2+single", dict(rollout_tiles=2, ls_first_single=True)),
    ]
    results, costs = {}, {}
    for label, kw in variants:
        fn = build_lane_solver(w.problem, settings, bounds=w.bounds,
                               use_gaps=False, **kw)
        t0 = time.perf_counter()
        rates, cost = timed(fn)
        print(f"{label:>11}: {['%.0f' % r for r in rates]} solves/s "
              f"(best {max(rates):.0f}, compile+{ROUNDS}x timed in "
              f"{time.perf_counter() - t0:.0f}s)", flush=True)
        results[label], costs[label] = max(rates), cost

    for label, _ in variants[1:]:
        same = bool(np.array_equal(costs["baseline"], costs[label],
                                   equal_nan=True))
        delta = results["baseline"] / results[label] - 1.0 \
            if label == "hbm_reduce" else results[label] / results["baseline"] - 1.0
        tag = ("in-kernel ok flag vs HBM reduction (positive = flag wins)"
               if label == "hbm_reduce" else f"{label} vs baseline")
        print(f"{tag}: {delta:+.2%} (costs bit-identical: {same})")


if __name__ == "__main__":
    main()
