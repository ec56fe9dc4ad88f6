#!/usr/bin/env python
"""Bench the 7-DoF SEA reach (real TPU): lane fast path vs generic.

Round 4 recorded the dimension-general XLA path at 16 solves/s and the
lane path rejecting with 'fast path requires a 2-DoF chain'. Round 5
generalized the whole kernel family (linearize / FDDP backward /
rollout) to arbitrary chain lengths — state components are individual
lane planes, the per-knot algebra unrolls over ndx=4*nl at trace time —
so the reference's talos_arm-class workload
(``/root/reference/unittest/test_asr_free_fwddyn.py:51`` runs SEA
dynamics at 7-DoF) now runs on the fused kernels. Big-state batches are
capped at 512 lanes/call (VMEM chunking, pallas/lane_solver.py); this
script records both paths at the same config.

Usage: python scripts/bench_7dof.py  (knobs: B, T, MAXITER, REPS,
GENERIC=0 to skip the slow generic-path baseline)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B = int(os.environ.get("B", "512"))
T = int(os.environ.get("T", "100"))
MAXITER = int(os.environ.get("MAXITER", "20"))
REPS = int(os.environ.get("REPS", "4"))
RUN_GENERIC = os.environ.get("GENERIC", "1") == "1"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aslr_to_tpu.parallel.batch import convergence_summary, make_batched_solver
    from aslr_to_tpu.pallas.vsa_kernels import supports_fast_path
    from aslr_to_tpu.solvers.ddp import SolverSettings
    from aslr_to_tpu.utils.compilation_cache import enable
    from aslr_to_tpu.workloads.presets import seven_dof_sea

    enable()
    jax.block_until_ready(jnp.zeros(()) + 1.0)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    w = seven_dof_sea(T=T, dtype=dtype)

    ok, reason = supports_fast_path(w.problem, None)
    print(f"lane path accepts seven_dof_sea: {ok} {reason!r}", flush=True)

    settings = SolverSettings(maxiter=MAXITER, th_stop=1e-5)
    nx = w.problem.state.nx
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (B, nx), dtype=dtype)
    x0s_all = [x0s + jnp.asarray(1e-4 * (i + 1), dtype=dtype) for i in range(REPS)]
    jax.block_until_ready(x0s_all)

    def run(label, fn):
        t0 = time.perf_counter()
        out = fn(x0s)
        np.asarray(out.cost)
        print(f"{label}: compile+first solve {time.perf_counter() - t0:.0f}s",
              flush=True)
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(x) for x in x0s_all]
            for o in outs:
                np.asarray(o.cost)
            rates.append(B * REPS / (time.perf_counter() - t0))
        summ = convergence_summary(outs[-1])
        print(f"{label} 7-DoF SEA FDDP (B={B}, T={T}, maxiter={MAXITER}): "
              f"{['%.0f' % r for r in rates]} solves/s (best {max(rates):.0f}); "
              f"convergence {summ}", flush=True)
        return max(rates)

    lane_fn = make_batched_solver(w.problem, settings, use_gaps=True, bounds=None,
                                  warm_start=True, use_fast_path="lanes")
    lane_rate = run("lane", lane_fn)

    if RUN_GENERIC:
        gen_fn = make_batched_solver(w.problem, settings, use_gaps=True, bounds=None,
                                     warm_start=True)
        gen_rate = run("generic", gen_fn)
        print(f"lane/generic speedup: {lane_rate / gen_rate:.1f}x", flush=True)


if __name__ == "__main__":
    main()
