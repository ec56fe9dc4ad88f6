#!/usr/bin/env python
"""Bench the 7-DoF SEA reach on the GENERIC path (real TPU).

The lane fast path covers the 2-DoF family only (a deliberate scoping —
``pallas/vsa_kernels.py`` hardcodes NDX=8); the reference's own tests
exercise SEA dynamics on the 7-DoF ``talos_arm``
(``unittest/test_asr_free_fwddyn.py:51``). This script records what the
dimension-general XLA path costs on the :func:`workloads.presets.seven_dof_sea`
workload and prints the lane path's named rejection reason (it must fall
back loudly, not silently).

Usage: python scripts/bench_7dof.py  (knobs: B, T, MAXITER, REPS env)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B = int(os.environ.get("B", "512"))
T = int(os.environ.get("T", "100"))
MAXITER = int(os.environ.get("MAXITER", "20"))
REPS = int(os.environ.get("REPS", "4"))


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

    ok, reason = supports_fast_path(w.problem, w.bounds)
    assert not ok, "7-DoF unexpectedly accepted by the lane spec extractor"
    print(f"lane path rejects seven_dof_sea (named reason): {reason!r}", flush=True)

    settings = SolverSettings(maxiter=MAXITER, th_stop=1e-5)
    fn = make_batched_solver(w.problem, settings, use_gaps=True, bounds=None,
                             warm_start=True)
    nx = w.problem.state.nx
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (B, nx), dtype=dtype)
    x0s_all = [x0s + jnp.asarray(1e-4 * (i + 1), dtype=dtype) for i in range(REPS)]
    jax.block_until_ready(x0s_all)

    t0 = time.perf_counter()
    out = fn(x0s)
    np.asarray(out.cost)
    print(f"compile+first solve: {time.perf_counter() - t0:.0f}s", flush=True)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(x) for x in x0s_all]
        for o in outs:
            np.asarray(o.cost)
        rates.append(B * REPS / (time.perf_counter() - t0))
    summ = convergence_summary(outs[-1])
    print(f"generic 7-DoF SEA FDDP (B={B}, T={T}, maxiter={MAXITER}): "
          f"{['%.0f' % r for r in rates]} solves/s (best {max(rates):.0f}); "
          f"convergence {summ}", flush=True)


if __name__ == "__main__":
    main()
