#!/usr/bin/env python
"""Cold-start quality study: BoxDDP vs BoxFDDP vs staged homotopy.

The one ugly quality number left on the flagship VSA workload is cold-start
divergence (reference behavior too — the workload is intrinsically fragile
cold, docs/PARITY.md). VERDICT r2 asked whether BoxFDDP's infeasible-start
gap handling reduces cold divergence at equal budget. This script measures,
at the bench budget (T=100, maxiter=20 or 4x5 homotopy stages, th=1e-5):

  - cold BoxDDP        (the driver metric configuration)
  - cold BoxFDDP       (gap-aware family, same budget)
  - staged homotopy    (terminal-weight continuation, same total budget)
    on both families

per-path: lane f32 on the TPU at STUDY_BATCH (default 2048), or the
generic f64 path on CPU at STUDY_BATCH_F64 (default 256) with STUDY_F64=1.

Results land in docs/PARITY.md (cold-start quality table).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    f64 = os.environ.get("STUDY_F64", "0") == "1"
    import jax

    if f64:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from aslr_to_tpu.parallel.batch import convergence_summary, make_batched_solver
    from aslr_to_tpu.solvers.ddp import SolverSettings
    from aslr_to_tpu.utils.compilation_cache import enable
    from aslr_to_tpu.workloads.presets import two_dof_vsa_boxddp

    if not f64:
        enable()
    dtype = jnp.float64 if f64 else jnp.float32
    B = int(os.environ.get("STUDY_BATCH_F64" if f64 else "STUDY_BATCH",
                           "256" if f64 else "2048"))
    T = int(os.environ.get("STUDY_T", "100"))
    maxiter = int(os.environ.get("STUDY_MAXITER", "20"))
    th = 1e-5

    w = two_dof_vsa_boxddp(T=T, dtype=dtype)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (B, 8), dtype=dtype)
    path = "generic-f64" if f64 else "lanes-f32"
    fast = False if f64 else "lanes"

    from aslr_to_tpu.solvers.homotopy import stiffness_continuation

    # production homotopy stages: terminal-weight ramp + stiffness-bound
    # continuation (5 stages for this workload); per-stage budget keeps the
    # TOTAL iteration budget equal to the cold configs
    hscales, hub = stiffness_continuation(w.problem, w.bounds)
    configs = [
        ("boxddp cold", dict(use_gaps=False), SolverSettings(
            maxiter=maxiter, th_stop=th, use_pallas_backward=not f64), None),
        ("boxfddp cold", dict(use_gaps=True), SolverSettings(
            maxiter=maxiter, th_stop=th, use_pallas_backward=not f64), None),
        ("boxddp homotopy", dict(use_gaps=False), SolverSettings(
            maxiter=max(1, maxiter // len(hscales)), th_stop=th,
            use_pallas_backward=not f64), "homotopy"),
        ("boxfddp homotopy", dict(use_gaps=True), SolverSettings(
            maxiter=max(1, maxiter // len(hscales)), th_stop=th,
            use_pallas_backward=not f64), "homotopy"),
    ]

    # STUDY_ONLY=<substring> runs a subset (e.g. "homotopy" for the
    # equal-budget f64-vs-f32 divergence pin, VERDICT r3 item 5)
    only = os.environ.get("STUDY_ONLY", "")
    configs = [c for c in configs if only in c[0]]

    print(f"# cold-start study: {path}, B={B}, T={T}, budget={maxiter}, th={th:g}")
    for name, kw, st, glob in configs:
        t0 = time.perf_counter()
        try:
            fn = make_batched_solver(w.problem, st, bounds=w.bounds,
                                     use_fast_path=fast, globalization=glob,
                                     scales=hscales if glob else None,
                                     ub_stages=hub if glob else None, **kw)
            out = fn(x0s)
            jax.block_until_ready(out.cost)
            summ = convergence_summary(out)
            print(json.dumps({"config": name, "path": path, **{
                k: round(float(v), 4) for k, v in summ.items()}},
                sort_keys=False), flush=True)
        except Exception as e:
            print(json.dumps({"config": name, "path": path,
                              "error": f"{type(e).__name__}: {e}"[:300]}), flush=True)
        print(f"#   ({time.perf_counter() - t0:.0f}s)", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
