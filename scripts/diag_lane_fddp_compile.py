"""Bisect lane-solver compile time (FDDP vs Box family) on the TPU.

The lane BoxDDP solver compiles in ~15-20s at B=2048/T=100, but the first
SEA/FDDP lane bench blew through a 480s watchdog during compile. This
script times trace/lower/compile separately per family and size so the
slow phase is attributable (Mosaic kernel vs XLA loop assembly vs tunnel).

Usage: python scripts/diag_lane_fddp_compile.py [sea|vsa] [T] [B]
Serialize with any other TPU process.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    fam = sys.argv[1] if len(sys.argv) > 1 else "sea"
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    from aslr_to_tpu.pallas.lane_solver import build_lane_solver
    from aslr_to_tpu.solvers.ddp import SolverSettings
    from aslr_to_tpu.workloads.presets import two_dof_sea, two_dof_vsa_boxddp

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    st = SolverSettings(maxiter=5, th_stop=1e-5)
    t0 = time.perf_counter()
    if fam == "sea":
        w = two_dof_sea(T=T, dtype=dtype)
        fn = build_lane_solver(w.problem, st, None, use_gaps=True)
    else:
        w = two_dof_vsa_boxddp(T=T, dtype=dtype)
        fn = build_lane_solver(w.problem, st, w.bounds, use_gaps=False)
    print(f"[{fam} T={T} B={B}] build: {time.perf_counter() - t0:.1f}s", flush=True)

    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (B, 8), dtype=dtype)

    t0 = time.perf_counter()
    lowered = fn.lower(x0s)
    print(f"  trace+lower: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"  compile: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    out = compiled(x0s)
    jax.block_until_ready(out.cost)
    print(f"  first run: {time.perf_counter() - t0:.1f}s "
          f"(conv={int(out.converged.sum())}/{B}, it_mean={float(out.iterations.mean()):.1f})",
          flush=True)


if __name__ == "__main__":
    main()
