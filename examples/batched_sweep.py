"""Batched MPC-style sweep: thousands of VSA BoxDDP scenarios per chip.

The north-star scale-out config (BASELINE.json configs: "batched MPC sweep:
4096 initial-state/stiffness scenarios"): one jitted program solves a full
batch of perturbed initial states, sharded over every available device.
The reference can only run one scenario per process (SURVEY §2.3).

Usage: python examples/batched_sweep.py [batch] [T]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp

from aslr_to_tpu.parallel.batch import convergence_summary, make_batched_solver, sharded_solve
from aslr_to_tpu.parallel.mesh import make_batch_mesh
from aslr_to_tpu.solvers.ddp import SolverSettings
from aslr_to_tpu.workloads.presets import two_dof_vsa_boxddp


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    w = two_dof_vsa_boxddp(T=T, dtype=dtype)
    settings = SolverSettings(maxiter=20, th_stop=1e-5)
    on_tpu = jax.default_backend() == "tpu"

    # perturb link/motor positions only — velocity noise on a stiff
    # spring-coupled arm creates violent (physical) transients
    nx = w.problem.state.nx
    noise = 0.02 * jax.random.normal(jax.random.PRNGKey(0), (B, nx), dtype=dtype)
    x0s = noise.at[:, 4:].set(0.0)

    n_dev = len(jax.devices())
    if n_dev > 1:
        res = sharded_solve(w.problem, x0s, settings, use_gaps=False, bounds=w.bounds,
                            mesh=make_batch_mesh())
    else:
        fn = make_batched_solver(w.problem, settings, use_gaps=False, bounds=w.bounds,
                                 use_fast_path=on_tpu)
        t0 = time.time()
        res = fn(x0s)
        jax.block_until_ready(res.cost)
        print(f"compile+first solve: {time.time() - t0:.1f}s")
        t0 = time.time()
        res = fn(x0s + jnp.asarray(1e-4, dtype=dtype))
        jax.block_until_ready(res.cost)
        dt = time.time() - t0
        print(f"{B} solves in {dt:.2f}s -> {B / dt:.0f} solves/s on {n_dev} device(s)")

    print(convergence_summary(res))


if __name__ == "__main__":
    main()
