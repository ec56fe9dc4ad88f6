"""MPC-style warm-started re-solve (SURVEY §5 checkpoint/resume plan).

Solves the SEA reach task, saves the solution, then re-solves from a
shifted state using the previous trajectory as a warm start — the
receding-horizon pattern. Warm starts cut iterations substantially.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import jax.numpy as jnp
import numpy as np

from aslr_to_tpu.solvers.ddp import SolverSettings, solve
from aslr_to_tpu.utils.io import load_solution, save_solution
from aslr_to_tpu.workloads.presets import two_dof_sea


def main():
    w = two_dof_sea(T=60)
    p = w.problem

    first = solve(p, settings=SolverSettings(maxiter=100, th_stop=1e-7), use_gaps=True)
    print(f"cold solve: {int(first.iterations)} iterations, cost {float(first.cost):.4f}")

    with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
        path = f.name
    save_solution(path, first.xs, first.us, dt=1e-2)

    # New initial state = one knot into the previous plan (receding horizon);
    # warm start with the shifted previous solution.
    xs_prev, us_prev = load_solution(path)
    import dataclasses
    p2 = dataclasses.replace(p, x0=jnp.asarray(xs_prev[1]))
    xs_ws = jnp.asarray(np.vstack([xs_prev[1:], xs_prev[-1:]]))
    us_ws = jnp.asarray(np.vstack([us_prev[1:], us_prev[-1:]]))

    warm = solve(p2, xs_ws, us_ws, settings=SolverSettings(maxiter=100, th_stop=1e-7), use_gaps=True)
    print(f"warm re-solve: {int(warm.iterations)} iterations, cost {float(warm.cost):.4f}")
    assert int(warm.iterations) <= int(first.iterations)


if __name__ == "__main__":
    main()
