#!/usr/bin/env python
"""Does terminal-weight homotopy fix the cold-start VSA BoxDDP stall?

CPU f64, generic XLA path. Compares a single maxiter=400 cold solve vs a
staged solve with the terminal goal weight ramped geometrically, same
total iteration budget. Reports final cost, EE error, convergence.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from aslr_to_tpu.ops import rigid_body as rbd
from aslr_to_tpu.solvers.ddp import SolverSettings, solve
from aslr_to_tpu.workloads.presets import two_dof_vsa_boxddp

T = int(os.environ.get("T", "100"))
MAXITER = int(os.environ.get("MAXITER", "400"))
w = two_dof_vsa_boxddp(T=T, dtype=jnp.float64)
p = w.problem


def scale_terminal(problem, s):
    term = problem.terminal
    costs = term.differential.costs
    items = tuple(dataclasses.replace(it, weight=it.weight * s) for it in costs.items)
    return dataclasses.replace(
        problem,
        terminal=dataclasses.replace(
            term, differential=dataclasses.replace(
                term.differential, costs=dataclasses.replace(costs, items=items))))


def report(tag, res):
    q_l = res.xs[-1][:2]
    ee = rbd.frame_placement(p.state.robot, q_l, w.ee_frame).trans
    err = float(jnp.linalg.norm(ee - w.target))
    print(f"{tag}: cost {float(res.cost):.4f} iters {int(res.iterations)} "
          f"conv {bool(res.converged)} stop {float(res.stop):.3g} ee_err {err:.4f}",
          flush=True)
    return err


st = SolverSettings(maxiter=MAXITER, th_stop=1e-7)
res = jax.jit(lambda: solve(p, None, None, st, use_gaps=False, bounds=w.bounds))()
report("single cold", res)

VARIANTS = [
    ("geo4", [1e-3, 1e-2, 1e-1, 1.0], None),
    ("geo7", [1e-3, 3e-3, 1e-2, 3e-2, 1e-1, 3e-1, 1.0], None),
    ("geo4+final", [1e-3, 1e-2, 1e-1, 1.0], "final200"),
    ("geo4+qs", [1e-3, 1e-2, 1e-1, 1.0], "qs"),
]
for name, scales, opt in VARIANTS:
    n = len(scales)
    per = MAXITER // n
    xs = jnp.broadcast_to(p.x0, (p.T + 1, 8))
    us = jnp.zeros((p.T, 4))
    if opt == "qs":
        us = p.quasi_static(xs[:-1])

    @jax.jit
    def stage(s, xs, us, mi):
        st_h = SolverSettings(maxiter=MAXITER, th_stop=1e-7)
        return solve(scale_terminal(p, s), xs, us, st_h, use_gaps=False, bounds=w.bounds)

    for i, s in enumerate(scales):
        mi = 200 if (opt == "final200" and i == n - 1) else per
        st_h = SolverSettings(maxiter=mi, th_stop=1e-7)
        res = jax.jit(lambda s, xs, us: solve(scale_terminal(p, s), xs, us, st_h,
                                              use_gaps=False, bounds=w.bounds))(
            jnp.asarray(float(s)), xs, us)
        xs, us = res.xs, res.us
    report(f"homotopy {name}", res)
