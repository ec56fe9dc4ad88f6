#!/usr/bin/env python
"""Compare f32 vs f64 BoxDDP outcomes on CPU (generic XLA path).

Establishes whether the bench's divergence rate is inherent problem
hardness or f32-specific backward-pass overflow.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)   # allow f64 arrays; f32 selected per-case

import numpy as np
import jax.numpy as jnp

from aslr_to_tpu.parallel.batch import make_batched_solver
from aslr_to_tpu.solvers.ddp import SolverSettings
from aslr_to_tpu.workloads.presets import two_dof_vsa_boxddp

BATCH = int(os.environ.get("DIAG_BATCH", "32"))
MAXITER = int(os.environ.get("DIAG_MAXITER", "20"))
T = int(os.environ.get("DIAG_T", "100"))

base = None  # set from state.nx below

for dtype in (jnp.float32, jnp.float64):
    w = two_dof_vsa_boxddp(T=T, dtype=dtype)
    if base is None:
        nx = w.problem.state.nx
        base = 0.05 * np.asarray(jax.random.normal(jax.random.PRNGKey(0), (2048, nx)))[:BATCH]
    settings = SolverSettings(maxiter=MAXITER, th_stop=1e-5)
    fn = make_batched_solver(w.problem, settings, use_gaps=False, bounds=w.bounds,
                             use_fast_path=False, keep_log=True)
    out = fn(jnp.asarray(base, dtype=dtype))
    jax.block_until_ready(out.cost)
    div = np.asarray(out.diverged)
    print(f"\n== {dtype.__name__}: diverged {div.sum()}/{BATCH}, "
          f"converged {np.asarray(out.converged).sum()}, "
          f"final cost median {np.median(np.asarray(out.cost)):.1f} "
          f"min {np.asarray(out.cost).min():.1f} max {np.asarray(out.cost).max():.3g}")
    regs = np.asarray(out.log.regs)
    steps = np.asarray(out.log.steps)
    stops = np.asarray(out.log.stops)
    bad = np.where(div)[0]
    print("diverged idx:", bad[:12])
    for b in bad[:3]:
        print(f"  sc {b}: regs {regs[b][:8]} steps {steps[b][:8]} stops {stops[b][:6]}")
