#!/usr/bin/env python
"""Diagnose the backward-pass retry storm seen in the bench profile."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from aslr_to_tpu.parallel.batch import make_batched_solver
from aslr_to_tpu.solvers.ddp import SolverSettings
from aslr_to_tpu.workloads.presets import two_dof_vsa_boxddp

BATCH = int(os.environ.get("BENCH_BATCH", "2048"))
USE_FAST = os.environ.get("USE_FAST", "1") == "1"
dtype = jnp.float32
w = two_dof_vsa_boxddp(T=100, dtype=dtype)
settings = SolverSettings(maxiter=20, th_stop=1e-5, use_pallas_backward=USE_FAST)
fn = make_batched_solver(w.problem, settings, use_gaps=False, bounds=w.bounds,
                         use_fast_path=USE_FAST, keep_log=True)
x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (BATCH, w.problem.state.nx), dtype=dtype)
out = fn(x0s)
jax.block_until_ready(out.cost)

div = np.asarray(out.diverged)
conv = np.asarray(out.converged)
reg = np.asarray(out.reg)
its = np.asarray(out.iterations)
print("diverged:", div.sum(), "converged:", conv.sum(), "of", BATCH)
print("iterations histogram:", np.bincount(its))
print("final reg: min", reg.min(), "max", reg.max(),
      "n at reg_max", (reg >= 1e8).sum())
regs = np.asarray(out.log.regs)   # [B, maxiter]
print("per-iter max reg over batch:", np.nanmax(regs, axis=0))
steps = np.asarray(out.log.steps)
print("per-iter min step:", np.nanmin(steps, axis=0), )
print("scenarios with any step==0:", (np.nan_to_num(steps, nan=1.0) == 0).any(axis=1).sum())
costs = np.asarray(out.log.costs)
print("any nan costs:", np.isnan(costs[:, 0]).sum(), "final cost nan:", np.isnan(np.asarray(out.cost)).sum())
stops = np.asarray(out.log.stops)
print("any nan stop:", np.isnan(np.asarray(out.stop)).sum(),
      "inf stop:", np.isinf(np.asarray(out.stop)).sum())
# which scenario reached max reg first
bad = np.where(reg >= 1e8)[0]
print("first bad scenarios:", bad[:10])
if len(bad):
    b = bad[0]
    print("bad scenario", b, "regs:", regs[b], "steps:", steps[b], "costs:", costs[b])
