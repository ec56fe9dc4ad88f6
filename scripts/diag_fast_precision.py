#!/usr/bin/env python
"""Per-kernel f32 accuracy of the fused fast path vs the XLA reference.

Runs on CPU with the kernels in interpret mode, so differences are purely
algorithmic (accumulation order, polynomial atan2, explicit 2x2 inverses),
not TPU hardware behavior. Prints max relative error per output, in f32
and f64.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
if sys.argv[1:] and sys.argv[1] == "f64":
    jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from aslr_to_tpu.pallas.vsa_kernels import build_fast_path
from aslr_to_tpu.solvers import ddp as _ddp
from aslr_to_tpu.workloads.presets import two_dof_vsa_boxddp

B, T = 4, 12


def relerr(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    d = np.abs(a - b)
    s = np.maximum(np.abs(b), 1e-6)
    return float((d / s).max())


dtype = jnp.float64 if (sys.argv[1:] and sys.argv[1] == "f64") else jnp.float32
if True:
    w = two_dof_vsa_boxddp(T=T, dtype=dtype)
    p = w.problem
    fast = build_fast_path(p, w.bounds, use_gaps=False, interpret=True)

    key = jax.random.PRNGKey(0)
    xs = float(os.environ.get("XSCALE", "0.3")) * jax.random.normal(key, (B, T + 1, 8), dtype=dtype)
    us = jnp.concatenate([
        5.0 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 2), dtype=dtype),
        3.0 + 2.0 * jax.random.uniform(jax.random.PRNGKey(2), (B, T, 2), dtype=dtype),
    ], axis=-1)

    # XLA reference (per scenario)
    import dataclasses as dc

    def ref_lin(x0, xs1, us1):
        pp = dc.replace(p, x0=x0)
        return _ddp._linearize_core(pp, xs1, us1)

    cost_r, run_r, term_r, xnext_r = jax.vmap(ref_lin)(xs[:, 0], xs, us)
    wterm = jnp.full((B,), fast.wterm_of(p), dtype=dtype)
    cost_f, run_f, term_f, xnext_f = jax.vmap(fast.linearize)(xs, us, wterm)

    print(f"\n== linearize {dtype.__name__} ==")
    print("cost", relerr(cost_f, cost_r), " xnext", relerr(xnext_f, xnext_r))
    for f in ("Fx", "Fu", "Lx", "Lu", "Lxx", "Luu"):
        print(f"run.{f}", relerr(getattr(run_f, f), getattr(run_r, f)),
              f" term.{f}", relerr(getattr(term_f, f), getattr(term_r, f)))

    # rollout comparison
    k = 0.05 * jax.random.normal(jax.random.PRNGKey(3), (B, T, 4), dtype=dtype)
    K = 0.05 * jax.random.normal(jax.random.PRNGKey(4), (B, T, 4, 8), dtype=dtype)
    alpha = jnp.full((B,), 0.25, dtype=dtype)
    fs = jnp.zeros((B, T + 1, 8), dtype=dtype)
    infeas = jnp.zeros((B,), bool)

    def ref_roll(x0, xs1, us1, k1, K1, a1):
        pp = dc.replace(p, x0=x0)
        return _ddp._rollout(pp, xs1, us1, k1, K1, fs[0], a1, jnp.asarray(False), False, w.bounds)

    xs_r, us_r, c_r = jax.vmap(ref_roll)(xs[:, 0], xs, us, k, K, alpha)
    xs_f, us_f, c_f = jax.vmap(fast.rollout)(xs, us, k, K, xs[:, 0], alpha, fs, infeas, wterm)
    print("rollout xs", relerr(xs_f, xs_r), " us", relerr(us_f, us_r), " cost", relerr(c_f, c_r))
