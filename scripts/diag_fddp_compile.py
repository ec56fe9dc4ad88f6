#!/usr/bin/env python
"""Bisect the slow Mosaic compile of the FDDP/SEA kernel set.

Times .lower().compile() of each fused kernel separately for the
two_dof_sea workload (T=100): linearize (SEA variant), fddp backward
(gap-aware, per t-chunk), rollout (gap-contracting). Compare against the
BoxDDP set (~27s total). Run serially on the TPU.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from aslr_to_tpu.pallas import vsa_kernels as vk
from aslr_to_tpu.pallas.riccati import riccati_fddp_backward, riccati_box_backward
from aslr_to_tpu.workloads.presets import two_dof_sea, two_dof_vsa_boxddp

T = int(os.environ.get("DIAG_T", "100"))
B = 128
dtype = jnp.float32

which = sys.argv[1] if len(sys.argv) > 1 else "all"


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    jax.jit(fn).lower(*args).compile()
    print(f"{name}: {time.perf_counter() - t0:.1f}s", flush=True)


w = two_dof_sea(T=T, dtype=dtype)
spec = vk.extract_vsa_spec(w.problem, None)
nu = spec.nu

xs = jnp.zeros((B, T + 1, 8), dtype)
us = jnp.zeros((B, T, nu), dtype)
k = jnp.zeros((B, T, nu), dtype)
K = jnp.zeros((B, T, nu, 8), dtype)
x0 = jnp.zeros((B, 8), dtype)
alpha = jnp.ones((B,), dtype)
fs = jnp.zeros((B, T + 1, 8), dtype)
infeas = jnp.ones((B,), bool)

if which in ("all", "lin"):
    lin = vk.build_linearize(spec, T, interpret=False)
    timeit("SEA linearize", lin, xs, us)

if which in ("all", "roll"):
    roll = vk.build_rollout(spec, T, interpret=False, use_gaps=True)
    timeit("SEA rollout(gaps)", roll, xs, us, k, K, x0, alpha, fs, infeas)

if which in ("all", "bw"):
    Fx = jnp.zeros((B, T, 8, 8), dtype)
    Fu = jnp.zeros((B, T, 8, nu), dtype)
    Lx = jnp.zeros((B, T, 8), dtype)
    Lu = jnp.zeros((B, T, nu), dtype)
    Lxx = jnp.zeros((B, T, 8, 8), dtype)
    Lxu = jnp.zeros((B, T, 8, nu), dtype)
    Luu = jnp.zeros((B, T, nu, nu), dtype)
    tLx = jnp.zeros((B, 8), dtype)
    tLxx = jnp.zeros((B, 8, 8), dtype)
    reg = jnp.full((B,), 1e-9, dtype)

    def bw(*a):
        return riccati_fddp_backward(*a, nu=nu, interpret=False)

    timeit("FDDP backward", bw, Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, tLx, tLxx, fs, reg)

if which in ("all", "boxref"):
    wb = two_dof_vsa_boxddp(T=T, dtype=dtype)
    specb = vk.extract_vsa_spec(wb.problem, wb.bounds)
    linb = vk.build_linearize(specb, T, interpret=False)
    timeit("VSA linearize (ref)", linb, xs, jnp.zeros((B, T, 4), dtype))
