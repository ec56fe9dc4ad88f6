#!/usr/bin/env python
"""Weak-scaling harness on the emulated CPU mesh (VERDICT r1 #2).

Two measurements, printed as JSON lines:

1. **Weak scaling**: solves/s at 1/2/4/8 emulated devices with a fixed
   per-device batch (generic compiled path — pallas interpret mode is an
   emulator, not a performance surface). On this container the 8 virtual
   devices share ``nproc`` physical cores, so raw efficiency saturates at
   ``nproc``/n; the harness therefore also reports *core-limited*
   efficiency (vs min(n, nproc) usable lanes), which is the number that
   transfers to real multi-chip hardware where every device has its own
   chip.

2. **Collective audit**: compiles the sharded solver (generic and lane
   fast path) and counts collective ops in the optimized HLO. The
   scenario batch is embarrassingly parallel — the solve must contain
   ZERO per-iteration collectives (the only permitted collectives are the
   final stats psum of shard_map_solve). This is the structural proof
   that scaling efficiency on real hardware is bounded only by batch
   balance, which a 1-chip environment cannot measure directly.

Usage: python scripts/scaling.py [per_device_batch] [T] [maxiter]
"""
import json
import os
import re
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from aslr_to_tpu.parallel.batch import make_batched_solver
from aslr_to_tpu.parallel.mesh import batch_sharding, make_batch_mesh
from aslr_to_tpu.parallel.spmd import make_shard_map_solver
from aslr_to_tpu.solvers.ddp import SolverSettings
from aslr_to_tpu.workloads.presets import two_dof_vsa_boxddp

COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|reduce-scatter|all-to-all|collective-permute)\b")


def count_collectives(compiled) -> int:
    hlo = compiled.as_text()
    return len(COLLECTIVE_RE.findall(hlo))


def main():
    per_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    maxiter = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    ncores = os.cpu_count()

    w = two_dof_vsa_boxddp(T=T)
    st = SolverSettings(maxiter=maxiter, th_stop=1e-7)
    nx = w.problem.state.nx

    # -- weak scaling ------------------------------------------------------
    rates = {}
    for n in (1, 2, 4, 8):
        mesh = make_batch_mesh(n)
        fn = make_shard_map_solver(w.problem, st, use_gaps=False,
                                   bounds=w.bounds, mesh=mesh)
        B = n * per_dev
        x0s = jax.device_put(
            0.05 * jax.random.normal(jax.random.PRNGKey(0), (B, nx)),
            batch_sharding(mesh))
        out = fn(x0s)
        jax.block_until_ready(out.cost)  # compile + warm
        reps, t0 = 3, time.perf_counter()
        for i in range(reps):
            out = fn(x0s + 1e-5 * (i + 1))
            jax.block_until_ready(out.cost)
        dt = time.perf_counter() - t0
        rates[n] = B * reps / dt
        print(f"[scaling] n={n} B={B}: {rates[n]:.1f} solves/s", file=sys.stderr)

    base = rates[1]
    for n in (1, 2, 4, 8):
        usable = min(n, ncores)
        print(json.dumps({
            "metric": f"weak-scaling solves/s at {n} emulated devices "
                      f"(per-device batch {per_dev}, T={T})",
            "value": round(rates[n], 2),
            "unit": "solves/s",
            "efficiency_raw": round(rates[n] / (n * base), 4),
            "efficiency_core_limited": round(rates[n] / (usable * base), 4),
            "ncores": ncores,
        }))

    # -- collective audit --------------------------------------------------
    mesh = make_batch_mesh(8)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (8 * per_dev, nx))
    x0s = jax.device_put(x0s, batch_sharding(mesh))

    sm_generic = make_shard_map_solver(w.problem, st, use_gaps=False,
                                       bounds=w.bounds, mesh=mesh)
    n_sm = count_collectives(sm_generic.lower(x0s).compile())

    lane = make_shard_map_solver(w.problem, st, use_gaps=False, bounds=w.bounds,
                                 use_fast_path="lanes", mesh=mesh)
    n_lane = count_collectives(lane.lower(x0s).compile())

    # GSPMD contrast: XLA's automatic partitioner inserts per-while-iteration
    # all-reduces (global loop conditions) and all-gathers around the LAPACK
    # triangular-solve custom call — measured, which is why shard_map is the
    # production scale-out path (parallel/batch.sharded_solve default).
    gspmd = make_batched_solver(w.problem, st, use_gaps=False, bounds=w.bounds)
    n_gspmd = count_collectives(jax.jit(gspmd).lower(x0s).compile())

    print(json.dumps({
        "metric": "collectives in compiled sharded solver (8-device mesh)",
        "shard_map_generic": n_sm,
        "shard_map_lanes": n_lane,
        "gspmd_generic_contrast": n_gspmd,
        "expected_shard_map": 0,
        "note": "scenario batch is embarrassingly parallel; zero collectives "
                "per solve proves scaling is bounded only by batch balance",
    }))
    assert n_sm == 0, f"shard_map generic solver has {n_sm} collectives"
    assert n_lane == 0, f"lane shard_map solver has {n_lane} collectives"


if __name__ == "__main__":
    main()
