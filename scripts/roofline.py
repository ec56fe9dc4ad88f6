#!/usr/bin/env python
"""Per-kernel roofline analysis (VERDICT r1 #8): where does the next
speedup live — layout, occupancy, or algorithm?

For each of the three fused lane kernels (linearize, Riccati backward,
rollout) at the bench shapes (B=2048, T=100, f32):

 - FLOPs: XLA cost analysis of the interpret-mode lowering on CPU at
   T=1 with a single 128-lane tile (the interpreter turns the grid and
   the in-kernel time loop into while-loops whose bodies the analyzer
   counts ONCE, so the T=1/1-tile count IS the per-knot-per-tile body),
   scaled by T x (B/128). The linearize/rollout programs also include
   the terminal-knot code once; the scaled numbers carry that ~1/T
   overcount (documented, < 2% at T=100);
 - HBM bytes: exact input+output array sizes (the kernel reads/writes
   each operand once; intermediates live in VMEM);
 - arithmetic intensity = flops / hbm_bytes, vs the v5e ridge point;
 - measured time on the real TPU: one jitted program chaining K
   dependent kernel calls (defeats the ~30 ms tunnel sync floor),
   wall / K per call;
 - achieved FLOP/s and % of the VPU peak + % of HBM peak.

v5e peaks used: HBM 819 GB/s (public); VPU f32 ~= 7.5 TFLOP/s (estimate:
8x128 vector lanes x 4 ALUs x 2 flops/FMA x ~1 GHz) — these kernels do
8x8-by-lane algebra on the VPU, the 197 TFLOP/s bf16 MXU peak does not
apply. Usage: python scripts/roofline.py [tpu|cpu]
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MODE = sys.argv[1] if len(sys.argv) > 1 else "tpu"
if MODE == "cpu":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

if MODE == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

HBM_GBS = 819.0
VPU_F32_TFLOPS = 7.5  # estimate, see module docstring

B = int(os.environ.get("ROOF_B", "2048"))
T = int(os.environ.get("ROOF_T", "100"))
CHAIN = int(os.environ.get("ROOF_CHAIN", "30"))


def tree_bytes(tree):
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize
               for x in jax.tree.leaves(tree))


def flops_of(fn, *args):
    """Algorithmic FLOPs via CPU interpret-mode cost analysis."""
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    return float(cost.get("flops", 0.0))


def measure(fn, args, chain=CHAIN):
    """Time `chain` dependent kernel calls inside one jitted program."""
    @jax.jit
    def chained(args):
        def body(i, a):
            out = fn(*a)
            # perturb one input with a scalar derived from the output so the
            # calls are data-dependent (no CSE/DCE), cost is negligible
            leaves = jax.tree.leaves(out)
            eps = jnp.sum(leaves[0]) * 0.0
            a0 = jax.tree.map(lambda x: x + eps.astype(x.dtype), a[0])
            return (a0,) + a[1:]
        return jax.lax.fori_loop(0, chain, body, args)

    out = chained(args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = chained(args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / chain


def _body_flops(name, w, dtype):
    """Per-knot-per-tile body flops: cost analysis at T=1, one 128 tile."""
    from aslr_to_tpu.pallas.riccati import riccati_box_backward_lanes
    from aslr_to_tpu.pallas.vsa_kernels import (
        build_linearize, build_rollout, extract_vsa_spec)

    spec = extract_vsa_spec(w.problem, w.bounds)
    nu, NDX, Bp, T1 = spec.nu, 8, 128, 1
    key = jax.random.PRNGKey(0)
    xs_l = 0.05 * jax.random.normal(key, (T1 + 1, NDX, Bp), dtype)
    us_l = 0.01 * jax.random.normal(key, (T1, nu, Bp), dtype)
    wterm_l = jnp.full((1, Bp), 100.0, dtype)
    if name == "linearize":
        lin1 = build_linearize(spec, T1, 128, True, lane_io=True)
        # program = one running body + one terminal body (~equal math):
        # halve to get the running-knot body
        return flops_of(lin1, xs_l, us_l, wterm_l) / 2.0
    if name == "riccati_box_backward":
        lb_l = jnp.broadcast_to(jnp.asarray(w.bounds.lb, dtype)[:, None], (nu, Bp))
        ub_l = jnp.broadcast_to(jnp.asarray(w.bounds.ub, dtype)[:, None], (nu, Bp))
        bw1 = functools.partial(riccati_box_backward_lanes, qp_iters=6, nb=128,
                                t_chunk=1, interpret=True)
        args = ((0.05 * jax.random.normal(key, (T1, NDX, NDX, Bp), dtype)),
                0.05 * jax.random.normal(key, (T1, NDX, nu, Bp), dtype),
                jax.random.normal(key, (T1, NDX, Bp), dtype),
                jax.random.normal(key, (T1, nu, Bp), dtype),
                jnp.broadcast_to(jnp.eye(NDX, dtype=dtype)[..., None], (T1, NDX, NDX, Bp)),
                jnp.zeros((T1, NDX, nu, Bp), dtype),
                jnp.broadcast_to(jnp.eye(nu, dtype=dtype)[..., None], (T1, nu, nu, Bp)),
                jax.random.normal(key, (NDX, Bp), dtype),
                jnp.broadcast_to(jnp.eye(NDX, dtype=dtype)[..., None], (NDX, NDX, Bp)),
                us_l, lb_l, ub_l, jnp.full((Bp,), 1e-6, dtype))
        return flops_of(bw1, *args)
    if name == "rollout":
        roll1 = build_rollout(spec, T1, 128, True, use_gaps=False, lane_io=True)
        args = (xs_l, us_l, us_l, 0.01 * jax.random.normal(key, (T1, nu, NDX, Bp), dtype),
                xs_l[0], jnp.ones((1, Bp), dtype), jnp.zeros((T1 + 1, NDX, Bp), dtype),
                jnp.zeros((1, Bp), dtype), wterm_l)
        # body + terminal goal-cost code; the terminal part is the same
        # goal evaluation the body also does — treat as ~half
        return flops_of(roll1, *args) / 2.0
    raise KeyError(name)


def main():
    from aslr_to_tpu.pallas.riccati import riccati_box_backward_lanes
    from aslr_to_tpu.pallas.vsa_kernels import (
        build_linearize, build_rollout, extract_vsa_spec)
    from aslr_to_tpu.workloads.presets import two_dof_vsa_boxddp

    dtype = jnp.float32
    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    w = two_dof_vsa_boxddp(T=T, dtype=dtype)
    spec = extract_vsa_spec(w.problem, w.bounds)
    nu, NDX, Bp = spec.nu, 8, B

    lin = build_linearize(spec, T, 128, interpret, lane_io=True)
    roll = build_rollout(spec, T, 128, interpret, use_gaps=False, lane_io=True)

    key = jax.random.PRNGKey(0)
    xs_l = 0.05 * jax.random.normal(key, (T + 1, NDX, Bp), dtype)
    us_l = 0.01 * jax.random.normal(key, (T, nu, Bp), dtype)
    wterm_l = jnp.full((1, Bp), 100.0, dtype)
    lin_args = (xs_l, us_l, wterm_l)

    cost, run, term, xnext, _ = jax.jit(lin)(*lin_args)
    bw_args = (run["Fx"], run["Fu"], run["Lx"], run["Lu"],
               run["Lxx"], run["Lxu"], run["Luu"],
               term["Lx"], term["Lxx"], us_l,
               jnp.broadcast_to(jnp.asarray(w.bounds.lb, dtype)[:, None], (nu, Bp)),
               jnp.broadcast_to(jnp.asarray(w.bounds.ub, dtype)[:, None], (nu, Bp)),
               jnp.ones((Bp,), dtype) * 1e-6)
    bw = functools.partial(riccati_box_backward_lanes, qp_iters=6, nb=128,
                           interpret=interpret)
    bw_out = jax.jit(bw)(*bw_args)
    roll_args = (xs_l, us_l, bw_out.k, bw_out.K, xs_l[0],
                 jnp.ones((1, Bp), dtype), jnp.zeros((T + 1, NDX, Bp), dtype),
                 jnp.zeros((1, Bp), dtype), wterm_l)

    kernels = [
        ("linearize", lin, lin_args,
         (cost, run, term, xnext)),
        ("riccati_box_backward", bw, bw_args, bw_out),
        ("rollout", roll, roll_args, jax.jit(roll)(*roll_args)),
    ]

    for name, fn, args, out in kernels:
        hbm = tree_bytes(args) + tree_bytes(out)
        row = dict(kernel=name, B=B, T=T,
                   hbm_bytes=hbm)
        if on_tpu:
            sec = measure(fn, args)
            row.update(
                time_ms=round(sec * 1e3, 3),
                achieved_hbm_gbs=round(hbm / sec / 1e9, 1),
                pct_hbm_peak=round(100.0 * hbm / sec / 1e9 / HBM_GBS, 1),
            )
        else:
            body = _body_flops(name, w, dtype)
            total = body * T * (B // 128)
            row.update(
                flops_per_knot_tile=body,
                flops=total,
                flops_per_lane_knot=round(body / 128.0, 1),
                intensity_flops_per_byte=round(total / hbm, 2),
                ridge_flops_per_byte=round(VPU_F32_TFLOPS * 1e12 / (HBM_GBS * 1e9), 1),
            )
        print(json.dumps(row), flush=True)
    if on_tpu:
        print(json.dumps(dict(note="run MODE=cpu for algorithmic FLOP counts; "
                                   "combine with this run's timings for %peak")))


if __name__ == "__main__":
    main()
