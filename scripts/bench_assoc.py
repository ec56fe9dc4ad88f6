#!/usr/bin/env python
"""Sequential-scan vs associative-scan Riccati backward at long horizons.

The sequential backward is O(T) depth; the associative formulation
(solvers/assoc_riccati.py) is O(log T) depth at ~4x the flops. This
script times both, jitted and vmapped over a small scenario batch, on
the real TPU across horizons — the crossover motivates when to flip
``SolverSettings.assoc_backward``.

Usage: python scripts/bench_assoc.py  (knobs: B, REPS env)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B = int(os.environ.get("B", "8"))
REPS = int(os.environ.get("REPS", "20"))
HORIZONS = [int(t) for t in os.environ.get("TS", "128,512,2048,8192").split(",")]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aslr_to_tpu.solvers.assoc_riccati import fddp_backward_assoc
    from aslr_to_tpu.solvers.ddp import _fddp_backward_scan
    from aslr_to_tpu.utils.compilation_cache import enable

    enable()
    jax.block_until_ready(jnp.zeros(()) + 1.0)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    ndx, nu = 8, 4

    def data(T, seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), 10)
        n = jax.random.normal
        Fx = jnp.eye(ndx, dtype=dtype) + 0.02 * n(ks[0], (B, T, ndx, ndx), dtype)
        Fu = 0.1 * n(ks[1], (B, T, ndx, nu), dtype)
        Lx = n(ks[2], (B, T, ndx), dtype)
        Lu = n(ks[3], (B, T, nu), dtype)
        W = 0.3 * n(ks[4], (B, T, ndx, ndx), dtype)
        Lxx = W @ jnp.swapaxes(W, -1, -2) + 0.5 * jnp.eye(ndx, dtype=dtype)
        Wu = 0.3 * n(ks[5], (B, T, nu, nu), dtype)
        Luu = Wu @ jnp.swapaxes(Wu, -1, -2) + 0.5 * jnp.eye(nu, dtype=dtype)
        Lxu = 0.05 * n(ks[6], (B, T, ndx, nu), dtype)
        tLx = n(ks[7], (B, ndx), dtype)
        Wt = 0.3 * n(ks[8], (B, ndx, ndx), dtype)
        tLxx = Wt @ jnp.swapaxes(Wt, -1, -2) + 0.5 * jnp.eye(ndx, dtype=dtype)
        fs = 0.05 * n(ks[9], (B, T + 1, ndx), dtype)
        return Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, tLx, tLxx, fs

    reg = jnp.asarray(1e-6, dtype)
    for T in HORIZONS:
        args = data(T, T)
        jax.block_until_ready(args)
        row = {"T": T}
        for name, fn in (("scan", _fddp_backward_scan),
                         ("assoc", fddp_backward_assoc)):
            f = jax.jit(jax.vmap(lambda *a: fn(*a, reg)))
            out = f(*args)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = f(*args)
            jax.block_until_ready(out)
            row[name] = (time.perf_counter() - t0) / REPS * 1e3
            # sanity: gains finite
            assert bool(jnp.all(jnp.isfinite(out[0])))
        row["speedup"] = row["scan"] / row["assoc"]
        print(f"T={T:6d}: scan {row['scan']:8.2f} ms  assoc {row['assoc']:8.2f} ms  "
              f"assoc/scan speedup {row['speedup']:5.2f}x  (B={B})", flush=True)


if __name__ == "__main__":
    main()
