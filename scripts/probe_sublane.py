"""Micro-probe: do [8,128]-shaped lane values run at ~the cost of [128]?

The lane kernels hold per-scenario scalars as 1-D [128] arrays. Mosaic
lays a 1-D vector on ONE sublane of the (8,128) vreg, so every
elementwise op in a serial dependency chain computes 128 useful values
out of a 1024-wide instruction — a 8x ceiling on VPU utilization that
matches the measured 5-14% rooflines (docs/BENCH.md). If ops on [8,128]
values (batch packed on sublanes AND lanes) cost the same per
instruction, repacking the kernels buys up to 8x.

Runs kernels with IDENTICAL per-element op counts over the same total
batch, with the in-register value shapes the kernels actually use
(refs are sliced to 1-D/2-D exactly like pallas/*.py do).

Timing note: through the axon tunnel ``jax.block_until_ready`` has been
observed to return before execution finishes — every measurement here
fetches a value to host (np.asarray) to close the timing interval.

Usage: python scripts/probe_sublane.py  (TPU; serialize with other TPU work)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 64 * 1024
CHAIN = 250       # serial dependent FMA chain length per fori step
LOOP = 96         # fori_loop trip count


def make_kernel(tile_shape, val_rank, ilp=1):
    """val_rank: rank of the in-register value the chain runs on; ilp:
    number of independent interleaved chains (CHAIN//ilp deep each)."""
    lead = len(tile_shape) - val_rank + 1   # leading ref axes to slice off

    def kern(x_ref, o_ref):
        idx = (0,) * lead
        x0 = x_ref[idx]

        def body(i, xs):
            for _ in range(CHAIN // ilp):
                xs = tuple(x * 0.9999 + x0 for x in xs)
            return xs

        xs = jax.lax.fori_loop(
            0, LOOP, body, tuple(x0 * (1e-6 * (k + 1)) for k in range(ilp)))
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[idx] = acc

    def call(x):
        grid = (x.shape[0],)
        blk = (1,) + tile_shape
        spec = pl.BlockSpec(blk, lambda g: (g,) + (0,) * len(tile_shape),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern, grid=grid, in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)

    return jax.jit(call)


def bench(name, tile_shape, val_rank, ilp=1):
    n_tile = int(np.prod(tile_shape))
    g = B // n_tile
    x = jnp.full((g,) + tile_shape, 1e-3, jnp.float32)
    fn = make_kernel(tile_shape, val_rank, ilp)
    t0 = time.perf_counter()
    val0 = float(np.asarray(fn(x)).ravel()[0])   # compile + warm, fetched
    t_warm = time.perf_counter() - t0
    times = []
    out = x
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(out)
        val = float(np.asarray(out).ravel()[0])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    ops = B * CHAIN * LOOP * 2  # fma = 2 flops per chain step
    print(f"{name:12s} tile={str(tile_shape):10s} grid={g:5d} "
          f"{dt*1e3:9.3f} ms  {ops/dt/1e9:8.1f} GFLOP/s  "
          f"(warm {t_warm:.1f}s, val {val0:.4g})", flush=True)
    return dt


def main():
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.zeros(()) + 1.0)
    print(f"[probe] device claimed +{time.perf_counter()-t0:.1f}s on "
          f"{jax.devices()[0].platform}", file=sys.stderr, flush=True)
    res = {}
    for p in (1, 2, 4, 8):
        for ilp in (1, 2, 4, 8):
            res[(p, ilp)] = bench(f"{p}x128/ilp{ilp}", (p, 128), 2 if p > 1 else 1,
                                  ilp=ilp)
    base = res[(1, 1)]
    print("speedup vs 1x128/ilp1 (same total work):")
    for (p, ilp), dt in sorted(res.items()):
        print(f"  P={p} ilp={ilp}: {base/dt:5.2f}x")


if __name__ == "__main__":
    main()
