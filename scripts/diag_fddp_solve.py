#!/usr/bin/env python
"""Time the full FDDP/SEA fast-path solve compile on TPU (round-2 item:
was ~547s vs ~27s for the BoxDDP set)."""
import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp

from aslr_to_tpu.workloads.presets import two_dof_sea
from aslr_to_tpu.workloads.run import solve_workload

w = two_dof_sea(T=100, dtype=jnp.float32)
t0 = time.perf_counter()
res = solve_workload(w, use_fast_path=True)
print("fddp fast solve compile+run:", round(time.perf_counter() - t0, 1),
      "s, iters", int(res.iterations), "cost", float(res.cost), flush=True)
