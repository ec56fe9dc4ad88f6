#!/usr/bin/env python
"""North-star runs at the EXACT reference budgets (VERDICT r1 #4).

Solves the four reference workloads at the budgets the reference scripts
use — not the T<=80 proxies the fast tests use — and prints one JSON line
per run. The committed results live in docs/northstar.json and back the
claims in docs/PARITY.md; tests/test_northstar.py re-runs the sea/pendulum
configs when RUN_SLOW=1.

Budgets (reference file:line):
  - two_dof_sea:        FDDP,   T=100, maxiter=100, th_stop=1e-7, warm
                        (two_dof_sea.py:61,78-81)
  - double_pendulum:    FDDP,   T=10, maxiter=100 (double_pendulum.py:51,70)
  - two_dof_vsa_boxddp: BoxDDP, T=200, maxiter=400, th_stop=1e-7, cold
                        (two_dof_vsa_boxddp.py:58,79-81) — run both cold
                        (documents the known BoxDDP cold-start stall) and
                        with the terminal-weight homotopy fix
  - two_dof_vsa_modified: same budget (two_dof_vsa_modified.py)

Runs on CPU in float64 (parity mode). Usage: python scripts/northstar.py
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from aslr_to_tpu.workloads.presets import PRESETS
from aslr_to_tpu.workloads.run import run_workload

RUNS = [
    # (preset, kwargs, globalization)
    ("two_dof_sea", {}, None),
    ("double_pendulum", {}, None),
    ("two_dof_vsa_boxddp", {}, None),
    ("two_dof_vsa_boxddp", {}, "homotopy"),
    ("two_dof_vsa_modified", {}, None),
    ("two_dof_vsa_modified", {}, "homotopy"),
]


def main():
    results = []
    for name, kwargs, glob in RUNS:
        w = PRESETS[name](**kwargs)
        t0 = time.perf_counter()
        out = run_workload(w, globalization=glob)
        res = out.result
        ee = np.asarray(out.ee_final)
        tgt = np.asarray(w.target) if w.target is not None else None
        row = dict(
            workload=name,
            globalization=glob,
            T=w.problem.T,
            maxiter=w.maxiter,
            th_stop=w.th_stop,
            warm_start=w.warm_start,
            converged=bool(res.converged),
            iterations=int(res.iterations),
            cost=round(float(res.cost), 6),
            stop=float(res.stop),
            ee=[round(float(v), 6) for v in ee],
            ee_err=(round(float(np.linalg.norm(ee - tgt)), 6)
                    if tgt is not None else None),
            u_sq=round(float(np.sum(np.asarray(out.u_sq))), 4),
            wall_s=round(time.perf_counter() - t0, 1),
        )
        results.append(row)
        print(json.dumps(row), flush=True)
        print(f"[northstar] {name} glob={glob}: done in {row['wall_s']}s",
              file=sys.stderr, flush=True)
    out_path = os.path.join(os.path.dirname(__file__), "..", "docs", "northstar.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[northstar] wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
