#!/usr/bin/env python
"""Inertial-parameter sensitivity study for docs/PARITY.md (VERDICT r1 #3).

The reference's exact `asr_twodof` inertial parameters live in the
author's example-robot-data fork and are not recoverable offline; the
registry's masses/inertias are plausible reconstructions pinned only by
the reference's FK printout at q=0 (models/robots.py). This script
quantifies what that uncertainty can change: it solves the reference
workloads with all masses+inertias scaled by s in {0.5, 0.75, 1.0, 1.5,
2.0} and reports the final EE position, cost, iteration count, and
control effort per scale — the honest bound on what trajectory parity
claims can mean without the true URDF.

Runs on CPU in float64 (parity mode). Usage: python scripts/sensitivity.py
"""
import dataclasses
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from aslr_to_tpu.models import robots
from aslr_to_tpu.workloads import presets
from aslr_to_tpu.workloads.run import run_workload

SCALES = (0.5, 0.75, 1.0, 1.5, 2.0)

# (preset builder, needs asr_twodof?, globalization, T, maxiter_override)
CASES = [
    ("two_dof_sea", presets.two_dof_sea, "asr_twodof", None, 100),
    ("double_pendulum", presets.double_pendulum, "double_pendulum", None, 100),
    ("two_dof_vsa_boxddp", presets.two_dof_vsa_boxddp, "asr_twodof", "homotopy", 200),
    ("two_dof_vsa_modified", presets.two_dof_vsa_modified, "asr_twodof", "homotopy", 200),
]


def scaled_robot(name, s):
    r = getattr(robots, name)()
    return dataclasses.replace(r, mass=r.mass * s, inertia=r.inertia * s)


def main():
    t_override = os.environ.get("SENS_T")
    for name, builder, robot_name, glob, maxiter in CASES:
        rows = []
        for s in SCALES:
            kwargs = {"robot": scaled_robot(robot_name, s)}
            if t_override:
                kwargs["T"] = int(t_override)
            w = builder(**kwargs)
            w = w._replace(maxiter=maxiter)
            out = run_workload(w, globalization=glob)
            res = out.result
            ee = np.asarray(out.ee_final)
            tgt = np.asarray(w.target) if w.target is not None else None
            rows.append(dict(
                scale=s,
                ee=[round(float(v), 5) for v in ee],
                ee_err=(round(float(np.linalg.norm(ee - tgt)), 5)
                        if tgt is not None else None),
                cost=round(float(res.cost), 4),
                iterations=int(res.iterations),
                converged=bool(res.converged),
                u_sq=round(float(np.sum(np.asarray(out.u_sq))), 4),
            ))
            print(f"[sens] {name} s={s}: {rows[-1]}", file=sys.stderr, flush=True)
        print(json.dumps({"workload": name, "rows": rows}))


if __name__ == "__main__":
    main()
