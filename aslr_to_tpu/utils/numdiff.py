"""Finite-difference derivative oracle for tests.

Replaces the reference's ``crocoddyl.DifferentialActionModelNumDiff`` +
``assertNumDiff`` harness (``unittest/test_utils_ex.py:4-20``,
``unittest/test_asr_free_fwddyn.py:20-26``): central differences around a
nominal point, with the reference's loose tolerance convention
(``NUMDIFF_MODIFIER = 3e4`` times the disturbance).
"""
from __future__ import annotations

import numpy as np

NUMDIFF_MODIFIER = 3e4  # reference unittest/test_utils_ex.py:4


def numdiff(fn, x, eps: float = 1e-6):
    """Central-difference Jacobian of ``fn`` at ``x`` (columns = inputs)."""
    x = np.asarray(x, dtype=np.float64)
    f0 = np.asarray(fn(x))
    J = np.zeros(f0.shape + (x.size,), dtype=np.float64)
    for i in range(x.size):
        dx = np.zeros_like(x)
        dx[i] = eps
        J[..., i] = (np.asarray(fn(x + dx)) - np.asarray(fn(x - dx))) / (2.0 * eps)
    return J


def assert_numdiff(analytic, numerical, tol: float = NUMDIFF_MODIFIER * 1e-6, msg: str = ""):
    """Assert closeness with the reference's NUMDIFF tolerance semantics."""
    analytic = np.asarray(analytic)
    numerical = np.asarray(numerical)
    err = np.max(np.abs(analytic - numerical))
    assert err < tol, f"numdiff mismatch {msg}: max err {err} > tol {tol}"
