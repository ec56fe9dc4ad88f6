"""ctypes bindings for the native C++ rigid-body oracle.

Builds ``native/librbd_oracle.so`` on demand (g++, cached) and exposes
``rnea`` / ``mass_matrix`` / ``fk`` over :class:`RobotModel` pytrees.
Used by the test suite as an independently-implemented numerical oracle —
the role Pinocchio's C++ plays for the reference's tests (SURVEY §4).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "rbd_oracle.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native", "librbd_oracle.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    if (not os.path.exists(so)) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-o", so, src], check=True)
    lib = ctypes.CDLL(so)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.rbd_rnea.argtypes = [ctypes.c_int] + [dp] * 10 + [ctypes.c_int, dp]
    lib.rbd_mass_matrix.argtypes = [ctypes.c_int] + [dp] * 8 + [dp]
    lib.rbd_fk.argtypes = [ctypes.c_int] + [dp] * 4 + [dp, dp]
    _LIB = lib
    return lib


def _ptr(a):
    return np.ascontiguousarray(a, dtype=np.float64).ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _model_arrays(model):
    return (
        np.asarray(model.joint_rot, dtype=np.float64),
        np.asarray(model.joint_pos, dtype=np.float64),
        np.asarray(model.axis, dtype=np.float64),
        np.asarray(model.mass, dtype=np.float64),
        np.asarray(model.com, dtype=np.float64),
        np.asarray(model.inertia, dtype=np.float64),
        np.asarray(model.gravity, dtype=np.float64),
    )


def rnea(model, q, v, a, gravity: bool = True):
    lib = _load()
    jr, jp, ax, ms, cm, it, gr = _model_arrays(model)
    nj = len(model.parents)
    tau = np.zeros(nj)
    lib.rbd_rnea(nj, _ptr(jr), _ptr(jp), _ptr(ax), _ptr(ms), _ptr(cm), _ptr(it), _ptr(gr),
                 _ptr(np.asarray(q)), _ptr(np.asarray(v)), _ptr(np.asarray(a)),
                 1 if gravity else 0, _ptr(tau))
    return tau


def mass_matrix(model, q):
    lib = _load()
    jr, jp, ax, ms, cm, it, gr = _model_arrays(model)
    nj = len(model.parents)
    M = np.zeros((nj, nj))
    lib.rbd_mass_matrix(nj, _ptr(jr), _ptr(jp), _ptr(ax), _ptr(ms), _ptr(cm), _ptr(it), _ptr(gr),
                        _ptr(np.asarray(q)), _ptr(M))
    return 0.5 * (M + M.T)


def fk(model, q):
    lib = _load()
    jr, jp, ax, _, _, _, _ = _model_arrays(model)
    nj = len(model.parents)
    rots = np.zeros((nj, 3, 3))
    trans = np.zeros((nj, 3))
    lib.rbd_fk(nj, _ptr(jr), _ptr(jp), _ptr(ax), _ptr(np.asarray(q)), _ptr(rots), _ptr(trans))
    return rots, trans
