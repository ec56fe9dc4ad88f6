"""Utility smoke tests: plotting (Agg), io, metrics."""
import os

import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import numpy as np

from aslr_to_tpu.solvers.ddp import SolveLog
from aslr_to_tpu.utils import plotting
from aslr_to_tpu.utils.io import export_mat, load_solution, save_solution
from aslr_to_tpu.utils.metrics import u_squared


def _fake_traj():
    xs = np.random.RandomState(0).randn(21, 8)
    us = np.random.RandomState(1).randn(20, 4)
    return xs, us


def test_u_squared():
    _, us = _fake_traj()
    assert np.allclose(u_squared(jnp.asarray(us)), (us**2).sum(axis=0))


def test_plot_functions_run(tmp_path):
    xs, us = _fake_traj()
    plotting.plot_oc_solution(xs, us, stiffness=True, show=False)
    plotting.plot_sea_oc_solution(xs, us, fig_index=3, show=False)
    plotting.plot_rigid_oc_solution(xs[:, :4], us, fig_index=4, show=False)
    plotting.plot_stiffness(us, show=False)
    plotting.plot_theta(xs, 2, show=False)
    log = SolveLog(*[np.abs(np.random.RandomState(2).randn(30)) for _ in range(7)])
    plotting.plot_kkt_error(log.stops, fig_index=5, show=False)
    plotting.plot_convergence(log, fig_index=6, show=False)


def test_io_roundtrip(tmp_path):
    xs, us = _fake_traj()
    p = str(tmp_path / "sol.npz")
    save_solution(p, xs, us, dt=0.01, extra=dict(cost=1.5))
    xs2, us2 = load_solution(p)
    assert np.allclose(xs, xs2)
    assert np.allclose(us, us2)
    export_mat(str(tmp_path / "sol.mat"), xs, us, 0.01)
    from scipy.io import loadmat
    m = loadmat(str(tmp_path / "sol.mat"))
    assert "q1" in m and "u1" in m and "t" in m
