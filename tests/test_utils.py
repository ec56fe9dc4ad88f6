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


def test_verbose_table_renders_crocoddyl_columns(capsys):
    from aslr_to_tpu.utils.verbose import format_iteration_table, print_iteration_table

    log = SolveLog(*[np.abs(np.random.RandomState(3).randn(6)) for _ in range(7)])
    s = format_iteration_table(log, iterations=4)
    lines = s.splitlines()
    assert lines[0].split() == [
        "iter", "cost", "stop", "grad", "xreg", "ureg", "step", "||ffeas||"]
    assert len(lines) == 5  # header + 4 executed iterations
    assert lines[1].startswith("   0")

    # NaN rows (never-executed iterations) are skipped
    padded = SolveLog(*[np.concatenate([np.asarray(f), [np.nan] * 3])
                        for f in log])
    assert format_iteration_table(padded) == format_iteration_table(log)

    # empty log (lane solver results) renders nothing
    empty = SolveLog(*[np.zeros((0,)) for _ in range(7)])
    assert format_iteration_table(empty) == ""
    print_iteration_table(log, 2)
    out = capsys.readouterr().out
    assert "||ffeas||" in out and out.count("\n") == 3


def test_run_workload_verbose_prints_table(capsys):
    from aslr_to_tpu.workloads.run import run_workload

    out = run_workload("double_pendulum", verbose=True)
    text = capsys.readouterr().out
    assert text.splitlines()[0].startswith("iter")
    # one row per executed iteration
    assert len(text.strip().splitlines()) == int(out.result.iterations) + 1
