"""Host-side per-iteration table — CallbackVerbose parity.

The reference attaches ``crocoddyl.CallbackVerbose`` to every example
solve (``examples/two_dof_sea.py:75``, ``examples/double_pendulum.py:61``)
and its iteration table is the first output a user sees. The solver here
is one jitted program, so per-iteration printing cannot happen in-loop;
instead :class:`..solvers.ddp.SolveLog` carries the same fields and this
module renders them after the fact in Crocoddyl's column format::

    iter     cost         stop         grad         xreg         ureg       step    ||ffeas||

Columns map as: grad = d1 (expected-improvement linear term), xreg = ureg
= the shared Levenberg-Marquardt regularizer (this solver, like Crocoddyl,
bumps both together), ||ffeas|| = the max defect-gap norm.
"""
from __future__ import annotations

import math

import numpy as np

_HEADER = ("iter     cost         stop         grad         xreg    "
           "     ureg       step    ||ffeas||")


def format_iteration_table(log, iterations=None) -> str:
    """Render a :class:`SolveLog` (one scenario) as Crocoddyl's verbose
    table. ``iterations`` truncates to the executed iteration count
    (``SolveResult.iterations``); rows whose cost is NaN (never executed)
    are skipped either way. Returns '' for an empty log (the lane solver
    records one only when built with ``keep_log=True``)."""
    costs = np.asarray(log.costs)
    if costs.ndim != 1 or costs.size == 0:
        return ""
    n = costs.shape[0] if iterations is None else min(int(iterations), costs.shape[0])
    stops = np.asarray(log.stops)
    regs = np.asarray(log.regs)
    steps = np.asarray(log.steps)
    d1 = np.asarray(log.d1)
    gaps = np.asarray(log.gap_norms)
    lines = [_HEADER]
    for i in range(n):
        if math.isnan(float(costs[i])):
            continue
        lines.append(
            f"{i:4d}  {float(costs[i]):11.5e}  {float(stops[i]):11.5e}  "
            f"{float(d1[i]):11.5e}  {float(regs[i]):11.5e}  {float(regs[i]):11.5e}  "
            f"{float(steps[i]):6.4f}  {float(gaps[i]):11.5e}")
    if len(lines) == 1:
        return ""
    return "\n".join(lines)


def print_iteration_table(log, iterations=None) -> None:
    s = format_iteration_table(log, iterations)
    if s:
        print(s)
