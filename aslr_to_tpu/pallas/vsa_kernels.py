"""Fused Pallas kernels for the soft-actuated workload families.

The generic solver is layout-bound in XLA: every op on ``[B, 8, 8]``-style
tensors uses a fraction of the vector lanes, so solve time scales linearly
with batch (measured: ~52 solves/s flat from B=256 to B=1024). These
kernels run the two remaining hot phases — the nonlinear rollout and the
knot linearization — entirely in lane layout (batch on the 128-wide vector
lanes) with the dynamics from :mod:`..ops.lanes` traced inline, including
the RNEA partial derivatives via ``jax.jvp`` seeds *inside* the kernel.

Specialization contract (checked by the builder): VSA or SEA dynamics on
a concrete serial revolute chain, Euler integrator, and the reference
cost structure — frame-placement goal + weighted state/control
regularizers + optional linear stiffness cost (covers
``two_dof_vsa_boxddp``, ``two_dof_vsa_modified``, ``two_dof_sea``, and
the talos_arm-class ``seven_dof_sea``). Chain-length generic since round
5: the per-knot algebra unrolls over ``ndx = 4 * nl`` at trace time (the
lanes.* recursions loop over the baked topology; the n x n mass solve is
an unrolled lane Cholesky, ops/lanes.solven), with the original 2-DoF
adjugate/closed-form paths kept verbatim for bit-parity at ``nl == 2``.
Big-state (ndx > 8) kernels run under a raised Mosaic scoped-VMEM budget
(:func:`_big_state_params`). The generic XLA path remains the reference
implementation and fallback.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import lanes
from ..ops.lanes import RobotConsts
from ..utils.vma import out_structs
from . import layout

NDX = 8
NU = 4
NL = 2


def _big_state_params(ndx):
    """Raised Mosaic scoped-VMEM budget for the big-state (ndx > 8)
    kernels: the live [ndx, ndx, P, nb] per-knot intermediates plus
    XLA's VMEM-promoted inter-kernel buffers exceed the 16 MiB default
    (measured 20-24 MB at ndx=28); v5e has 128 MiB physical VMEM. None
    (the default budget) for the 2-DoF flagship kernels."""
    from jax.experimental.pallas import tpu as _pltpu

    if ndx <= 8:
        return None
    return _pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


class VSASpec(NamedTuple):
    """Concrete (numpy) snapshot of the workload the kernels specialize on."""

    rc: RobotConsts
    dt: float
    binv: np.ndarray          # [2,2] inverse motor inertia
    frame_id: int
    target_rot_inv: np.ndarray  # [3,3] target inverse rotation ([T,3,3] per-knot)
    target_pos: np.ndarray      # [3] target translation ([T,3] per-knot)
    w_goal: float
    w_goal_term: float
    xw: np.ndarray            # [8] combined state-reg weights (weight * activation)
    uw: np.ndarray            # [4] combined control-reg weights
    stiff_w: float            # combined linear stiffness weight (weight * lamda)
    stiff_ref: np.ndarray     # [2] stiffness reference
    lb: np.ndarray            # [nu] (None: unbounded; [T, nu] per-knot box)
    ub: np.ndarray
    variant: str = "vsa"      # "vsa" (stiffness in u, nu=4) | "sea" (fixed K, nu=2)
    K: np.ndarray = None      # [2,2] spring matrix (SEA)
    nu: int = 4
    nl: int = NL              # chain DoF; the kernels are dimension-generic
                              # (ndx = 4*nl: q_l, q_m, v_l, v_m)
    # terminal target when it differs from the (per-knot) running target
    term_target_rot_inv: np.ndarray = None   # [3,3]
    term_target_pos: np.ndarray = None       # [3]

    @property
    def ndx(self) -> int:
        return 4 * self.nl

    @property
    def per_knot_target(self) -> bool:
        return self.target_rot_inv is not None and np.ndim(self.target_rot_inv) == 3

    @property
    def per_knot_box(self) -> bool:
        return self.lb is not None and np.ndim(self.lb) == 2

    def target_table(self, T: int, dtype) -> np.ndarray:
        """[T, 12] per-knot target rows (flattened R_inv | pos) for the
        kernels' SMEM input; broadcast when the target is shared."""
        Ri = np.asarray(self.target_rot_inv, dtype=np.float64)
        tp = np.asarray(self.target_pos, dtype=np.float64)
        if not self.per_knot_target:
            Ri = np.broadcast_to(Ri, (T, 3, 3))
            tp = np.broadcast_to(tp, (T, 3))
        return np.concatenate(
            [Ri.reshape(T, 9), tp.reshape(T, 3)], axis=1).astype(dtype)


def extract_vsa_spec(problem, bounds) -> VSASpec:
    """Introspect a concrete ShootingProblem built from the VSA presets.

    Per-knot problems (``problem.per_knot``, reference generality: models
    attached per node, ``two_dof_vsa_boxddp.py:59-60``) are covered when
    the knot-to-knot variation is limited to the frame-placement target
    (time-varying tracking, examples/mpc_tracking.py) and/or the control
    box ([T, nu] Bounds); any other varying leaf raises TypeError and the
    problem runs on the generic path.
    """
    per_knot = bool(getattr(problem, "per_knot", False))
    T = problem.T

    def const(leaf, what):
        """Per-knot pytree leaves (stacked [T, ...] by ``stack_knots``) must
        be constant across knots — only the frame target and the control box
        may vary (static dataclass fields are never stacked)."""
        a = np.asarray(leaf)
        if per_knot and a.ndim >= 1 and a.shape[0] == T:
            if not np.all(a == a[:1]):
                raise TypeError(f"fast path requires knot-constant {what}; "
                                "only the frame target and the control box "
                                "may vary per knot")
            a = a[0]
        return a

    if bounds is not None and np.ndim(bounds.lb) not in (1, 2):
        raise TypeError("bounds must be [nu] shared or [T, nu] per-knot")
    from ..models.costs import (
        ActivationModelQuad,
        ActivationModelWeightedQuad,
        CostModelResidual,
        CostModelStiffness,
        ResidualModelControl,
        ResidualModelFramePlacementASR,
        ResidualModelState,
    )
    from ..models.dynamics import DifferentialSEADynamics, DifferentialVSADynamics

    running = problem.running
    diff = running.differential
    terminal_diff = problem.terminal.differential
    robot = (problem.knot_model(0) if per_knot else running).differential.state.robot
    nl = int(robot.nv)       # kernels are chain-length generic (round 5)
    if isinstance(diff, DifferentialVSADynamics):
        variant, nu, K = "vsa", 2 * nl, None
    elif isinstance(diff, DifferentialSEADynamics):
        from ..models.actuation import ASRActuation
        if not isinstance(diff.actuation, ASRActuation):
            raise TypeError("SEA fast path requires ASRActuation")
        variant, nu, K = "sea", nl, const(diff.K, "spring matrix")
    else:
        raise TypeError("fast path requires VSA or SEA dynamics")

    def act_weights(cost, nr):
        if isinstance(cost.activation, ActivationModelQuad):
            return np.ones(nr)
        if isinstance(cost.activation, ActivationModelWeightedQuad):
            return const(cost.activation.weights, "activation weights")
        raise TypeError(f"unsupported activation {type(cost.activation)}")

    w_goal = w_goal_term = 0.0
    xw = np.zeros(4 * nl)
    uw = np.zeros(nu)
    stiff_w = 0.0
    stiff_ref = np.zeros(nl)
    frame_id = None
    target_rot = np.eye(3)
    target_pos = np.zeros(3)

    for it in diff.costs.items:
        c = it.cost
        w = float(const(it.weight, "cost weight"))
        if isinstance(c, CostModelStiffness):
            stiff_w += w * float(const(c.lamda, "stiffness lamda"))
            if c.Kref is not None:
                stiff_ref = const(c.Kref, "stiffness reference").astype(np.float64)
            continue
        if not isinstance(c, CostModelResidual):
            raise TypeError(f"unsupported running cost {type(c)}")
        r = c.residual
        if isinstance(r, ResidualModelFramePlacementASR):
            w_goal += w
            frame_id = int(r.frame_id)      # static field, never stacked
            # the ONLY leaves allowed to vary per knot: the frame target
            target_rot = np.asarray(r.placement.rot, dtype=np.float64)
            target_pos = np.asarray(r.placement.trans, dtype=np.float64)
            if per_knot and np.all(target_rot == target_rot[:1]) \
                    and np.all(target_pos == target_pos[:1]):
                target_rot, target_pos = target_rot[0], target_pos[0]
            if not np.allclose(act_weights(c, 6), 1.0):
                raise TypeError("goal activation must be plain quad")
        elif isinstance(r, ResidualModelState):
            if not np.allclose(const(r.xref, "state reference"), 0.0):
                raise TypeError("fast path assumes zero state reference")
            xw += w * act_weights(c, 4 * nl)
        elif isinstance(r, ResidualModelControl):
            uw += w * act_weights(c, nu)
        else:
            raise TypeError(f"unsupported residual {type(r)}")

    term_rot = term_pos = None
    for it in terminal_diff.costs.items:
        c = it.cost
        if isinstance(c, CostModelResidual) and isinstance(c.residual, ResidualModelFramePlacementASR):
            w_goal_term += float(np.asarray(it.weight))
            term_rot = np.asarray(c.residual.placement.rot, dtype=np.float64)
            term_pos = np.asarray(c.residual.placement.trans, dtype=np.float64)
        else:
            raise TypeError("fast path assumes goal-only terminal cost")

    per_knot_target = target_rot.ndim == 3
    if per_knot_target and target_rot.shape[0] != T:
        raise TypeError("per-knot target must have one row per knot")
    # terminal target separate only when it differs from the running one
    if term_rot is not None and not per_knot_target and \
            np.array_equal(term_rot, target_rot) and np.array_equal(term_pos, target_pos):
        term_rot = term_pos = None
    if per_knot_target and term_rot is None:
        # no terminal placement cost (w_goal_term = 0): evaluate the
        # (weight-0) terminal goal at the last knot's target
        term_rot, term_pos = target_rot[-1], target_pos[-1]

    lb = None if bounds is None else np.asarray(bounds.lb, dtype=np.float64)
    ub = None if bounds is None else np.asarray(bounds.ub, dtype=np.float64)
    if lb is not None and lb.ndim == 2 and lb.shape[0] != T:
        raise TypeError("per-knot bounds must be [T, nu]")

    return VSASpec(
        rc=RobotConsts(robot),
        dt=float(running.dt),               # static field, never stacked
        binv=np.linalg.inv(const(diff.B, "motor inertia").astype(np.float64)),
        frame_id=frame_id,
        target_rot_inv=(np.swapaxes(target_rot, -1, -2)),
        target_pos=target_pos,
        w_goal=w_goal,
        w_goal_term=w_goal_term,
        xw=xw,
        uw=uw,
        stiff_w=stiff_w,
        stiff_ref=stiff_ref,
        lb=lb,
        ub=ub,
        variant=variant,
        K=K,
        nu=nu,
        nl=nl,
        term_target_rot_inv=None if term_rot is None else term_rot.T,
        term_target_pos=term_pos,
    )


# ---------------------------------------------------------------------------
# shared lane-level pieces
# ---------------------------------------------------------------------------

def _dot_terms(terms):
    """Left-to-right sum without a leading zero — preserves the exact
    accumulation order (and bits) of the old hand-unrolled 2-DoF code."""
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def _dynamics_lanes(spec: VSASpec, x, u):
    """Soft-arm accelerations: x list of 4*nl lanes, u list of nu lanes ->
    2*nl lanes. VSA: u = [tau_m(nl), k(nl)], K = diag(k). SEA: u =
    tau_m(nl), K constant. Chain-length generic (the lanes.* recursions
    loop over the baked topology)."""
    nl = spec.nl
    q_l = list(x[:nl])
    q_m = list(x[nl:2 * nl])
    v_l = list(x[2 * nl:3 * nl])
    tau_m = list(u[:nl])
    if spec.variant == "vsa":
        kd = list(u[nl:2 * nl])
        tau_c = [kd[i] * (q_l[i] - q_m[i]) for i in range(nl)]
    else:
        Kc = spec.K
        d = [q_l[i] - q_m[i] for i in range(nl)]
        tau_c = [_dot_terms([float(Kc[i][j]) * d[j] for j in range(nl)])
                 for i in range(nl)]

    M, nle = lanes.mass_nle_lanes(spec.rc, q_l, v_l)
    rhs = [-nle[i] - tau_c[i] for i in range(nl)]
    a_l = list(lanes.solven(M, rhs))
    binv = tuple(tuple(float(b) for b in row) for row in spec.binv)
    a_m = [
        _dot_terms([binv[i][j] * (tau_m[j] + tau_c[j]) for j in range(nl)])
        for i in range(nl)
    ]
    return a_l + a_m


def _tgt_at(tgt_ref, t):
    """Read one knot's target row ([..., 12] SMEM: flat R_inv | pos) as
    (R_inv 3x3 tuple, pos 3-tuple) of scalars — scalars broadcast against
    lane values in the tuple algebra, so no lane-wide DMA is spent on a
    batch-invariant quantity."""
    return (tuple(tuple(tgt_ref[t, 3 * i + j] for j in range(3)) for i in range(3)),
            tuple(tgt_ref[t, 9 + j] for j in range(3)))


def _goal_cost_lanes(spec: VSASpec, q_l, tgt=None, terminal=False):
    """0.5 * || log6(target^-1 oMf) ||^2 on lanes; also returns r (6 lanes).

    ``tgt``: optional runtime (R_inv, pos) from :func:`_tgt_at` — the
    per-knot tracking target; None uses the spec's baked constants
    (``terminal`` selects the terminal target when it differs)."""
    rots, trans = lanes.fk_lanes(spec.rc, q_l)
    R, p = lanes.frame_placement_lanes(spec.rc, rots, trans, spec.frame_id)
    if tgt is not None:
        Ri, tp = tgt
    elif terminal and spec.term_target_rot_inv is not None:
        Ri = lanes.m_const(spec.term_target_rot_inv, q_l[0])
        tp = lanes.v_const(spec.term_target_pos, q_l[0])
    else:
        Ri = lanes.m_const(spec.target_rot_inv, q_l[0])
        tp = lanes.v_const(spec.target_pos, q_l[0])
    rM = lanes.m_mul(Ri, R)
    rp = lanes.m_vec(Ri, lanes.v_sub(p, tp))
    r6 = lanes.log6_lanes(rM, rp)
    c = 0.5 * sum(ri * ri for ri in r6)
    return c, r6


def _running_cost_lanes(spec: VSASpec, x, u, tgt=None):
    c_goal, _ = _goal_cost_lanes(spec, list(x[:spec.nl]), tgt)
    c = spec.w_goal * c_goal
    for i in range(spec.ndx):
        if spec.xw[i] != 0.0:
            c = c + 0.5 * float(spec.xw[i]) * x[i] * x[i]
    for i in range(spec.nu):
        if spec.uw[i] != 0.0:
            c = c + 0.5 * float(spec.uw[i]) * u[i] * u[i]
    if spec.stiff_w != 0.0:
        for i in range(spec.nl):
            c = c + float(spec.stiff_w) * (u[spec.nl + i] - float(spec.stiff_ref[i]))
    return c


# ---------------------------------------------------------------------------
# rollout kernels
# ---------------------------------------------------------------------------
#
# The rollout's T loop is chunked INSIDE the grid: ``grid = (batch_tiles,
# n_chunks)`` with the chunk axis innermost (TPU grids execute
# sequentially), the integration state carried in VMEM scratch across
# chunk steps, and the running cost accumulated the same way. This keeps
# blocks VMEM-sized at the (8, 128)-packed batch layout (see .layout).
# Knots at global index >= T (end padding from pick_chunks) are masked
# no-ops. The contracted initial state x0t is emitted as its own output
# (writing it into row 0 of xs_out would need a +1-shifted, unalignable
# block); the host wrapper concatenates.

def _rollout_trial_step(spec, t, trow, alpha, gscale, x, xr, kt, Kt, ut,
                        lb_ref, ub_ref, fsb_ref, use_gaps, tgt=None):
    """One knot of one line-search trial; returns (x_new list, u list,
    running cost). ``t`` indexes the VMEM time blocks (chunk-local);
    ``trow`` the whole-table SMEM refs (global knot). Per-knot boxes
    arrive as [Tp, nu] SMEM tables; shared boxes as [nu, P, nb] lanes."""
    dt = spec.dt
    nu = spec.nu
    NDX = spec.ndx
    dx = [x[i] - xr[i] for i in range(NDX)]
    u = []
    for j in range(nu):
        fb = kt[j] * alpha
        for i in range(NDX):
            fb = fb + Kt[j, i] * dx[i]
        uj = ut[j] - fb
        if lb_ref is not None:
            if spec.per_knot_box:
                uj = jnp.clip(uj, lb_ref[trow, j], ub_ref[trow, j])
            else:
                uj = jnp.clip(uj, lb_ref[j], ub_ref[j])
        u.append(uj)

    a = _dynamics_lanes(spec, x, u)
    cost_t = _running_cost_lanes(spec, x, u, tgt)

    x_new = []
    for i in range(NDX // 2):
        x_new.append(x[i] + x[NDX // 2 + i] * dt + a[i] * dt * dt)
    for i in range(NDX // 2):
        x_new.append(x[NDX // 2 + i] + a[i] * dt)
    if use_gaps:
        fs_n = fsb_ref[t]            # fs[global_t + 1]
        x_new = [x_new[i] + fs_n[i] * gscale for i in range(NDX)]
    return x_new, u, cost_t


def _rollout_x0t(spec, x0_ref, fsa_ref, gscale, use_gaps):
    if use_gaps:
        return jnp.stack([x0_ref[i] + fsa_ref[0][i] * gscale
                          for i in range(spec.ndx)])
    return x0_ref[:]


def _unpack_rollout_refs(spec, use_gaps, n_alpha, refs):
    """Shared ref unpacking: [xs, us, k, K, x0, alphas..., (fsa, fsb if
    gaps), wterm, (tgt if per-knot target), (lb, ub if boxed)] then
    outputs + scratch."""
    it = iter(refs)
    xs_ref, us_ref, k_ref, K_ref, x0_ref = (next(it) for _ in range(5))
    alphas = tuple(next(it) for _ in range(n_alpha))
    if use_gaps:
        fsa_ref, fsb_ref, infeas_ref = next(it), next(it), next(it)
    else:
        fsa_ref = fsb_ref = infeas_ref = None
    wterm_ref = next(it)
    tgt_ref = next(it) if spec.per_knot_target else None
    if spec.lb is not None:
        lb_ref, ub_ref = next(it), next(it)
    else:
        lb_ref = ub_ref = None
    return (xs_ref, us_ref, k_ref, K_ref, x0_ref, alphas, fsa_ref, fsb_ref,
            infeas_ref, wterm_ref, tgt_ref, lb_ref, ub_ref, tuple(it))


def _rollout_kernel(spec: VSASpec, T: int, Tc: int, NC: int, use_gaps: bool,
                    *refs):
    (xs_ref, us_ref, k_ref, K_ref, x0_ref, (alpha_ref,), fsa_ref, fsb_ref,
     infeas_ref, wterm_ref, tgt_ref, lb_ref, ub_ref, rest) = _unpack_rollout_refs(
        spec, use_gaps, 1, refs)
    (xs_out, us_out, x0t_out, cost_ref, x_s, cost_s) = rest
    NDX = spec.ndx
    j = pl.program_id(1)
    alpha = alpha_ref[:]
    gscale = (alpha - 1.0) * infeas_ref[:] if use_gaps else None

    @pl.when(j == 0)
    def _():
        x0t = _rollout_x0t(spec, x0_ref, fsa_ref, gscale, use_gaps)
        x_s[:] = x0t
        x0t_out[:] = x0t
        cost_s[:] = jnp.zeros_like(cost_s)

    def body(t, cost_acc):
        x = [x_s[i] for i in range(NDX)]
        trow = j * Tc + t
        tgt = None if tgt_ref is None else _tgt_at(tgt_ref, trow)
        x_new, u, cost_t = _rollout_trial_step(
            spec, t, trow, alpha, gscale, x, xs_ref[t], k_ref[t], K_ref[t],
            us_ref[t], lb_ref, ub_ref, fsb_ref, use_gaps, tgt)
        if NC * Tc > T:
            valid = (j * Tc + t) < T
            x_new = [jnp.where(valid, xn, xo) for xn, xo in zip(x_new, x)]
            cost_t = jnp.where(valid, cost_t, 0.0)
        x_stack = jnp.stack(x_new)
        x_s[:] = x_stack
        xs_out[t] = x_stack
        us_out[t] = jnp.stack(u)
        return cost_acc + cost_t

    cost = jax.lax.fori_loop(0, Tc, body, jnp.zeros_like(alpha))
    cost_s[:] += cost

    @pl.when(j == NC - 1)
    def _():
        xT = [x_s[i] for i in range(NDX)]
        c_goal_T, _ = _goal_cost_lanes(spec, xT[:spec.nl], terminal=True)
        # terminal goal weight is a runtime lane input (homotopy ramps it)
        cost_ref[:] = cost_s[:] + wterm_ref[:] * c_goal_T


def _rolloutn_kernel(spec: VSASpec, T: int, Tc: int, NC: int, use_gaps: bool,
                     n_trials: int, *refs):
    """``n_trials`` line-search trials per launch (one alpha ladder rung
    each per lane).

    The rollout is latency/issue-bound (~3.3 kflops/lane-knot over a
    serial T loop, docs/BENCH.md rooflines); evaluating several step
    lengths in one pass reuses every loaded input (xs/us/k/K) and divides
    the line-search rounds, and the trajectories' dependency chains
    interleave inside the knot body (independent work the VPU can
    overlap — measured: REMOVING the second trial loses 4-6%, so extra
    trials ride the latency shadow nearly free). Trial math is the exact
    op sequence of _rollout_kernel per trajectory, so results are
    bit-identical to separate launches."""
    (xs_ref, us_ref, k_ref, K_ref, x0_ref, alpha_refs,
     fsa_ref, fsb_ref, infeas_ref, wterm_ref, tgt_ref, lb_ref, ub_ref,
     rest) = _unpack_rollout_refs(spec, use_gaps, n_trials, refs)
    per_trial, tail = rest[:3 * n_trials], rest[3 * n_trials:]
    xs_outs = per_trial[0::3]
    us_outs = per_trial[1::3]
    cost_refs = per_trial[2::3]
    x0t_out = tail[0]
    x_scratch = tail[1:1 + n_trials]
    cost_s = tail[1 + n_trials]
    NDX = spec.ndx
    j = pl.program_id(1)
    alphas = [a_ref[:] for a_ref in alpha_refs]
    if use_gaps:
        infeas = infeas_ref[:]
        gscales = [(a - 1.0) * infeas for a in alphas]
    else:
        gscales = [None] * n_trials
    trials = tuple(
        (alphas[i], gscales[i], xs_outs[i], us_outs[i], x_scratch[i])
        for i in range(n_trials))

    @pl.when(j == 0)
    def _():
        # each trial's gap-contracted initial state (they differ by gscale)
        for i, (_, gscale, _, _, x_s) in enumerate(trials):
            x0t = _rollout_x0t(spec, x0_ref, fsa_ref, gscale, use_gaps)
            x_s[:] = x0t
            x0t_out[i] = x0t
        cost_s[:] = jnp.zeros_like(cost_s)

    def body(t, costs):
        xr = xs_ref[t]
        kt = k_ref[t]
        Kt = K_ref[t]
        ut = us_ref[t]
        trow = j * Tc + t
        tgt = None if tgt_ref is None else _tgt_at(tgt_ref, trow)
        new_costs = []
        for (alpha, gscale, xs_out, us_out, x_s), cost_acc in zip(trials, costs):
            x = [x_s[i] for i in range(NDX)]
            x_new, u, cost_t = _rollout_trial_step(
                spec, t, trow, alpha, gscale, x, xr, kt, Kt, ut,
                lb_ref, ub_ref, fsb_ref, use_gaps, tgt)
            if NC * Tc > T:
                valid = (j * Tc + t) < T
                x_new = [jnp.where(valid, xn, xo) for xn, xo in zip(x_new, x)]
                cost_t = jnp.where(valid, cost_t, 0.0)
            x_stack = jnp.stack(x_new)
            x_s[:] = x_stack
            xs_out[t] = x_stack
            us_out[t] = jnp.stack(u)
            new_costs.append(cost_acc + cost_t)
        return tuple(new_costs)

    zero = jnp.zeros_like(alphas[0])
    costs = jax.lax.fori_loop(0, Tc, body, (zero,) * n_trials)
    for i in range(n_trials):
        cost_s[i] += costs[i]

    @pl.when(j == NC - 1)
    def _():
        for idx, (_, _, _, _, x_s) in enumerate(trials):
            xT = [x_s[i] for i in range(NDX)]
            c_goal_T, _ = _goal_cost_lanes(spec, xT[:spec.nl], terminal=True)
            cost_refs[idx][:] = cost_s[idx] + wterm_ref[:] * c_goal_T


def _rollout_layout(T, nb, n_trials, use_gaps, itemsize, t_chunk=20, pack=None,
                    ndx=NDX, nu=NU):
    """Chunk plan from the VMEM budget (see riccati._chunk_plan);
    dimension-generic (reduces to the measured 2-DoF plan at the
    defaults: 8 + 4 + 4 + 32 + 12/trial)."""
    per_knot = ndx + nu + nu + nu * ndx + n_trials * (ndx + nu)
    if use_gaps:
        per_knot += 2 * ndx                      # fs (two shifted views)
    budget = 6 * 1024 * 1024
    tc_mem = max(1, budget // (per_knot * (pack or layout.PACK) * nb * itemsize))
    return layout.pick_chunks(T, min(t_chunk, tc_mem))


def _rollout_call(spec, T, nb, interpret, use_gaps, n_trials,
                  xs_l, us_l, k_l, K_l, x0_l, alphas_l,
                  fs_l, infeas_l, wterm_l, lb_l, ub_l, tiles=1):
    """Shared host wrapper for the 1- and N-trial rollout kernels
    (``n_trials`` alpha rungs per launch; 2 is the measured optimum,
    docs/BENCH.md round 4).

    Lane-layout IO (trailing dim Bp per layout.padded_batch). Returns a
    list of (xs_try [T+1,8,Bp], us_try [T,nu,Bp], cost [Bp]) per trial.

    ``tiles`` > 1 processes that many (PACK, nb) batch tiles per grid
    step (block sublane dim tiles*PACK): each vector op in the serial
    per-knot chain then issues ``tiles`` back-to-back vreg instructions
    on independent scenarios — instruction-level parallelism for the
    latency-bound T loop at the cost of tiles x the VMEM footprint
    (compensated by a shorter time chunk). Silently degrades to 1 when
    the padded batch has too few rows.
    """
    nu = spec.nu
    NDX = spec.ndx
    dtype = xs_l.dtype
    Bp = xs_l.shape[-1]
    rows, P, G = layout.pack_dims(Bp, nb)
    if tiles > 1 and rows % (tiles * P) == 0:
        P *= tiles
        G //= tiles
    Tc, NC, padt = _rollout_layout(T, nb, n_trials, use_gaps, dtype.itemsize,
                                   pack=P, ndx=NDX, nu=nu)
    Tp = T + padt

    def prep_t(x):          # pad the time axis at the END, then pack
        if padt:
            widths = [(0, padt)] + [(0, 0)] * (x.ndim - 1)
            x = jnp.pad(x, widths)
        return layout.to_packed(x, nb)

    def tspec(*dims):
        block = (Tc,) + dims + (P, nb)
        n0 = len(dims)
        return pl.BlockSpec(block, lambda b, j: (j,) + (0,) * n0 + (b, 0),
                            memory_space=pltpu.VMEM)

    def cspec(*dims):
        block = dims + (P, nb)
        n0 = len(dims)
        return pl.BlockSpec(block, lambda b, j: (0,) * n0 + (b, 0),
                            memory_space=pltpu.VMEM)

    args = [prep_t(xs_l[:T]), prep_t(us_l), prep_t(k_l), prep_t(K_l),
            layout.to_packed(x0_l, nb)]
    args += [layout.to_packed(a, nb)[0] for a in alphas_l]
    in_specs = [tspec(NDX), tspec(nu), tspec(nu), tspec(nu, NDX), cspec(NDX)]
    in_specs += [cspec()] * n_trials
    if use_gaps:
        args += [prep_t(fs_l[:T]),    # fs[t]   for the x0 contraction
                 prep_t(fs_l[1:]),    # fs[t+1] for the step contraction
                 layout.to_packed(infeas_l, nb)[0]]
        in_specs += [tspec(NDX), tspec(NDX), cspec()]
    args += [layout.to_packed(wterm_l, nb)[0]]
    in_specs += [cspec()]

    def pad_table(tab):        # [T, m] -> [Tp, m] (end padding, like prep_t)
        tab = jnp.asarray(tab, dtype)
        return jnp.pad(tab, ((0, padt), (0, 0))) if padt else tab

    def smem_tspec(m):
        # whole [Tp, m] table resident in SMEM (Mosaic requires
        # non-tile-aligned blocks to equal the array; Tp*m scalars ~ KBs);
        # kernels index rows by global knot j*Tc+t
        return pl.BlockSpec((Tp, m), lambda b, j: (0, 0),
                            memory_space=pltpu.SMEM)

    if spec.per_knot_target:
        # per-knot tracking target: batch-invariant [Tc, 12] SMEM rows
        # (flat R_inv | pos), a build-time constant of the spec
        args += [pad_table(spec.target_table(T, dtype))]
        in_specs += [smem_tspec(12)]
    if spec.per_knot_box:
        assert lb_l is None, "per-knot box is a build-time constant"
        args += [pad_table(spec.lb), pad_table(spec.ub)]
        in_specs += [smem_tspec(nu), smem_tspec(nu)]
    elif spec.lb is not None:
        # box as a runtime lane input (bound-continuation schedules
        # share one compiled kernel); defaults to the spec's box
        if lb_l is None:
            lb_l = jnp.broadcast_to(jnp.asarray(spec.lb, dtype)[:, None], (nu, Bp))
            ub_l = jnp.broadcast_to(jnp.asarray(spec.ub, dtype)[:, None], (nu, Bp))
        args += [layout.to_packed(lb_l, nb), layout.to_packed(ub_l, nb)]
        in_specs += [cspec(nu), cspec(nu)]

    per_trial_out = [
        jax.ShapeDtypeStruct((Tp, NDX, rows, nb), dtype),
        jax.ShapeDtypeStruct((Tp, nu, rows, nb), dtype),
        jax.ShapeDtypeStruct((rows, nb), dtype),
    ]
    per_trial_spec = [tspec(NDX), tspec(nu), cspec()]
    out_shape = per_trial_out * n_trials + [
        jax.ShapeDtypeStruct((n_trials, NDX, rows, nb), dtype)]
    out_specs = per_trial_spec * n_trials + [cspec(n_trials, NDX)]

    if n_trials == 1:
        kern = functools.partial(_rollout_kernel, spec, T, Tc, NC, use_gaps)
        scratch = [pltpu.VMEM((NDX, P, nb), dtype), pltpu.VMEM((P, nb), dtype)]
        # single-trial kernel takes x0t_out before cost (grouped with outs)
        out_shape = [per_trial_out[0], per_trial_out[1],
                     jax.ShapeDtypeStruct((NDX, rows, nb), dtype),
                     per_trial_out[2]]
        out_specs = [per_trial_spec[0], per_trial_spec[1], cspec(NDX),
                     per_trial_spec[2]]
    else:
        kern = functools.partial(_rolloutn_kernel, spec, T, Tc, NC, use_gaps,
                                 n_trials)
        scratch = ([pltpu.VMEM((NDX, P, nb), dtype)] * n_trials
                   + [pltpu.VMEM((n_trials, P, nb), dtype)])

    outs = pl.pallas_call(
        kern,
        grid=(G, NC),
        compiler_params=_big_state_params(NDX),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_structs(out_shape, xs_l),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)

    results = []
    if n_trials == 1:
        xs_b, us_b, x0t_p, cost_p = outs
        x0t = layout.from_packed(x0t_p)
        results.append((
            jnp.concatenate([x0t[None], layout.from_packed(xs_b)[:T]], axis=0),
            layout.from_packed(us_b)[:T],
            layout.from_packed(cost_p),
        ))
    else:
        x0ts = layout.from_packed(outs[-1])
        for i in range(n_trials):
            xs_o, us_o, c_o = outs[3 * i:3 * i + 3]
            results.append((
                jnp.concatenate([x0ts[i][None], layout.from_packed(xs_o)[:T]],
                                axis=0),
                layout.from_packed(us_o)[:T],
                layout.from_packed(c_o),
            ))
    return results


def build_rolloutn(spec: VSASpec, T: int, nb: int = 128,
                   interpret: bool = False, use_gaps: bool = False,
                   n_trials: int = 2, tiles: int = 1):
    """Lane-IO ``n_trials``-trial rollout: same layout contract as the
    lane-io :func:`build_rollout` with ``n_trials`` alpha inputs; returns
    ``n_trials`` (xs, us, cost) triples (flattened tuple)."""

    def rolloutn_lanes(xs_l, us_l, k_l, K_l, x0_l, *rest):
        alpha_ls, rest = rest[:n_trials], rest[n_trials:]
        fs_l, infeas_l, wterm_l = rest[:3]
        lb_l, ub_l = (rest[3], rest[4]) if len(rest) > 3 else (None, None)
        trials = _rollout_call(
            spec, T, nb, interpret, use_gaps, n_trials,
            xs_l, us_l, k_l, K_l, x0_l, alpha_ls,
            fs_l, infeas_l, wterm_l, lb_l, ub_l, tiles=tiles)
        return tuple(x for tr in trials for x in tr)

    return rolloutn_lanes


def build_rollout(spec: VSASpec, T: int, nb: int = 128, interpret: bool = False,
                  use_gaps: bool = False, lane_io: bool = False,
                  tiles: int = 1):
    """Returns rollout(xs, us, k, K, x0, alpha, fs, infeasible) ->
    (xs_try, us_try, cost), batch-major in/out, dispatched to the lane
    kernel. ``fs``/``infeasible`` drive the FDDP gap contraction (pass
    zeros for the DDP variants). With ``lane_io=True`` the returned
    callable instead takes/returns lane-layout tensors directly
    (xs_l [T+1,8,Bp], us_l/k_l [T,nu,Bp], K_l [T,nu,8,Bp], x0_l [8,Bp],
    alpha_l/infeas_l/wterm_l [1,Bp], fs_l [T+1,8,Bp]) and returns
    (xs_l [T+1,8,Bp], us_l [T,nu,Bp], cost [Bp]) — no relayouts."""
    nu = spec.nu

    def rollout_lanes(xs_l, us_l, k_l, K_l, x0_l, alpha_l, fs_l, infeas_l,
                      wterm_l, lb_l=None, ub_l=None):
        [(xs_o, us_o, cost_o)] = _rollout_call(
            spec, T, nb, interpret, use_gaps, 1,
            xs_l, us_l, k_l, K_l, x0_l, (alpha_l,),
            fs_l, infeas_l, wterm_l, lb_l, ub_l, tiles=tiles)
        return xs_o, us_o, cost_o

    if lane_io:
        return rollout_lanes

    def rollout_batched(xs, us, k, K, x0, alpha, fs, infeas, wterm=None):
        B = xs.shape[0]
        dtype = xs.dtype
        Bp = layout.padded_batch(B, nb)
        if wterm is None:
            wterm = jnp.full((B,), spec.w_goal_term, dtype)
        else:
            wterm = jnp.broadcast_to(jnp.asarray(wterm, dtype), (B,))

        def to_lanes(x):
            pad = Bp - B
            if pad:
                x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], dtype)], axis=0)
            return jnp.transpose(x, tuple(range(1, x.ndim)) + (0,))

        xs_l, us_l, k_l, K_l, x0_l, fs_l = map(to_lanes, (xs, us, k, K, x0, fs))
        alpha_l = jnp.concatenate([alpha, jnp.zeros(Bp - B, dtype)])[None, :]
        infeas_l = jnp.concatenate([infeas.astype(dtype), jnp.zeros(Bp - B, dtype)])[None, :]
        wterm_l = jnp.concatenate([wterm, jnp.zeros(Bp - B, dtype)])[None, :]

        xs_o, us_o, cost_l = rollout_lanes(
            xs_l, us_l, k_l, K_l, x0_l, alpha_l, fs_l, infeas_l, wterm_l)

        xs_try = jnp.transpose(xs_o, (2, 0, 1))[:B]
        us_try = jnp.transpose(us_o, (2, 0, 1))[:B]
        return xs_try, us_try, cost_l[:B]

    return rollout_batched


# ---------------------------------------------------------------------------
# linearize kernel
# ---------------------------------------------------------------------------

def _linearize_kernel(spec: VSASpec, terminal: bool,
                      x_ref, u_ref, wterm_ref, tgt_ref,
                      Fx_ref, Fu_ref, Lx_ref, Lu_ref, Lxx_ref, Lxu_ref, Luu_ref,
                      xnext_ref, cost_ref, ok_ref):
    """One knot (grid dims: t, batch-tile): analytic VSA linearization.

    Derivative strategy: the acceleration jacobians come from ``jax.jvp``
    seeds through the lane dynamics (exact forward-mode, traced in-kernel);
    cost derivatives are assembled Gauss-Newton style like the XLA models.

    ``ok_ref`` gets the per-lane finiteness AND over the 7 derivative
    tensors (1.0/0.0) — computed here while the values are still in
    registers, so the solver loop's linearization health check does not
    re-read ~360 MB/iteration of derivative tensors from HBM (the
    constant tensors fold to compile-time True; semantics are exactly the
    lane solver's old leaf-by-leaf ``isfinite`` reduction).
    """
    NDX = spec.ndx
    NL = spec.nl
    dtype = x_ref.dtype
    x = [x_ref[i] for i in range(NDX)]
    u = [u_ref[i] for i in range(spec.nu)]
    like = x[0]
    dt = spec.dt

    # -- dynamics + ANALYTIC jacobians ------------------------------------
    # Mirrors DifferentialVSADynamics.calc_diff: RNEA partials from 2*nl
    # jvp seeds through rnea only, Minv/Binv blocks assembled explicitly —
    # ~8x fewer ops than differentiating the full dynamics per seed.
    # The nl==2 branch keeps the original adjugate 2x2 Minv verbatim
    # (bit-parity with the flagship kernels is test-pinned); nl>2 uses the
    # unrolled lane Cholesky (ops/lanes.choln) factored once and applied
    # per column.
    q_l_ = list(x[:NL])
    q_m_ = list(x[NL:2 * NL])
    v_l_ = list(x[2 * NL:3 * NL])
    is_vsa = spec.variant == "vsa"
    if is_vsa:
        kd_ = list(u[NL:2 * NL])
        tau_c_ = [kd_[i] * (q_l_[i] - q_m_[i]) for i in range(NL)]
    else:
        Kc = spec.K
        d_ = [q_l_[i] - q_m_[i] for i in range(NL)]
        tau_c_ = [_dot_terms([float(Kc[i][j]) * d_[j] for j in range(NL)])
                  for i in range(NL)]

    M, nle = lanes.mass_nle_lanes(spec.rc, q_l_, v_l_)
    a_l = list(lanes.solven(M, [-nle[i] - tau_c_[i] for i in range(NL)]))
    binv = tuple(tuple(float(b) for b in row) for row in spec.binv)
    a_m = [_dot_terms([binv[i][j] * (u[j] + tau_c_[j]) for j in range(NL)])
           for i in range(NL)]
    a = a_l + a_m

    cols = None
    if not terminal:
        one = jnp.ones_like(like)
        zero = jnp.zeros_like(like)

        if NL == 2:
            # Minv explicit (2x2) — original flagship path, bit-pinned
            det = M[0][0] * M[1][1] - M[0][1] * M[1][0]
            idet = 1.0 / det
            Minv = [[M[1][1] * idet, -M[0][1] * idet],
                    [-M[1][0] * idet, M[0][0] * idet]]

            def msolve(col):
                return [Minv[0][0] * col[0] + Minv[0][1] * col[1],
                        Minv[1][0] * col[0] + Minv[1][1] * col[1]]

            def msolve_basis(j, s):
                # Minv @ (e_j * s) without the zero-column multiplies
                return [Minv[0][j] * s, Minv[1][j] * s]
        else:
            Lfac = lanes.choln(M)

            def msolve(col):
                return lanes.choln_solve(Lfac, list(col))

            def msolve_basis(j, s):
                return msolve([s if i == j else zero for i in range(NL)])

        # RNEA partials at (q_l, v_l, a_l): dtau_dq / dtau_dv (nl seeds each)
        def rnea_q(qq):
            return tuple(lanes.rnea_lanes(spec.rc, list(qq), v_l_, a_l))

        def rnea_v(vv):
            return tuple(lanes.rnea_lanes(spec.rc, q_l_, list(vv), a_l))

        dtau_dq = []
        dtau_dv = []
        for j in range(NL):
            seed = tuple(one if i == j else zero for i in range(NL))
            _, cq = jax.jvp(rnea_q, (tuple(q_l_),), (seed,))
            _, cv = jax.jvp(rnea_v, (tuple(v_l_),), (seed,))
            dtau_dq.append(cq)   # column j: d tau / d q_j (tuple of nl)
            dtau_dv.append(cv)

        # spring jacobian wrt q_l (dK_col[j][i] = d tau_c_i / d q_l_j)
        if is_vsa:
            dK_col = [[(kd_[j] if i == j else zero) for i in range(NL)] for j in range(NL)]
        else:
            dK_col = [[float(spec.K[i][j]) * one for i in range(NL)] for j in range(NL)]

        def binv_apply(col):
            return [_dot_terms([binv[i][j2] * col[j2] for j2 in range(NL)])
                    for i in range(NL)]

        # acceleration jacobian columns, input order
        # VSA: [q_l(nl), q_m(nl), v_l(nl), v_m(nl), tau(nl), k(nl)]
        # SEA: [q_l(nl), q_m(nl), v_l(nl), v_m(nl), u(nl)]
        cols = []
        for j in range(NL):      # d a / d q_l_j: Minv(-dtau_dq_col - K e_j); Binv K e_j
            link = msolve([-(dtau_dq[j][i]) - dK_col[j][i] for i in range(NL)])
            mot = binv_apply(dK_col[j])
            cols.append(tuple(link + mot))
        for j in range(NL):      # d a / d q_m_j (spring sign flips)
            link = msolve(list(dK_col[j]))
            mot = [-m for m in binv_apply(dK_col[j])]
            cols.append(tuple(link + mot))
        for j in range(NL):      # d a / d v_l_j
            link = msolve([-dtau_dv[j][i] for i in range(NL)])
            cols.append(tuple(link + [zero] * NL))
        for j in range(NL):      # d a / d v_m_j
            cols.append((zero,) * (2 * NL))
        for j in range(NL):      # d a / d tau_j
            cols.append(tuple([zero] * NL + [binv[i][j] * one for i in range(NL)]))
        if is_vsa:
            for j in range(NL):  # d a / d k_j
                d = q_l_[j] - q_m_[j]
                link = msolve_basis(j, -d)
                mot = [binv[i][j] * d for i in range(NL)]
                cols.append(tuple(link + mot))

    # -- costs ------------------------------------------------------------
    q_l = list(x[:NL])
    # grid dim 0 is the knot; the SMEM table holds all T rows
    tgt = None if tgt_ref is None else _tgt_at(tgt_ref, pl.program_id(0))
    c_goal, r6 = _goal_cost_lanes(spec, q_l, tgt, terminal=terminal)
    # the terminal goal weight is a runtime lane input (homotopy ramps it);
    # the running weight stays a baked constant
    w_goal = wterm_ref[:] if terminal else spec.w_goal

    cost = w_goal * c_goal
    if not terminal:
        for i in range(NDX):
            if spec.xw[i] != 0.0:
                cost = cost + 0.5 * float(spec.xw[i]) * x[i] * x[i]
        for i in range(spec.nu):
            if spec.uw[i] != 0.0:
                cost = cost + 0.5 * float(spec.uw[i]) * u[i] * u[i]
        if spec.stiff_w != 0.0:
            for i in range(NL):
                cost = cost + float(spec.stiff_w) * (u[NL + i] - float(spec.stiff_ref[i]))
    cost_ref[:] = cost

    # goal residual jacobian wrt q_l via jvp of the residual map (nl seeds)
    def res_fn(qq):
        _, r = _goal_cost_lanes(spec, list(qq), tgt, terminal=terminal)
        return r

    one = jnp.ones_like(like)
    zero = jnp.zeros_like(like)
    J = []
    for j in range(NL):
        seed = tuple(one if i == j else zero for i in range(NL))
        _, Jqj = jax.jvp(res_fn, (tuple(q_l),), (seed,))
        J.append(Jqj)
    J = tuple(J)                      # J[c][k]: d r_k / d q_c

    # Lx rows: goal contributes only to q_l entries (reference semantics)
    Lx_rows = []
    for i in range(NDX):
        v = jnp.zeros_like(like)
        if i < NL:
            for kk in range(6):
                v = v + w_goal * J[i][kk] * r6[kk]
        if (not terminal) and spec.xw[i] != 0.0:
            v = v + float(spec.xw[i]) * x[i]
        Lx_rows.append(v)
    Lx_v = jnp.stack(Lx_rows)
    Lx_ref[:] = Lx_v

    Lu_rows = []
    for j in range(spec.nu):
        v = jnp.zeros_like(like)
        if not terminal:
            if spec.uw[j] != 0.0:
                v = v + float(spec.uw[j]) * u[j]
            if spec.stiff_w != 0.0 and j >= NL:
                v = v + float(spec.stiff_w)
        Lu_rows.append(v)
    Lu_v = jnp.stack(Lu_rows)
    Lu_ref[:] = Lu_v

    # Lxx: Gauss-Newton goal block on (q_l x q_l) + diagonal state reg
    Lxx_rows = []
    for i in range(NDX):
        row = []
        for j2 in range(NDX):
            v = jnp.zeros_like(like)
            if i < NL and j2 < NL:
                for kk in range(6):
                    v = v + w_goal * J[i][kk] * J[j2][kk]
            if i == j2 and (not terminal) and spec.xw[i] != 0.0:
                v = v + float(spec.xw[i])
            row.append(v)
        Lxx_rows.append(jnp.stack(row))
    Lxx_v = jnp.stack(Lxx_rows)
    Lxx_ref[:] = Lxx_v

    Lxu_v = jnp.zeros((NDX, spec.nu) + like.shape, dtype=dtype)
    Lxu_ref[:] = Lxu_v
    Luu_rows = []
    for i in range(spec.nu):
        row = []
        for j2 in range(spec.nu):
            v = jnp.zeros_like(like)
            if i == j2 and (not terminal) and spec.uw[i] != 0.0:
                v = v + float(spec.uw[i])
            row.append(v)
        Luu_rows.append(jnp.stack(row))
    Luu_v = jnp.stack(Luu_rows)
    Luu_ref[:] = Luu_v

    # per-lane finiteness of the derivative tensors, in registers (the
    # all-constant tensors fold to compile-time True)
    def _fin(v):
        return jnp.all(jnp.isfinite(v), axis=tuple(range(v.ndim - like.ndim)))

    ok = _fin(Lx_v) & _fin(Lu_v) & _fin(Lxx_v) & _fin(Lxu_v) & _fin(Luu_v)

    # -- integrator chain rule (IntegratedActionEuler.calc_with_diff) -----
    if terminal:
        # terminal Fx/Fu are finite constants (identity / zeros)
        ok_ref[:] = ok.astype(dtype)
        Fx_ref[:] = layout.eye_lanes(NDX, like).astype(dtype)
        Fu_ref[:] = jnp.zeros((NDX, spec.nu) + like.shape, dtype=dtype)
        xnext_ref[:] = jnp.stack(x)
        return

    nv = NDX // 2
    # da/dx rows (4 x 8), da/du (4 x 4) from cols (inp-major)
    Fx_rows = []
    for i in range(NDX):
        row = []
        for j2 in range(NDX):
            # d xnext_i / d x_j
            if i < nv:
                # position rows: delta + dt * (v_shift) + dt^2 * da
                v = cols[j2][i] * (dt * dt)
                if i == j2:
                    v = v + 1.0
                if j2 == i + nv:
                    v = v + dt
            else:
                v = cols[j2][i - nv] * dt
                if i == j2:
                    v = v + 1.0
            row.append(jnp.broadcast_to(v, like.shape))
        Fx_rows.append(jnp.stack(row))
    Fx_v = jnp.stack(Fx_rows)
    Fx_ref[:] = Fx_v

    Fu_rows = []
    for i in range(NDX):
        row = []
        for j2 in range(spec.nu):
            col = cols[NDX + j2]
            if i < nv:
                v = col[i] * (dt * dt)
            else:
                v = col[i - nv] * dt
            row.append(jnp.broadcast_to(v, like.shape))
        Fu_rows.append(jnp.stack(row))
    Fu_v = jnp.stack(Fu_rows)
    Fu_ref[:] = Fu_v
    ok_ref[:] = (ok & _fin(Fx_v) & _fin(Fu_v)).astype(dtype)

    xnext = []
    for i in range(nv):
        xnext.append(x[i] + x[nv + i] * dt + a[i] * dt * dt)
    for i in range(nv):
        xnext.append(x[nv + i] + a[i] * dt)
    xnext_ref[:] = jnp.stack(xnext)


def build_linearize(spec: VSASpec, T: int, nb: int = 128, interpret: bool = False,
                    lane_io: bool = False):
    """Returns linearize(xs, us) -> (cost, run_diff tuple, term tuple, xnext).

    With ``lane_io=True`` the returned callable takes lane-layout inputs
    (xs_l [T+1,8,Bp], us_l [T,nu,Bp], wterm_l [1,Bp]) and returns
    (cost [Bp], run dict of lane tensors [T,...,Bp], term dict of lane
    tensors [...,Bp], xnext_l [T,8,Bp], ok_l [Bp] bool) — no relayouts,
    ready to feed :func:`..riccati.riccati_box_backward_lanes` directly;
    ``ok_l`` is the in-kernel finiteness AND over all run+term derivative
    tensors (the lane solver's linearization health check)."""
    NU = spec.nu
    NDX = spec.ndx

    def linearize_lanes(xs_l, us_l, wterm_l):
        dtype = xs_l.dtype
        Bp = xs_l.shape[-1]
        rows, P, G = layout.pack_dims(Bp, nb)

        def io_spec(*dims):
            block = (1,) + dims + (P, nb)
            n0 = len(dims)
            return pl.BlockSpec(block, lambda t, b: (t,) + (0,) * n0 + (b, 0),
                                memory_space=pltpu.VMEM)

        # batch-only input (terminal weight): same block for every knot
        wterm_spec = pl.BlockSpec((1, P, nb), lambda t, b: (0, b, 0),
                                  memory_space=pltpu.VMEM)
        # per-knot tracking target: the whole [T, 12] table stays resident
        # in SMEM (Mosaic requires non-tile-aligned blocks to equal the
        # array; T*12 scalars is a few KB) and the kernel reads its grid
        # row
        tgt_spec = pl.BlockSpec((T, 12), lambda t, b: (0, 0),
                                memory_space=pltpu.SMEM)

        def run_kernel(spec_, terminal, with_tgt):
            def kern(x_ref, u_ref, wterm_ref, *rest):
                tgt_ref, outs = (rest[0], rest[1:]) if with_tgt else (None, rest)
                (Fx_ref, Fu_ref, Lx_ref, Lu_ref, Lxx_ref, Lxu_ref, Luu_ref,
                 xnext_ref, cost_ref, ok_ref) = outs
                _linearize_kernel(
                    spec_, terminal,
                    x_ref.at[0], u_ref.at[0], wterm_ref.at[0], tgt_ref,
                    Fx_ref.at[0], Fu_ref.at[0], Lx_ref.at[0], Lu_ref.at[0],
                    Lxx_ref.at[0], Lxu_ref.at[0], Luu_ref.at[0],
                    xnext_ref.at[0], cost_ref.at[0], ok_ref.at[0])
            return kern

        out_specs = [io_spec(NDX, NDX), io_spec(NDX, NU), io_spec(NDX), io_spec(NU),
                     io_spec(NDX, NDX), io_spec(NDX, NU), io_spec(NU, NU),
                     io_spec(NDX), io_spec(), io_spec()]

        def shapes(nt):
            return out_structs([
                jax.ShapeDtypeStruct((nt, NDX, NDX, rows, nb), dtype),
                jax.ShapeDtypeStruct((nt, NDX, NU, rows, nb), dtype),
                jax.ShapeDtypeStruct((nt, NDX, rows, nb), dtype),
                jax.ShapeDtypeStruct((nt, NU, rows, nb), dtype),
                jax.ShapeDtypeStruct((nt, NDX, NDX, rows, nb), dtype),
                jax.ShapeDtypeStruct((nt, NDX, NU, rows, nb), dtype),
                jax.ShapeDtypeStruct((nt, NU, NU, rows, nb), dtype),
                jax.ShapeDtypeStruct((nt, NDX, rows, nb), dtype),
                jax.ShapeDtypeStruct((nt, rows, nb), dtype),
                jax.ShapeDtypeStruct((nt, rows, nb), dtype),
            ], xs_l)

        xs_p = layout.to_packed(xs_l, nb)
        us_p = layout.to_packed(us_l, nb)
        wterm_p = layout.to_packed(wterm_l, nb)

        run_args = [xs_p[:T], us_p, wterm_p]
        run_in_specs = [io_spec(NDX), io_spec(NU), wterm_spec]
        if spec.per_knot_target:
            run_args.append(jnp.asarray(spec.target_table(T, dtype)))
            run_in_specs.append(tgt_spec)

        outs = pl.pallas_call(
            run_kernel(spec, False, spec.per_knot_target),
            grid=(T, G),
            compiler_params=_big_state_params(NDX),
            in_specs=run_in_specs,
            out_specs=out_specs,
            out_shape=shapes(T),
            interpret=interpret,
        )(*run_args)
        Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, xnext, costs, ok = (
            layout.from_packed(o) for o in outs)

        # terminal knot: single-knot grid (baked terminal target)
        term_outs = pl.pallas_call(
            run_kernel(spec, True, False),
            grid=(1, G),
            compiler_params=_big_state_params(NDX),
            in_specs=[io_spec(NDX), io_spec(NU), wterm_spec],
            out_specs=out_specs,
            out_shape=shapes(1),
            interpret=interpret,
        )(xs_p[T:T + 1], us_p[:1] * 0.0, wterm_p)
        tFx, tFu, tLx, tLu, tLxx, tLxu, tLuu, _, tcost, tok = (
            layout.from_packed(o) for o in term_outs)

        run = dict(Fx=Fx, Fu=Fu, Lx=Lx, Lu=Lu, Lxx=Lxx, Lxu=Lxu, Luu=Luu)
        term = dict(Fx=tFx[0], Fu=tFu[0], Lx=tLx[0], Lu=tLu[0],
                    Lxx=tLxx[0], Lxu=tLxu[0], Luu=tLuu[0])
        cost = jnp.sum(costs, axis=0) + tcost[0]
        # per-lane derivative finiteness, reduced in-kernel (same semantics
        # as an isfinite AND over every run/term tensor above)
        ok_l = (jnp.min(ok, axis=0) * tok[0]) > 0.5
        return cost, run, term, xnext, ok_l

    if lane_io:
        return linearize_lanes

    def linearize_batched(xs, us, wterm=None):
        # xs [B, T+1, 8], us [B, T, 4]
        B = xs.shape[0]
        dtype = xs.dtype
        Bp = layout.padded_batch(B, nb)
        if wterm is None:
            wterm = jnp.full((B,), spec.w_goal_term, dtype)
        else:
            wterm = jnp.broadcast_to(jnp.asarray(wterm, dtype), (B,))
        wterm_l = jnp.concatenate([wterm, jnp.zeros(Bp - B, dtype)])[None, :]

        def to_lanes(x):
            pad = Bp - B
            if pad:
                x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], dtype)], axis=0)
            return jnp.transpose(x, tuple(range(1, x.ndim)) + (0,))

        cost_l, run_l, term_l, xnext_l, _ = linearize_lanes(
            to_lanes(xs), to_lanes(us), wterm_l)

        def back(x):
            # [dims..., Bp] -> [B, dims...]
            perm = (x.ndim - 1,) + tuple(range(x.ndim - 1))
            return jnp.transpose(x, perm)[:B]

        run = {k: back(v) for k, v in run_l.items()}
        term = {k: back(v) for k, v in term_l.items()}
        return cost_l[:B], run, term, back(xnext_l)

    return linearize_batched


# ---------------------------------------------------------------------------
# fast-path assembly (custom_vmap dispatch from the per-scenario solver)
# ---------------------------------------------------------------------------

class FastPath(NamedTuple):
    linearize: object   # per-scenario (xs, us, wterm) -> (cost, run ActionDerivs, term ActionDerivs, xnext)
    rollout: object     # per-scenario (xs, us, k, K, x0, alpha, fs, infeas, wterm) -> (xs_try, us_try, cost)
    wterm_of: object    # problem -> runtime terminal goal weight (pytree leaf)


def supports_fast_path(problem, bounds=None):
    """``(ok, reason)``: whether the fused kernels cover this problem.

    The reason string names the first unsupported feature; callers that
    fall back to the generic XLA path must surface it rather than fail
    silently (a masked TypeError inside kernel construction once hid a
    real bug behind a silent slow-path fallback).
    """
    try:
        extract_vsa_spec(problem, bounds)
        return True, ""
    except TypeError as e:
        return False, str(e)


def build_fast_path(problem, bounds, nb: int = 128, interpret=None,
                    use_gaps: bool = False) -> FastPath:
    """Build the fused fast path for a CONCRETE problem (call outside
    jit — robot/cost constants are baked into the kernels). Covers the
    BoxDDP/DDP variants (``use_gaps=False``) and the FDDP family
    (``use_gaps=True``, gap-contracting rollouts) for the 2-DoF VSA and
    SEA workloads."""
    import dataclasses as _dc

    from ..models.integrator import ActionDerivs
    from ..solvers import ddp as _ddp

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    spec = extract_vsa_spec(problem, bounds)
    T = problem.T
    lin_b = build_linearize(spec, T, nb, interpret)
    roll_b = build_rollout(spec, T, nb, interpret, use_gaps=use_gaps)

    # runtime terminal weight: the kernels take it as a lane input; the
    # unbatched XLA fallback rescales the problem's terminal cost weights
    # (pytree leaves) by wterm / baked total.
    base_wterm = float(spec.w_goal_term)

    def _scaled_problem(wterm):
        from ..solvers.homotopy import scale_terminal_costs

        return scale_terminal_costs(problem, wterm / base_wterm)

    def wterm_of(prob):
        w = None
        for it in prob.terminal.differential.costs.items:
            w = it.weight if w is None else w + it.weight
        return w

    @jax.custom_batching.custom_vmap
    def lin_cv(xs, us, wterm):
        cost, run_diff, term_diff, xnext = _ddp._linearize_core(_scaled_problem(wterm), xs, us)
        return cost, run_diff, term_diff, xnext

    def _bc(x, b, axis_size):
        return x if b else jnp.broadcast_to(x, (axis_size,) + jnp.shape(x))

    @lin_cv.def_vmap
    def _lin_rule(axis_size, in_batched, xs, us, wterm):
        xs = _bc(xs, in_batched[0], axis_size)
        us = _bc(us, in_batched[1], axis_size)
        wterm = _bc(wterm, in_batched[2], axis_size)
        cost, run, term, xnext = lin_b(xs, us, wterm)
        run_d = ActionDerivs(**run)
        term_d = ActionDerivs(
            Fx=term["Fx"], Fu=term["Fu"], Lx=term["Lx"], Lu=term["Lu"],
            Lxx=term["Lxx"], Lxu=term["Lxu"], Luu=term["Luu"])
        out = (cost, run_d, term_d, xnext)
        return out, jax.tree.map(lambda _: True, out)

    @jax.custom_batching.custom_vmap
    def roll_cv(xs, us, k, K, x0, alpha, fs, infeas, wterm):
        p = _dc.replace(_scaled_problem(wterm), x0=x0)
        return _ddp._rollout(p, xs, us, k, K, fs, alpha, infeas, use_gaps, bounds)

    @roll_cv.def_vmap
    def _roll_rule(axis_size, in_batched, *args):
        args = tuple(_bc(a, b, axis_size) for a, b in zip(args, in_batched))
        out = roll_b(*args)
        return out, jax.tree.map(lambda _: True, out)

    return FastPath(linearize=lin_cv, rollout=roll_cv, wterm_of=wterm_of)
