"""Lane-layout end-to-end solver vs the vmapped reference (interpret mode).

The lane solver hand-batches the whole Box-DDP loop in lane layout
(pallas/lane_solver.py); it must replicate ``vmap(solve)`` element for
element — same accepted steps, same iteration counts, same solutions.
"""
import jax
import jax.numpy as jnp
import numpy as np

from aslr_to_tpu.parallel.batch import make_batched_solver
from aslr_to_tpu.solvers.ddp import SolverSettings
from aslr_to_tpu.workloads.presets import (
    two_dof_sea,
    two_dof_vsa_boxddp,
    two_dof_vsa_modified,
)


def _solve_both(w, x0s, maxiter, th_stop=1e-7):
    ref = make_batched_solver(
        w.problem, SolverSettings(maxiter=maxiter, th_stop=th_stop),
        use_gaps=False, bounds=w.bounds)(x0s)
    lane = make_batched_solver(
        w.problem, SolverSettings(maxiter=maxiter, th_stop=th_stop),
        use_gaps=False, bounds=w.bounds, use_fast_path="lanes")(x0s)
    return ref, lane


def _check(ref, lane, atol=1e-8):
    assert np.allclose(ref.cost, lane.cost, rtol=1e-8)
    assert np.allclose(ref.us, lane.us, atol=atol)
    assert np.allclose(ref.xs, lane.xs, atol=atol)
    assert np.all(np.asarray(ref.iterations) == np.asarray(lane.iterations))
    assert np.all(np.asarray(ref.converged) == np.asarray(lane.converged))
    assert np.all(np.asarray(ref.diverged) == np.asarray(lane.diverged))
    assert np.allclose(ref.stop, lane.stop, rtol=1e-6)
    assert np.allclose(ref.reg, lane.reg, rtol=1e-8)


def test_lane_solver_matches_reference():
    w = two_dof_vsa_boxddp(T=12)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    ref, lane = _solve_both(w, x0s, maxiter=6)
    _check(ref, lane)


def test_lane_solver_per_scenario_termination():
    """Longer budget: scenarios converge at different iterations; the
    per-lane masking must freeze each exactly where vmap(solve) does."""
    w = two_dof_vsa_boxddp(T=10)
    x0s = jnp.concatenate([
        0.02 * jax.random.normal(jax.random.PRNGKey(2), (3, 8)),
        0.3 * jax.random.normal(jax.random.PRNGKey(3), (2, 8)),
    ])
    # th_stop sits between scenario 0's stop trough (22.3 at iteration 3)
    # and every other scenario's minimum (>170): one lane freezes early,
    # the rest run to maxiter.
    ref, lane = _solve_both(w, x0s, maxiter=18, th_stop=23.5)
    assert len(set(np.asarray(lane.iterations).tolist())) > 1  # genuinely staggered
    assert bool(np.any(np.asarray(lane.converged)))
    _check(ref, lane)


def test_lane_solver_fddp_sea_matches_reference():
    """FDDP family (gaps, unbounded) on the SEA reach workload: gap-aware
    backward, dv-corrected expected improvement, gap-contracting rollouts."""
    w = two_dof_sea(T=12)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(6), (4, 8))
    st = SolverSettings(maxiter=6, th_stop=1e-7)
    ref = make_batched_solver(w.problem, st, use_gaps=True, bounds=None)(x0s)
    lane = make_batched_solver(w.problem, st, use_gaps=True, bounds=None,
                               use_fast_path="lanes")(x0s)
    _check(ref, lane)


def test_lane_solver_fddp_backtracking_matches_reference():
    """Hard FDDP instances (large x0s) that force line-search backtracking
    and the dVexp<0 accept branch — exercises the dv-corrected expected
    improvement (sign of dx in the dv term) which mild alpha=1-every-step
    instances never reach."""
    w = two_dof_sea(T=12)
    x0s = 0.6 * jax.random.normal(jax.random.PRNGKey(42), (8, 8))
    st = SolverSettings(maxiter=12, th_stop=1e-7)
    ref = make_batched_solver(w.problem, st, use_gaps=True, bounds=None)(x0s)
    lane = make_batched_solver(w.problem, st, use_gaps=True, bounds=None,
                               use_fast_path="lanes")(x0s)
    _check(ref, lane)


def test_lane_solver_fddp_warm_start_quasi_static():
    """warm_start=True computes the quasi-static us batch-major and hands
    it to the lane loop — mirrors the reference's problem.quasiStatic
    warm start (``two_dof_sea.py:78``)."""
    w = two_dof_sea(T=10)
    x0s = 0.03 * jax.random.normal(jax.random.PRNGKey(7), (3, 8))
    st = SolverSettings(maxiter=5, th_stop=1e-7)
    ref = make_batched_solver(w.problem, st, use_gaps=True, bounds=None,
                              warm_start=True)(x0s)
    lane = make_batched_solver(w.problem, st, use_gaps=True, bounds=None,
                               warm_start=True, use_fast_path="lanes")(x0s)
    _check(ref, lane)


def _tight_bounds():
    # the preset's wide box (stiffness <=100 on 1e-3 motor inertia) makes
    # the first infeasibility-resolving rollout chaotic; BoxFDDP parity is
    # asserted in the stable regime (same trick as the modified-preset test)
    from aslr_to_tpu.solvers.ddp import Bounds
    return Bounds(lb=jnp.array([-2.0, -2.0, 0.0, 0.0]),
                  ub=jnp.array([2.0, 2.0, 3.0, 3.0]))


def test_lane_solver_boxfddp_matches_reference():
    """BoxFDDP (gaps + bounds): deflected recursion + masked BoxQP gains +
    clamped gap-contracting rollouts, bit-checked vs vmap(solve)."""
    w = two_dof_vsa_boxddp(T=10)
    bounds = _tight_bounds()
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(9), (4, 8))
    st = SolverSettings(maxiter=5, th_stop=1e-7)
    ref = make_batched_solver(w.problem, st, use_gaps=True, bounds=bounds)(x0s)
    lane = make_batched_solver(w.problem, st, use_gaps=True, bounds=bounds,
                               use_fast_path="lanes")(x0s)
    # atol 1e-6: the masked-BoxQP solve under the FDDP gap deflection is
    # ill-conditioned at reg=1e-9 — summation-order noise reaches ~1e-7 on
    # near-zero tail controls over 5 iterations (branches/iterations still
    # match exactly; costs agree to 1e-10)
    _check(ref, lane, atol=1e-6)


def test_lane_solver_boxfddp_backtracking():
    """Hard BoxFDDP instances forcing backtracking + the dVexp<0 branch."""
    w = two_dof_vsa_boxddp(T=10)
    bounds = _tight_bounds()
    x0s = 0.5 * jax.random.normal(jax.random.PRNGKey(10), (6, 8))
    st = SolverSettings(maxiter=10, th_stop=1e-7)
    ref = make_batched_solver(w.problem, st, use_gaps=True, bounds=bounds)(x0s)
    lane = make_batched_solver(w.problem, st, use_gaps=True, bounds=bounds,
                               use_fast_path="lanes")(x0s)
    _check(ref, lane, atol=1e-6)


def test_lane_homotopy_ub_stages_matches_reference():
    """Stiffness-bound continuation on the lane path: the per-stage box is
    a runtime lane input to the rollout/backward kernels; must match
    vmap(homotopy_solve(ub_stages=...)) through the generic solver."""
    w = two_dof_vsa_boxddp(T=10)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(12), (3, 8))
    st = SolverSettings(maxiter=3, th_stop=1e-7)
    scales = (1e-2, 1e-1, 1.0, 1.0)
    cap = jnp.asarray([100.0, 100.0, 3.0, 3.0])
    ub_stages = jnp.stack([cap, cap, cap, w.bounds.ub])
    ref = make_batched_solver(w.problem, st, use_gaps=False, bounds=w.bounds,
                              globalization="homotopy", scales=scales,
                              ub_stages=ub_stages)(x0s)
    lane = make_batched_solver(w.problem, st, use_gaps=False, bounds=w.bounds,
                               use_fast_path="lanes", globalization="homotopy",
                               scales=scales, ub_stages=ub_stages)(x0s)
    _check(ref, lane)


def test_lane_homotopy_matches_reference():
    """Terminal-weight continuation on the lane path: all stages share one
    compiled lane program (wterm is a runtime lane input); must match
    vmap(homotopy_solve) through the generic solver."""
    w = two_dof_vsa_boxddp(T=10)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(11), (3, 8))
    st = SolverSettings(maxiter=3, th_stop=1e-7)
    ref = make_batched_solver(w.problem, st, use_gaps=False, bounds=w.bounds,
                              globalization="homotopy")(x0s)
    lane = make_batched_solver(w.problem, st, use_gaps=False, bounds=w.bounds,
                               use_fast_path="lanes", globalization="homotopy")(x0s)
    _check(ref, lane)


def test_lane_solver_ddp_unbounded():
    """DDP (no gaps, no bounds) rides the FDDP kernel with zero gaps."""
    w = two_dof_sea(T=10)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(8), (3, 8))
    st = SolverSettings(maxiter=5, th_stop=1e-7)
    ref = make_batched_solver(w.problem, st, use_gaps=False, bounds=None)(x0s)
    lane = make_batched_solver(w.problem, st, use_gaps=False, bounds=None,
                               use_fast_path="lanes")(x0s)
    _check(ref, lane)


def test_lane_solver_modified_preset_warm_start_args():
    """Stiffness-cost variant + explicit xs/us warm start (batch-major).

    The preset's wide box (torque ±100, stiffness ≤100 on motor inertia
    1e-3) makes the first infeasibility-resolving rollout chaotic — any
    1-ulp kernel-vs-XLA difference amplifies without bound — so this test
    tightens the bounds to keep the trajectories in the stable regime
    where exact per-iteration parity is meaningful.
    """
    import dataclasses

    from aslr_to_tpu.solvers.ddp import Bounds, solve

    w = two_dof_vsa_modified(T=8)
    bounds = Bounds(lb=jnp.array([-2.0, -2.0, 0.002, 0.002]),
                    ub=jnp.array([2.0, 2.0, 3.0, 3.0]))
    B = 3
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(4), (B, 8))
    xs0 = jnp.broadcast_to(x0s[:, None, :], (B, 9, 8))
    us0 = (1e-3 * jax.random.normal(jax.random.PRNGKey(5), (B, 8, 4))
           + jnp.array([0, 0, 0.5, 0.5]))

    def one(x0, xs, us):
        p = dataclasses.replace(w.problem, x0=x0)
        return solve(p, xs, us, settings=SolverSettings(maxiter=5, th_stop=1e-7),
                     use_gaps=False, bounds=bounds)

    ref = jax.jit(jax.vmap(one))(x0s, xs0, us0)
    from aslr_to_tpu.pallas.lane_solver import build_lane_solver

    lane = build_lane_solver(w.problem, SolverSettings(maxiter=5, th_stop=1e-7),
                             bounds)(x0s, xs0, us0)
    _check(ref, lane)


def test_lane_solver_kernel_ok_matches_hbm_reduction():
    """The in-kernel linearization-ok flag (round 4) must be bit-identical
    to the old leaf-by-leaf HBM isfinite reduction it replaced — including
    on a lane whose linearization genuinely goes non-finite (inf x0)."""
    from aslr_to_tpu.pallas.lane_solver import build_lane_solver

    w = two_dof_vsa_boxddp(T=6)
    st = SolverSettings(maxiter=3, th_stop=1e-7)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(21), (4, 8))
    x0s = x0s.at[0, 0].set(jnp.inf)   # lane 0: non-finite linearize
    a = build_lane_solver(w.problem, st, bounds=w.bounds, interpret=True,
                          use_gaps=False, kernel_ok=True)(x0s)
    b = build_lane_solver(w.problem, st, bounds=w.bounds, interpret=True,
                          use_gaps=False, kernel_ok=False)(x0s)
    assert bool(np.asarray(a.diverged)[0]) and bool(np.asarray(b.diverged)[0])
    for name in a._fields:
        if name == "log":
            continue
        va, vb = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        assert np.array_equal(va, vb, equal_nan=True), name


def test_lane_solver_ls_first_single_bit_identical():
    """The single-trial first line-search round (round 4 dispatch
    experiment) must not change any result bit: same accepted alphas,
    iterations, and trajectories as the always-two-trial ladder, on a
    workload that genuinely backtracks."""
    from aslr_to_tpu.pallas.lane_solver import build_lane_solver

    w = two_dof_vsa_boxddp(T=8)
    st = SolverSettings(maxiter=4, th_stop=1e-7)
    x0s = 0.25 * jax.random.normal(jax.random.PRNGKey(5), (4, 8))
    a = build_lane_solver(w.problem, st, bounds=w.bounds, interpret=True,
                          use_gaps=False)(x0s)
    b = build_lane_solver(w.problem, st, bounds=w.bounds, interpret=True,
                          use_gaps=False, ls_first_single=True)(x0s)
    for name in a._fields:
        if name == "log":
            continue
        va, vb = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        assert np.array_equal(va, vb, equal_nan=True), name


def test_lane_solver_ls_trials_bit_identical():
    """Non-default trials-per-launch (the measured-negative sweep knob)
    must keep solver results bit-identical to the default two-trial
    ladder at an unchunked horizon."""
    from aslr_to_tpu.pallas.lane_solver import build_lane_solver

    w = two_dof_vsa_boxddp(T=8)
    st = SolverSettings(maxiter=4, th_stop=1e-7)
    x0s = 0.25 * jax.random.normal(jax.random.PRNGKey(5), (4, 8))
    base = build_lane_solver(w.problem, st, bounds=w.bounds, interpret=True,
                             use_gaps=False)(x0s)
    for n in (3, 4):
        v = build_lane_solver(w.problem, st, bounds=w.bounds, interpret=True,
                              use_gaps=False, ls_trials=n)(x0s)
        for name in base._fields:
            if name == "log":
                continue
            va, vb = np.asarray(getattr(base, name)), np.asarray(getattr(v, name))
            assert np.array_equal(va, vb, equal_nan=True), (n, name)


def test_rollout_tiles_bit_identical():
    """rollout_tiles=2 (two (8,128) batch tiles per grid step) is pure
    block-layout repacking: outputs must be bit-identical to tiles=1 at
    an unchunked horizon with a large padded batch. (T must keep BOTH
    builds unchunked in f64 — the doubled pack halves the VMEM chunk
    budget, and a chunked cost sum differs by reassociation.)"""
    from aslr_to_tpu.pallas.vsa_kernels import build_rolloutn, extract_vsa_spec

    w = two_dof_vsa_boxddp(T=4)
    spec = extract_vsa_spec(w.problem, w.bounds)
    T, Bp, nu = 4, 2048, 4
    key = jax.random.PRNGKey(0)
    xs = 0.05 * jax.random.normal(key, (T + 1, 8, Bp))
    us = 0.01 * jax.random.normal(key, (T, nu, Bp))
    k = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (T, nu, Bp))
    K = 0.01 * jax.random.normal(jax.random.PRNGKey(2), (T, nu, 8, Bp))
    args = (xs, us, k, K, xs[0],
            jnp.full((1, Bp), 1.0), jnp.full((1, Bp), 0.5),
            jnp.zeros((T + 1, 8, Bp)), jnp.zeros((1, Bp)),
            jnp.full((1, Bp), 100.0))
    r1 = build_rolloutn(spec, T, interpret=True, n_trials=2, tiles=1)(*args)
    r2 = build_rolloutn(spec, T, interpret=True, n_trials=2, tiles=2)(*args)
    for i, (a, b) in enumerate(zip(r1, r2)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), i


def test_lane_doomed_retirement_matches_reference():
    """Doomed-lane early retirement (doomed_reject_iters) must match
    vmap(solve) bit-for-bit — including WHICH lanes retire and WHEN —
    and must genuinely fire on this fixture (lanes with long full-ladder
    rejection streaks, none of which diverge without the cap)."""
    w = two_dof_vsa_boxddp(T=12)
    x0s = 1.2 * jax.random.normal(jax.random.PRNGKey(2), (6, 8))
    st = SolverSettings(maxiter=10, th_stop=1e-7, doomed_reject_iters=3)
    ref = make_batched_solver(w.problem, st, use_gaps=False, bounds=w.bounds)(x0s)
    lane = make_batched_solver(w.problem, st, use_gaps=False, bounds=w.bounds,
                               use_fast_path="lanes")(x0s)
    retired = np.asarray(ref.diverged) & (np.asarray(ref.iterations) < 10)
    assert bool(np.any(retired)), "fixture no longer triggers retirement"
    _check(ref, lane)


def test_lane_solver_keep_log_matches_reference():
    """keep_log=True: the lane solver's per-iteration SolveLog series must
    match vmap(solve)'s bit-for-bit, including the NaN rows past each
    lane's termination (staggered-finish fixture)."""
    w = two_dof_vsa_boxddp(T=10)
    x0s = jnp.concatenate([
        0.02 * jax.random.normal(jax.random.PRNGKey(2), (3, 8)),
        0.3 * jax.random.normal(jax.random.PRNGKey(3), (2, 8)),
    ])
    st = SolverSettings(maxiter=18, th_stop=23.5)
    ref = make_batched_solver(w.problem, st, use_gaps=False, bounds=w.bounds,
                              keep_log=True)(x0s)
    lane = make_batched_solver(w.problem, st, use_gaps=False, bounds=w.bounds,
                               keep_log=True, use_fast_path="lanes")(x0s)
    _check(ref, lane)
    assert np.asarray(lane.log.costs).shape == (5, 18)
    assert len(set(np.asarray(lane.iterations).tolist())) > 1
    # schedule series are exact; value series match at the same
    # tolerances as _check (the fused kernels accumulate sums in a
    # different order than the generic path — final-ulp diffs, the
    # established parity bar), with identical NaN (never-ran) patterns
    for name in ref.log._fields:
        a = np.asarray(getattr(ref.log, name))
        b = np.asarray(getattr(lane.log, name))
        assert np.array_equal(np.isnan(a), np.isnan(b)), name
        if name in ("regs", "steps"):
            assert np.array_equal(a, b, equal_nan=True), name
        else:
            assert np.allclose(a, b, rtol=1e-6, atol=1e-9, equal_nan=True), name


def test_lane_reg_reject_factor_matches_reference():
    """Steep full-ladder-rejection escalation (reg_reject_factor) must
    match vmap(solve) bit-for-bit on a fixture with genuine full-ladder
    rejection streaks (the lanes reach reg_max decades sooner)."""
    w = two_dof_vsa_boxddp(T=12)
    x0s = 1.2 * jax.random.normal(jax.random.PRNGKey(2), (6, 8))
    st = SolverSettings(maxiter=10, th_stop=1e-7, reg_reject_factor=1000.0)
    ref = make_batched_solver(w.problem, st, use_gaps=False, bounds=w.bounds)(x0s)
    lane = make_batched_solver(w.problem, st, use_gaps=False, bounds=w.bounds,
                               use_fast_path="lanes")(x0s)
    # reg 100 from reg_init=1e-9 in <= 10 iterations requires 11 x10
    # increases — impossible without the steep factor engaging
    assert bool(np.any(np.asarray(ref.reg) >= 100.0)), \
        "fixture no longer exercises the steep escalation"
    _check(ref, lane)


def test_lane_solver_three_dof_sea_matches_reference():
    """Dimension-generic lane kernels (round 5): the 3-DoF SEA chain —
    ndx=12, nu=3, the smallest non-flagship chain — must match
    vmap(solve) element-for-element through the full FDDP loop
    (linearize + gap-aware backward + gap-contracting rollouts at
    trace-time-unrolled nl=3 algebra). The 7-DoF target runs the same
    code paths (scripts/bench_7dof.py measures it on hardware; its
    interpret-mode kernel bodies take minutes to compile on CPU, hence
    the 3-DoF pin)."""
    from aslr_to_tpu.workloads.presets import three_dof_sea

    w = three_dof_sea(T=8)
    st = SolverSettings(maxiter=5, th_stop=1e-9)
    x0s = 0.1 * jax.random.normal(jax.random.PRNGKey(11), (4, 12))
    ref = make_batched_solver(w.problem, st, use_gaps=True, bounds=None)(x0s)
    lane = make_batched_solver(w.problem, st, use_gaps=True, bounds=None,
                               use_fast_path="lanes")(x0s)
    # the n-DoF mass solve is a different (Cholesky) factorization than
    # the generic path's LAPACK solve, so parity is tight-tolerance
    # rather than bit-exact (unlike the 2-DoF adjugate path)
    assert np.allclose(ref.cost, lane.cost, rtol=1e-10)
    assert np.allclose(ref.us, lane.us, atol=1e-10)
    assert np.allclose(ref.xs, lane.xs, atol=1e-10)
    assert np.array_equal(np.asarray(ref.iterations), np.asarray(lane.iterations))
    assert np.array_equal(np.asarray(ref.converged), np.asarray(lane.converged))
    assert np.array_equal(np.asarray(ref.diverged), np.asarray(lane.diverged))
    assert np.allclose(ref.stop, lane.stop, rtol=1e-8)


def test_lane_speculative_backward_bit_identical():
    """The dual-reg speculative retry (two pred-gated bw_steps per loop
    round) must be bit-identical to the sequential retry — every lane
    lands on the same reg rung with the same tries accounting."""
    from aslr_to_tpu.pallas.lane_solver import build_lane_solver

    w = two_dof_vsa_boxddp(T=12)
    x0s = 1.2 * jax.random.normal(jax.random.PRNGKey(2), (6, 8))
    st = SolverSettings(maxiter=8, th_stop=1e-7)
    a = build_lane_solver(w.problem, st, bounds=w.bounds, interpret=True,
                          use_gaps=False)(x0s)
    b = build_lane_solver(w.problem, st, bounds=w.bounds, interpret=True,
                          use_gaps=False, speculative_backward=True)(x0s)
    for name in a._fields:
        if name == "log":
            continue
        va, vb = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        assert np.array_equal(va, vb, equal_nan=True), name
