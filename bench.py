#!/usr/bin/env python
"""Throughput benchmark: batched BoxDDP solves/s per chip.

North-star metric (BASELINE.md): batched DDP solves of the 2-DoF VSA
reach workload at T=100 knots, target >= 1000 solves/s per chip. Each
"solve" is a cold-started BoxDDP run (maxiter capped) over a batch of
perturbed initial states, vmapped into one XLA program on the chip.

Quality-adjusted metrics in the same JSON line (the reference defines
"solved" by th_stop, two_dof_sea.py:79-81; a throughput number alone says
nothing about whether the solves mean anything):

- ``converged_headline_solves_per_s``: SEA reach (FDDP family), warm
  re-solve from a previous solution after perturbing x0 (the MPC re-solve
  pattern, examples/mpc_resolve.py) — converges the whole batch at
  th_stop=1e-5.
- ``quality_solves_per_s``: VSA staged terminal-weight homotopy (5 stages
  x maxiter budget) — the config whose f32 median cost matches the f64
  staged answer (docs/BENCH.md).

Prints ONE JSON line. Secondary metrics are skipped (never failed) when
the watchdog budget runs short; the persistent compilation cache
(.jax_cache) makes their compiles a one-time cost per container.
"""
import json
import os
import sys
import time

def _env_int(name, default):
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        print(f"[bench] ignoring invalid {name}={os.environ.get(name)!r}; using {default}",
              file=sys.stderr)
        return int(default)


# throughput saturates at ~B=4096 (2810 @2048, 3313 @4096, 3345 @8192)
BATCH = _env_int("BENCH_BATCH", "4096")
MAXITER = _env_int("BENCH_MAXITER", "20")
T = _env_int("BENCH_T", "100")
REPS = _env_int("BENCH_REPS", "6")  # pipelined, so extra reps cost ~170 ms each
# "vsa" (default, the driver metric: BoxDDP) or "sea" (FDDP family)
WORKLOAD = os.environ.get("BENCH_WORKLOAD", "vsa")
TH_STOP = float(os.environ.get("BENCH_TH_STOP", "1e-5"))
# secondary (quality) metrics: skip by setting BENCH_QUALITY=0
QUALITY = os.environ.get("BENCH_QUALITY", "1") == "1"
# BoxQP active-set warm start: QP iterations after the first solver
# iteration (0 = cold 6-iteration QPs; see SolverSettings.boxqp_warm_iters)
QP_WARM = _env_int("BENCH_QP_WARM", "2")
# diverged-lane rescue pass for the quality metric (0 = off): up to this
# many lanes the staged homotopy failed are re-solved under the tighter
# rescue_continuation schedule inside the same timed program. Measured
# (scripts/diag_rescue.py, B=4096): diverged 7.5% -> 1.1%, median cost
# 624 -> 599 (better than the f64 staged 628), at -22% quality
# throughput — the production trade, honestly accounted.
RESCUE = _env_int("BENCH_RESCUE", "512")
BASELINE_SOLVES_PER_S = 1000.0

BUDGET_S = int(os.environ.get("BENCH_TIMEOUT_S", "1500"))
T0 = time.perf_counter()


def _left():
    return BUDGET_S - (time.perf_counter() - T0)


def _log(msg):
    print(f"[bench] {msg} (+{time.perf_counter() - T0:.1f}s)",
          file=sys.stderr, flush=True)


def _time_solves(fn, x0s, reps, dtype, warm_from=None):
    """Compile+warm once, then time ``reps`` solves (each on a freshly
    perturbed batch). ``warm_from`` re-solves warm-started from a prior
    solution (xs, us). Returns (solves_per_s, last result).

    The reps are PIPELINED: all solve batches are dispatched before any
    result is fetched. Through the axon tunnel a blocking fetch costs
    ~30-45 ms of pure host/tunnel latency per call; fetching after every
    rep times dispatch+sync per batch and understates the chip by ~20%
    (device-side rate 24.7k/s vs 19.4k/s host-measured, docs/BENCH.md).
    The device serializes the queued programs, so wall time from first
    dispatch to the last fetched cost still covers every execution —
    this is the steady-state throughput a producer/consumer deployment
    sees, with the one-time sync latency amortized over the reps.
    """
    import jax
    import jax.numpy as jnp

    import numpy as np

    # timings FETCH a value to host: block_until_ready through the axon
    # tunnel has been observed to return before execution finishes
    # (scripts/probe_sublane.py), which would time only the dispatch
    args = () if warm_from is None else warm_from
    # pre-materialize the perturbed input batches on device (inputs, not
    # part of the solve); keeps the timed region pure solver work
    x0s_all = [x0s + jnp.asarray(1e-4 * (i + 1), dtype=dtype) for i in range(reps)]
    jax.block_until_ready(x0s_all)
    out = fn(x0s, *args)
    np.asarray(out.cost)
    t0 = time.perf_counter()
    outs = [fn(x0s_i, *args) for x0s_i in x0s_all]
    for o in outs:
        np.asarray(o.cost)
    elapsed = time.perf_counter() - t0
    return x0s.shape[0] * reps / elapsed, outs[-1]


def main():
    import jax
    import jax.numpy as jnp

    from aslr_to_tpu.parallel.batch import convergence_summary, make_batched_solver
    from aslr_to_tpu.solvers.ddp import SolverSettings
    from aslr_to_tpu.utils.compilation_cache import enable
    from aslr_to_tpu.workloads.presets import two_dof_sea, two_dof_vsa_boxddp

    enable()

    # claim the device with a trivial sync first: the tunneled TPU
    # intermittently stalls for minutes on the first blocking call of a
    # process (measured 519s once); doing it here attributes the stall to
    # this labeled phase instead of poisoning the build/compile timings
    jax.block_until_ready(jnp.zeros(()) + 1.0)
    _log("device claimed")

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if WORKLOAD == "sea":
        w = two_dof_sea(T=T, dtype=dtype)
        use_gaps, bounds, label = True, None, "FDDP solves/s/chip (2-DoF SEA"
    else:
        w = two_dof_vsa_boxddp(T=T, dtype=dtype)
        use_gaps, bounds, label = False, w.bounds, "BoxDDP solves/s/chip (2-DoF VSA"
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    # lane-layout end-to-end solver (zero per-iteration relayouts); falls
    # back to the standard fused path if the problem shape is unsupported
    use_lanes = use_pallas and os.environ.get("BENCH_LANES", "1") == "1"
    settings = SolverSettings(maxiter=MAXITER, th_stop=TH_STOP,
                              use_pallas_backward=use_pallas,
                              boxqp_warm_iters=QP_WARM)
    _log(f"setup done (workload={WORKLOAD}, lanes={use_lanes}, th_stop={TH_STOP:g})")
    fn, path = None, "generic"
    if use_lanes:
        try:
            fn = make_batched_solver(w.problem, settings, use_gaps=use_gaps, bounds=bounds,
                                     use_fast_path="lanes")
            path = "lanes"
        except Exception as e:
            print(f"[bench] lane solver unavailable ({type(e).__name__}: {e}); "
                  "using standard fast path", file=sys.stderr)
    if fn is None:
        fn = make_batched_solver(w.problem, settings, use_gaps=use_gaps, bounds=bounds,
                                 use_fast_path=use_pallas)
        path = "fast" if use_pallas else "generic"
    _log("solver built")

    nx = w.problem.state.nx
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (BATCH, nx), dtype=dtype)

    solves_per_s, out = _time_solves(fn, x0s, REPS, dtype)
    # convergence quality of the timed runs — a "solve" must mean
    # something (reference defines solved by th_stop, two_dof_sea.py:79-81)
    summ = convergence_summary(out)
    _log(f"primary: {solves_per_s:.0f}/s, convergence {summ}")
    record = {
        "metric": f"batched {label}, T={T}, maxiter={MAXITER}, batch={BATCH})",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 4),
        "path": path,
        "th_stop": TH_STOP,
        "converged_frac": round(summ["converged_frac"], 4),
        "diverged_frac": round(summ["diverged_frac"], 4),
        "mean_iterations": round(summ["mean_iterations"], 2),
    }

    # -- converged-quality headline: SEA warm re-solve, 100% at th_stop ----
    if QUALITY and WORKLOAD == "vsa" and use_lanes and _left() > 300:
        try:
            sw = two_dof_sea(T=T, dtype=dtype)
            sea_fn = make_batched_solver(
                sw.problem, SolverSettings(maxiter=60, th_stop=TH_STOP,
                                           use_pallas_backward=True),
                use_gaps=True, bounds=None, use_fast_path="lanes")
            sx0 = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (BATCH, nx), dtype=dtype)
            cold = sea_fn(sx0)
            jax.block_until_ready(cold.cost)
            _log("SEA cold solved (warm-start source ready)")
            rate, res = _time_solves(sea_fn, sx0, REPS, dtype,
                                     warm_from=(cold.xs, cold.us))
            s2 = convergence_summary(res)
            record["converged_headline_solves_per_s"] = round(rate, 2)
            record["converged_headline_frac"] = round(s2["converged_frac"], 4)
            _log(f"SEA warm headline: {rate:.0f}/s, {s2['converged_frac']:.1%} converged")
        except Exception as e:  # never lose the primary metric
            print(f"[bench] SEA headline skipped: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # -- quality metric: VSA staged homotopy (f32 median == f64 staged) ----
    if QUALITY and WORKLOAD == "vsa" and use_lanes and _left() > 400:
        try:
            # production homotopy config = the stiffness-bound continuation
            # (solvers/homotopy.stiffness_continuation): without it the
            # staged solve fights the full stiffness box from stage one and
            # the median cost degrades 628 -> ~850 (docs/BENCH.md)
            from aslr_to_tpu.solvers.homotopy import (rescue_continuation,
                                                      stiffness_continuation)
            hscales, hub = stiffness_continuation(w.problem, bounds)
            rscales, rub = (rescue_continuation(w.problem, bounds)
                            if RESCUE else (None, None))
            hfn = make_batched_solver(w.problem, settings, use_gaps=use_gaps,
                                      bounds=bounds, use_fast_path="lanes",
                                      globalization="homotopy",
                                      scales=hscales, ub_stages=hub,
                                      rescue_scales=rscales,
                                      rescue_ub_stages=rub,
                                      rescue_size=RESCUE)
            rate, res = _time_solves(hfn, x0s, REPS, dtype)
            s3 = convergence_summary(res)
            record["quality_solves_per_s"] = round(rate, 2)
            record["quality_median_cost"] = round(s3["median_cost"], 2)
            record["quality_diverged_frac"] = round(s3["diverged_frac"], 4)
            _log(f"homotopy quality: {rate:.0f}/s, median cost {s3['median_cost']:.1f}")
        except Exception as e:
            print(f"[bench] homotopy quality skipped: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # -- 7-DoF generality: the talos_arm-class SEA reach on the lane path --
    # (dimension-generic kernels, round 5 — was 16 solves/s generic-only)
    if (QUALITY and WORKLOAD == "vsa" and use_lanes and _left() > 250
            and os.environ.get("BENCH_7DOF", "1") == "1"):
        try:
            from aslr_to_tpu.workloads.presets import seven_dof_sea
            sw7 = seven_dof_sea(T=T, dtype=dtype)
            B7 = _env_int("BENCH_7DOF_BATCH", "1024")   # measured knee
            fn7 = make_batched_solver(
                sw7.problem, SolverSettings(maxiter=MAXITER, th_stop=TH_STOP),
                use_gaps=True, bounds=None, warm_start=True,
                use_fast_path="lanes")
            x7 = 0.05 * jax.random.normal(jax.random.PRNGKey(2),
                                          (B7, sw7.problem.state.nx), dtype=dtype)
            rate, res = _time_solves(fn7, x7, REPS, dtype)
            s4 = convergence_summary(res)
            record["sevendof_solves_per_s"] = round(rate, 2)
            record["sevendof_converged_frac"] = round(s4["converged_frac"], 4)
            _log(f"7-DoF lane: {rate:.0f}/s, {s4['converged_frac']:.1%} converged")
        except Exception as e:
            print(f"[bench] 7-DoF metric skipped: {type(e).__name__}: {e}",
                  file=sys.stderr)

    print(json.dumps(record))


def _fail(msg):
    print(json.dumps({
        "metric": "batched BoxDDP solves/s/chip (2-DoF VSA, T=100)",
        "value": 0.0,
        "unit": "solves/s",
        "vs_baseline": 0.0,
        "error": msg[:500],
    }))


if __name__ == "__main__":
    # Watchdog: the tunneled TPU can wedge on a stuck device claim; make
    # sure ONE JSON line is printed even then (best effort — SIGALRM may
    # not interrupt a blocked PJRT call, but catches slow compiles).
    import signal

    def _on_alarm(signum, frame):
        raise TimeoutError(f"bench exceeded {BUDGET_S}s (TPU wedged or compile too slow)")

    try:
        signal.signal(signal.SIGALRM, _on_alarm)
        signal.alarm(BUDGET_S)
    except (ValueError, OSError):
        pass
    try:
        main()
    except BaseException as e:  # never crash the driver: report zero with the error
        _fail(f"{type(e).__name__}: {e}")
        sys.stdout.flush()
        os._exit(0)  # skip teardown — a wedged PJRT client can hang atexit
