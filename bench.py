#!/usr/bin/env python
"""Throughput benchmark: batched BoxDDP solves/s per chip.

North-star metric (BASELINE.md): batched DDP solves of the 2-DoF VSA
reach workload at T=100 knots, target >= 1000 solves/s per chip. Each
"solve" is a cold-started BoxDDP run (maxiter capped) over a batch of
perturbed initial states, vmapped into one XLA program on the chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
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
REPS = _env_int("BENCH_REPS", "3")
# "vsa" (default, the driver metric: BoxDDP) or "sea" (FDDP family)
WORKLOAD = os.environ.get("BENCH_WORKLOAD", "vsa")
TH_STOP = float(os.environ.get("BENCH_TH_STOP", "1e-5"))
BASELINE_SOLVES_PER_S = 1000.0


def main():
    global T0
    T0 = time.perf_counter()
    import jax
    import jax.numpy as jnp

    from aslr_to_tpu.parallel.batch import make_batched_solver
    from aslr_to_tpu.solvers.ddp import SolverSettings
    from aslr_to_tpu.workloads.presets import two_dof_sea, two_dof_vsa_boxddp

    # claim the device with a trivial sync first: the tunneled TPU
    # intermittently stalls for minutes on the first blocking call of a
    # process (measured 519s once); doing it here attributes the stall to
    # this labeled phase instead of poisoning the build/compile timings
    jax.block_until_ready(jnp.zeros(()) + 1.0)
    print(f"[bench] device claimed at +{time.perf_counter() - T0:.1f}s",
          file=sys.stderr, flush=True)

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
    settings = SolverSettings(maxiter=MAXITER, th_stop=TH_STOP, use_pallas_backward=use_pallas)
    t_setup = time.perf_counter()
    print(f"[bench] setup done at +{t_setup - T0:.1f}s (workload={WORKLOAD}, "
          f"lanes={use_lanes}, th_stop={TH_STOP:g})", file=sys.stderr, flush=True)
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
    print(f"[bench] solver built at +{time.perf_counter() - T0:.1f}s",
          file=sys.stderr, flush=True)

    nx = w.problem.state.nx
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (BATCH, nx), dtype=dtype)

    # compile + warm up (progress on stderr; stdout stays one JSON line)
    t0 = time.perf_counter()
    out = fn(x0s)
    jax.block_until_ready(out.cost)
    print(f"[bench] compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    for i in range(REPS):
        x0s_i = x0s + jnp.asarray(1e-4 * (i + 1), dtype=dtype)
        out = fn(x0s_i)
        jax.block_until_ready(out.cost)
    elapsed = time.perf_counter() - t0

    solves_per_s = BATCH * REPS / elapsed
    # convergence quality of the timed runs — a "solve" must mean
    # something (reference defines solved by th_stop, two_dof_sea.py:79-81)
    from aslr_to_tpu.parallel.batch import convergence_summary
    summ = convergence_summary(out)
    print(f"[bench] convergence: {summ}", file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": f"batched {label}, T={T}, maxiter={MAXITER}, batch={BATCH})",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 4),
        "path": path,
        "th_stop": TH_STOP,
        "converged_frac": round(summ["converged_frac"], 4),
        "diverged_frac": round(summ["diverged_frac"], 4),
        "mean_iterations": round(summ["mean_iterations"], 2),
    }))


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

    # lane-solver builds for a cold mosaic cache have taken up to ~380s
    # through the tunnel; leave headroom so the watchdog only fires on a
    # genuinely wedged device
    budget = int(os.environ.get("BENCH_TIMEOUT_S", "900"))

    def _on_alarm(signum, frame):
        raise TimeoutError(f"bench exceeded {budget}s (TPU wedged or compile too slow)")

    try:
        signal.signal(signal.SIGALRM, _on_alarm)
        signal.alarm(budget)
    except (ValueError, OSError):
        pass
    try:
        main()
    except BaseException as e:  # never crash the driver: report zero with the error
        _fail(f"{type(e).__name__}: {e}")
        sys.stdout.flush()
        os._exit(0)  # skip teardown — a wedged PJRT client can hang atexit
