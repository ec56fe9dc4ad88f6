#!/usr/bin/env python
"""Capture a device trace of the bench workload and aggregate op times.

Runs the B=2048 BoxDDP bench solve once under jax.profiler, then parses the
chrome-trace JSON that XProf emits and prints the top ops by total device
time. Attribution guide: 'fusion' = XLA-fused elementwise/transpose work,
'custom-call' / names with 'pallas'/'tpu_custom_call' = our kernels.
"""
import glob
import gzip
import json
import os
import sys
import collections

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = int(os.environ.get("BENCH_BATCH", "2048"))
MAXITER = int(os.environ.get("BENCH_MAXITER", "20"))
T = int(os.environ.get("BENCH_T", "100"))
LOGDIR = os.environ.get("PROF_DIR", "/tmp/aslr_prof")


def main():
    import jax
    import jax.numpy as jnp
    from aslr_to_tpu.parallel.batch import make_batched_solver
    from aslr_to_tpu.solvers.ddp import SolverSettings
    from aslr_to_tpu.workloads import presets

    dtype = jnp.float32
    # PROF_WORKLOAD: "two_dof_vsa_boxddp" (default, the driver metric) or
    # any preset name — "seven_dof_sea" traces the big-state FDDP lane path
    wname = os.environ.get("PROF_WORKLOAD", "two_dof_vsa_boxddp")
    w = getattr(presets, wname)(T=T, dtype=dtype)
    settings = SolverSettings(maxiter=MAXITER, th_stop=1e-5, use_pallas_backward=True,
                              boxqp_warm_iters=int(os.environ.get("BENCH_QP_WARM", "2")))
    # PROF_PATH: "lanes" (default, the production path) or "fused"
    path = os.environ.get("PROF_PATH", "lanes")
    fn = make_batched_solver(w.problem, settings, use_gaps=w.bounds is None,
                             bounds=w.bounds,
                             warm_start=w.bounds is None,
                             use_fast_path="lanes" if path == "lanes" else True)
    x0s = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (BATCH, w.problem.state.nx), dtype=dtype)

    import time
    t0 = time.perf_counter()
    out = fn(x0s)
    jax.block_until_ready(out.cost)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    jax.profiler.start_trace(LOGDIR)
    out = fn(x0s + jnp.asarray(1e-4, dtype))
    jax.block_until_ready(out.cost)
    jax.profiler.stop_trace()
    print(f"traced rep: {time.perf_counter() - t0:.2f}s", file=sys.stderr)


def aggregate():
    paths = glob.glob(os.path.join(LOGDIR, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace found under", LOGDIR)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # keep only complete events on TPU device tracks (pid with 'TPU' in name)
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e}
    device_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # ms
        agg[name] += dur
        cnt[name] += 1
        total += dur
    print(f"\n== device events from {os.path.basename(path)} (total {total:.1f} ms summed) ==")
    for name, ms in agg.most_common(40):
        print(f"{ms:9.2f} ms  x{cnt[name]:<6} {name[:110]}")


if __name__ == "__main__":
    if "--parse-only" not in sys.argv:
        main()
    aggregate()
