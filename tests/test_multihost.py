"""Multi-host (multi-process) runtime exercised for real (VERDICT r1 #7).

Two OS processes initialize the distributed JAX runtime through
``parallel.mesh.distributed_init`` (coordinator + Gloo collectives on the
CPU backend), build a global 2-device mesh (one device per process), and
run a psum-reduced sharded solve — the exact pattern an N-host TPU pod
deployment uses over DCN, minus the hardware.
"""
import os
import socket
import subprocess
import sys
import textwrap

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, %(repo)r)
    sys.path.insert(0, %(repo)r + "/tests")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    pid = int(sys.argv[1])
    port = sys.argv[2]

    from aslr_to_tpu.parallel.mesh import distributed_init
    distributed_init(coordinator_address="localhost:" + port,
                     num_processes=2, process_id=pid)
    assert jax.device_count() == 2, jax.device_count()
    assert jax.local_device_count() == 1

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    from aslr_to_tpu.parallel.spmd import shard_map_solve
    from aslr_to_tpu.solvers.ddp import SolverSettings
    from test_solver import _lqr_problem

    prob = _lqr_problem(T=10)
    mesh = Mesh(np.asarray(jax.devices()), ("batch",))
    x0s = jnp.stack([jnp.array([0.5, -0.2]) * (i - 1) for i in range(4)])
    res, (n_conv, mean_cost) = shard_map_solve(
        prob, x0s, SolverSettings(maxiter=20, th_stop=1e-12), mesh=mesh)
    # global stats identical on every process (psum across the DCN analog)
    print(f"RESULT {pid} {float(n_conv)} {float(mean_cost):.12e}", flush=True)
""")


def test_two_process_distributed_init_and_psum():
    port = _free_port()
    env = dict(os.environ)
    # one CPU device per process (the conftest's 8-device emulation flag
    # would otherwise leak into the workers)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER % {"repo": REPO}, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, n_conv, mean_cost = line.split()
                results[pid] = (n_conv, mean_cost)
    assert set(results) == {"0", "1"}, outs
    # both processes computed identical psum-reduced global stats
    assert results["0"] == results["1"], results
    n_conv = float(results["0"][0])
    assert n_conv >= 3.0  # scenario 1 is x0=0 (trivial); others converge too


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
