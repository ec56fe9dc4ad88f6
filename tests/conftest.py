"""Test configuration.

Runs the whole suite on an emulated 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware, and in float64 so derivative
cross-checks can use tight tolerances (mirrors the reference's CPU/fp64 test
setup, see /root/reference/unittest/test_utils_ex.py tolerances).
"""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The container's sitecustomize force-registers the TPU ('axon') backend and
# prepends it to jax_platforms; tests must run on the emulated CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Fast tier: `pytest -m "not slow"` skips the minute-scale interpret-mode
# parity suites and full-budget runs (the full suite is CI's job; the fast
# tier keeps the edit-test loop under ~10 min on the 2-core container).
_SLOW_FILES = {
    "test_lane_solver.py",
    "test_lane_per_knot.py",
    "test_boxqp_warm.py",
    "test_vsa_fast_path.py",
    "test_homotopy.py",
    "test_northstar.py",
    "test_multihost.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)
