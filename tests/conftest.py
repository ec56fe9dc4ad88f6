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

# The container's sitecustomize force-registers the TPU ('axon') backend and
# prepends it to jax_platforms; tests must run on the emulated CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
