"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective code is
validated on host CPU devices exactly as the driver's dryrun does. Must set
the env vars before the first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the outer env may point at TPU
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may already be imported by a pytest plugin before this conftest runs,
# in which case the env var above is too late — the config route works until
# the first backend use.
jax.config.update("jax_platforms", "cpu")

# f64 for numeric parity with the reference's double-precision Ceres solves.
# TPU production paths run f32; tests validate math at f64.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: kernels (Newton undistortion, LM loops)
# compile once per machine instead of once per pytest process.
from sba_tpu.utils.host import machine_cache_dir  # noqa: E402

# Per-machine-type subdir: XLA:CPU AOT artifacts are machine-feature-
# specific; loading a cache primed on another host generation segfaults.
_cache_dir = machine_cache_dir(
    os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end pipeline test")
