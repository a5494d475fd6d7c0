"""Root conftest: force tests onto a virtual 8-device CPU platform.

The axon sitecustomize imports jax at interpreter startup (before pytest
collects this file), so JAX_PLATFORMS env vars are too late — but backends
initialize lazily, so switching the config still works. We also force fp32
matmuls so numerical tests are deterministic across platforms. Real-TPU
benchmarking lives in bench.py, not in the test suite.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
