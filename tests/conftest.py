"""Test harness: 8-virtual-device CPU platform + persistent compile cache.

Multi-chip sharding is validated on a virtual CPU mesh (the driver
separately dry-runs the multichip path); golden-value tests use torch (CPU)
as an independent numerical oracle.

Note: this environment pins JAX_PLATFORMS=axon (TPU tunnel) at interpreter
startup, and env-var overrides are ignored — platform selection must go
through jax.config.update BEFORE first backend use.
"""

import os

# Belt and braces for environments where env vars are honored.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# The mechanism that actually works here (see module docstring).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache: repeat test runs skip XLA compilation entirely.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(1338)
