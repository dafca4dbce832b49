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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 virtual devices share ONE core here: a device thread can take
    # minutes to reach a cross-replica all-reduce, and XLA:CPU's default
    # 40 s rendezvous termination then hard-aborts the whole process
    # (F rendezvous.cc "Exiting to ensure a consistent program state").
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              " --xla_cpu_collective_timeout_seconds=1200"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags

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
