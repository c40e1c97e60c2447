"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md section 4: covers the multi-node testing gap the reference leaves).

Must run before any jax import.
"""

import os

# force-override: the environment presets JAX_PLATFORMS=axon (real TPU tunnel);
# unit tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

# belt-and-braces: if jax was already imported by a pytest plugin before this
# conftest ran, the env vars above were captured too late — force via config
# (works as long as no backend has been initialized yet).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compilation cache: the suite is dominated by tiny-kernel compile
# time on first run; cached reruns are fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/diarizen_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture
def rng():
    return np.random.default_rng(3407)
