"""Test configuration: force CPU with a virtual 8-device mesh and float64.

Must run before jax is imported anywhere (hence env vars at module import).
Multi-chip sharding tests run against this virtual mesh (SURVEY §4: the
reference has no cluster tests at all — we add them on CPU).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-selects jax_platforms="axon,cpu" at
# interpreter start; the config update below wins as long as no backend has been
# created yet — tests must run on the virtual CPU mesh, never the real chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the control/PMP tests compile large programs
# (jacfwd through whole adaptive solves); caching makes repeat runs fast
jax.config.update("jax_compilation_cache_dir", "/tmp/janus_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
