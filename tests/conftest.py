import os

# Force a virtual 8-device CPU mesh for every test. NOTE: this image registers
# the axon TPU backend from sitecustomize and exports JAX_PLATFORMS=axon, so
# the env var alone is NOT enough — jax.config must be updated post-import
# (before any backend is instantiated).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 device threads time-share the host cores; on a 1-core host the
    # default 40s rendezvous termination timeout kills collective tests
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=3600"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA cache: warm CPU test runs skip recompiles (measured 68s -> 13s
# for a full DLA-34 init+apply). Keyed by program, so config-variant tests
# still compile once each; the cache dir is repo-local and git-ignored.
from centerfusiondetect3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs
