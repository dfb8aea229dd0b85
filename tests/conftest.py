import os

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware (the driver separately dry-runs the multichip path).
#
# The axon TPU PJRT plugin pre-imports jax and registers its backend factory
# in sitecustomize at interpreter startup (ignoring JAX_PLATFORMS=cpu), but it
# does NOT initialize the backend until first use — so deregistering the
# factory here, before any jax computation, forces a clean CPU-only JAX.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The sitecustomize-exported JAX_PLATFORMS=axon wins over the env var we set
# above (jax was already imported), but the config flag wins over both.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

# Persistent compilation cache: the suite is dominated by XLA CPU compiles of
# the same kernels across test processes; cache them under .jax_cache
# (gitignored).  min_compile_time 1s keeps tiny graphs out of the cache.
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
