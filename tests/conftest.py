"""Test harness: force CPU backend with 8 virtual devices so sharding
paths (Mesh / pjit / shard_map) are exercised without TPU hardware.

Must run before the first `import jax` anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS from the env;
# the config update below takes precedence over both.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference/MML_Suite"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def reference_configs():
    import glob

    paths = sorted(glob.glob(f"{REFERENCE_ROOT}/configs/**/*.yaml", recursive=True))
    if not paths:
        pytest.skip("reference configs not mounted")
    return paths
