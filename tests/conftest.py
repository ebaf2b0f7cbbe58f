"""Test configuration: device-free CI on a virtual 8-device CPU mesh.

The reference's tests all require a physical Ascend chip (SURVEY.md §4);
running the whole suite on host CPU with forced multi-device is an upgrade:
Pallas kernels run in interpreter mode (selected automatically by the op
wrappers when the backend is CPU) and sharding tests get an 8-device mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-registers itself and overrides
# JAX_PLATFORMS; the config update below is the authoritative override.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
