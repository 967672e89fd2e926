"""Test configuration: run the suite on a virtual 8-device CPU mesh.

This is the TPU-world analogue of the reference's hermetic 'keywords'
fake backend (SURVEY.md §4): multi-chip sharding logic is validated on
host-platform virtual devices, no TPU required.

Note: this image's sitecustomize imports jax at interpreter start (to
register the axon TPU plugin), so env vars alone are too late — we must
update jax's config object directly, before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
