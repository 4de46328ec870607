"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; the sharding/collective paths
are validated on a faked 8-device CPU platform exactly as SURVEY.md §4
prescribes (``xla_force_host_platform_device_count``). Must run before the
first ``import jax`` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The hosted-TPU environment pre-sets JAX_PLATFORMS=axon before this process
# starts and the plugin wins over a plain env override, so force the config
# flag too (it is read at first backend initialisation).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
