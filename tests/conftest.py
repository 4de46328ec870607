"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; the sharding/collective paths
are validated on a faked 8-device CPU platform exactly as SURVEY.md §4
prescribes (``xla_force_host_platform_device_count``). Must run before the
first ``import jax`` anywhere in the test session.
"""

import os
import re
import sys

# the suite requires EXACTLY 8 faked devices: replace (not just append to)
# any pre-existing count in the shell's XLA_FLAGS — a stale =4 from e.g.
# the multihost-worker recipe would fail every mesh test opaquely
flags = os.environ.get("XLA_FLAGS", "")
flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8").strip()

# root scripts (main.py, compute_metrics.py, ...) import as top-level
# modules; one bootstrap here instead of per-test-module copies
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
