"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax import.

The driver validates multi-chip sharding the same way (see __graft_entry__.py);
tests never require real TPU hardware.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# make the repo root importable regardless of pytest rootdir mechanics
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU sitecustomize force-registers the axon backend and overrides
# JAX_PLATFORMS; config.update after import wins and pins tests to the
# 8-device virtual CPU platform.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(42)


@pytest.fixture
def key():
    import jax

    return jax.random.PRNGKey(42)
