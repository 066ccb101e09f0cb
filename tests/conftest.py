"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require real TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh via ``xla_force_host_platform_device_count`` (the standard
JAX substitute for "multi-node without a cluster" — SURVEY.md §4).
"""

import os

# Force CPU regardless of the ambient platform (the dev box pre-sets
# JAX_PLATFORMS=axon for the tunneled TPU chip).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The ambient `axon` TPU plugin overrides JAX_PLATFORMS at import time;
# the config knob wins over it.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
