"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; `xla_force_host_platform_device_count`
gives us 8 CPU "devices" so sharding/collective paths are exercised for real
(SURVEY.md §4: the reference had no distributed tests at all — we add them).
"""

import os

# force CPU even when the session env points at a TPU platform (axon —
# registered by a sitecustomize hook before this file runs, so the env var
# alone is not enough: also override the jax config after import).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
