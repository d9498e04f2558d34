"""Test config: force CPU backend with 8 virtual devices for mesh tests.

Must run before any jax import (SURVEY.md §4: multi-device without a cluster
via --xla_force_host_platform_device_count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin in this image ignores JAX_PLATFORMS; force via config
# before any computation runs.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import zlib

import numpy as np
import pytest


@pytest.fixture()
def rng(request):
    """Hermetic per-test RNG: the seed derives from the test's nodeid, so
    every test sees identical inputs regardless of suite order or subset
    selection.  (A shared session-scoped generator made input data depend
    on which tests ran earlier — parity tests flaked only in full runs.)"""
    seed = zlib.adler32(request.node.nodeid.encode())
    return np.random.default_rng(seed)


def random_boxes(rng, n, scale=1.0, min_size=0.01, max_size=0.4):
    """Random normalized xyxy boxes with positive extent."""
    xy = rng.uniform(0, 1 - max_size, size=(n, 2))
    wh = rng.uniform(min_size, max_size, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32) * scale
