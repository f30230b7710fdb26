"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware via
``--xla_force_host_platform_device_count`` (see SURVEY.md section 4).

This environment routes every JAX process through a TPU-tunnel PJRT plugin
registered from sitecustomize (which also imports jax at interpreter
startup).  Unit tests must not claim (or block on) the single TPU, so we
flip the platform to CPU *before any backend initializes* -- plugin
registration is lazy, so updating ``jax_platforms`` post-import is safe.
"""

import os

os.environ.setdefault("CLIORA_TPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["CLIORA_TPU_TEST_PLATFORM"])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running tests")


@pytest.fixture
def rng():
    return np.random.RandomState(11)
