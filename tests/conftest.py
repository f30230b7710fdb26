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
    config.addinivalue_line(
        "markers", "smoke: fast correctness core (indices / chart ops / "
        "einsum VJPs / native decode), `pytest -m smoke` < 5 min")


# The fast lane: the full suite takes 25-40 min on the 1-core host, so
# these modules form a < 5-min correctness core covering the chart-index
# algebra, the inside/outside passes (incl. remat/CKY parity), the
# low-precision einsum VJPs, and the C decoder.  Measured 2026-08-19:
# 70 tests in ~4.4 min contended / less solo.  Run while iterating:
#   python -m pytest -m smoke -q
SMOKE_MODULES = {
    "test_chart_indices",
    "test_chart_pass",
    "test_lowp_einsum",
    "test_native",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__ in SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture
def rng():
    return np.random.RandomState(11)
