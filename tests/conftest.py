"""Test harness config: force an 8-virtual-device CPU mesh.

Multi-chip sharding semantics are tested without TPU hardware via
``--xla_force_host_platform_device_count`` (SURVEY.md §4 test-strategy gap).

This environment's TPU is attached through the ``axon`` PJRT plugin, whose
sitecustomize calls ``jax.config.update("jax_platforms", "axon,cpu")`` in
every interpreter — overriding the ``JAX_PLATFORMS`` env var and routing all
compute through a slow network tunnel.  Unit tests must run on local CPU, so
before any backend is initialized we (a) inject the virtual-device XLA flag
and (b) point ``jax_platforms`` back at cpu only.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# COME_TPU_TESTS=1 opts into the real-hardware tests (-m tpu): leave the
# backend alone so @pytest.mark.tpu tests see the chip.
_TPU_OPT_IN = os.environ.get("COME_TPU_TESTS") == "1"
if not _TPU_OPT_IN:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

if not _TPU_OPT_IN:
    assert jax.default_backend() == "cpu", (
        "tests must run on local CPU, got " + jax.default_backend()
    )
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: needs real TPU hardware (run with COME_TPU_TESTS=1 -m tpu)",
    )


def pytest_collection_modifyitems(config, items):
    if _TPU_OPT_IN:
        return
    skip = pytest.mark.skip(reason="TPU hardware test (set COME_TPU_TESTS=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
