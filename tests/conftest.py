"""Test harness configuration.

Runs everything on a virtual 8-device CPU platform so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4: multi-chip tests via
``xla_force_host_platform_device_count``).
"""

import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin registers itself regardless of JAX_PLATFORMS; the
# config update below forces the CPU platform (with 8 virtual devices from
# the XLA flag above) for the whole test session.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def box_room():
    """A simple closed 4m x 3m x 2.5m room with inward-facing walls."""
    from ipcgen_tpu.containers import TriMesh

    return TriMesh.box(center=(2.0, 1.5, 1.25), size=(4.0, 3.0, 2.5), inward=True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs a real TPU chip (probed via subprocess)"
    )
    config.addinivalue_line(
        "markers",
        "slow: multi-minute redundant-coverage test; skipped unless "
        "--runslow (or RUN_SLOW=1) is given",
    )


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip_slow = pytest.mark.skip(reason="slow; pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
