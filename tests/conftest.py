"""Test config: force CPU JAX with 8 virtual devices for sharding tests.

Per SURVEY.md §4: multi-host fakes are unnecessary; CPU jax with
--xla_force_host_platform_device_count suffices to exercise sharded code.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# The environment's sitecustomize registers a remote TPU ("axon") backend at
# interpreter start and forces jax_platforms="axon,cpu".  Tests must run on
# the local CPU with 8 virtual devices, so override after the fact.
import jax

jax.config.update("jax_platforms", "cpu")

REFERENCE = pathlib.Path("/root/reference")

import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run the heavy cross-check tests (oracle cross-RMSE, "
        "8-device sharding end-to-end, furnace integrals)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy cross-check (skipped by default; enable with "
        "--runslow — the full pyramid runs at round end)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def reference_scenes():
    scenes = REFERENCE / "scenes"
    if not scenes.is_dir():
        pytest.skip("reference scenes not available")
    return scenes
