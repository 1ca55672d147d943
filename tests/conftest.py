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


@pytest.fixture(scope="session")
def reference_scenes():
    scenes = REFERENCE / "scenes"
    if not scenes.is_dir():
        pytest.skip("reference scenes not available")
    return scenes
