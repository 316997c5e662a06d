"""Test configuration: force CPU with 8 virtual devices.

Multi-device sharding tests run on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count), per the build's test strategy
(SURVEY.md §4).  The environment pre-registers a TPU ('axon') backend via
sitecustomize before pytest starts, so the env-var route is too late —
jax.config.update is the reliable override.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_cfg():
    """Each test sees pristine config defaults."""
    from wseg_tpu.config import reset_cfg
    reset_cfg()
    yield
    reset_cfg()


@pytest.fixture
def rng_np():
    return np.random.RandomState(0)
