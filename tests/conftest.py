"""Test harness: force an 8-device virtual CPU platform BEFORE jax imports.

This is the TPU answer to "test multi-device behavior without a cluster"
(SURVEY.md §4): every sharding/collective test runs on 8 virtual CPU devices.
"""
import os

# Note: the surrounding environment may force JAX_PLATFORMS (e.g. a tunneled
# TPU platform), and a plugin may append to it after import — so we both set
# the env var AND update jax.config post-import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual devices, got {len(devices)}"
    return devices
