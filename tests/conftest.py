"""Test configuration: force an 8-device virtual CPU mesh.

The axon sitecustomize pins JAX_PLATFORMS=axon (single real TPU chip); tests
run on CPU with 8 virtual devices so multi-device sharding paths are exercised
without hardware (the TPU-native analogue of the reference's DDP-less CPU
smoke mode, reference main_pretrain.py:71-88).

Set EVENTPRETRAIN_TEST_TPU=1 to keep the real TPU backend instead — this
enables the compiled-kernel tier (tests/test_tpu_compiled.py, skipped on
CPU) and runs everything else single-device on the chip.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("EVENTPRETRAIN_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs


@pytest.fixture
def rng():
    import numpy as np

    return np.random.default_rng(0)
