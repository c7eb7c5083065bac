"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so sharding logic is exercised
without TPU hardware (the reference validates multi-GPU only on real hosts;
we make the multi-chip path unit-testable — SURVEY.md §4).

Set CUDASW4_TPU_TEST_TPU=1 to run tests on a real TPU instead.
"""

import os

if os.environ.get("CUDASW4_TPU_TEST_TPU", "0") != "1":
    # Force CPU even if the environment preselects a TPU platform.  Note a
    # sitecustomize may have imported jax already, so the env var alone is
    # not enough — set the config knob too (backends are not yet created).
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
