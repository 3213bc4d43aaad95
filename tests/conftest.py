"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-device sharding tests need several devices; real hardware in CI has at
most one chip, so the whole suite runs on CPU with
--xla_force_host_platform_device_count=8 (SURVEY.md §4 item 4).  Set
DDSP_TEST_PLATFORM=tpu to run against real hardware instead.

Note: the environment may force a TPU platform through sitecustomize with a
jax.config.update that overrides the JAX_PLATFORMS env var, so the platform
is pinned via jax.config here (before any backend initialization).
"""

import os

_platform = os.environ.get("DDSP_TEST_PLATFORM", "cpu")
if _platform == "cpu":
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
    return np.random.default_rng(0)
