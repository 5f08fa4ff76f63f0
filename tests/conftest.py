"""Test configuration: force a virtual 8-device CPU mesh.

All tests run on CPU with 8 virtual devices so sharding/pjit paths are
exercised without TPU hardware (SURVEY.md §4: multi-host tests via
``xla_force_host_platform_device_count``).

NOTE: this sandbox's sitecustomize registers an 'axon' TPU backend and calls
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start, which
overrides the JAX_PLATFORMS env var — so we must override the *config* after
importing jax, before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: jax's persistent compilation cache was tried here and REVERTED: on
# this jaxlib the XLA:CPU AOT deserialization path segfaults (cache entries
# are machine-feature-pinned with tuning flags like +prefer-no-scatter and
# concurrent pytest processes race on the cache files) — a worse failure
# mode than the compile time it saves.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
