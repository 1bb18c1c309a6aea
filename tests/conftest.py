"""Test configuration: run everything on a virtual 8-device CPU mesh.

The sandbox's sitecustomize registers the TPU ('axon') PJRT plugin and forces
``jax_platforms='axon,cpu'`` in every interpreter, so the env-var route
(JAX_PLATFORMS=cpu) is overridden.  We re-force CPU through jax.config before
any backend is initialized, and request 8 virtual CPU devices so mesh/pjit
sharding tests exercise real multi-device paths (SURVEY.md §4 item 4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
