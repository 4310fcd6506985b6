"""Test env: CPU backend with 8 fake devices (SURVEY.md §4 'Distributed').

The axon TPU tunnel in this image pins JAX_PLATFORMS=axon from
sitecustomize, overriding the env var; jax.config.update after import wins,
so force CPU that way. XLA_FLAGS must be set before the CPU client
initializes to get the 8-device fake mesh.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def micro_mesh():
    """Tiny deterministic mesh (~320 tris) so tests never need a real OBJ."""
    from tpurt import meshgen

    return meshgen.blob(subdiv=2, seed=7)


@pytest.fixture(scope="session")
def rays_random():
    """A deterministic batch of unit rays aimed at the origin region."""
    rs = np.random.default_rng(123)
    o = rs.uniform(-3, 3, size=(256, 3)).astype(np.float32)
    target = rs.uniform(-0.8, 0.8, size=(256, 3))
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d.astype(np.float32)
