"""Test environment: 8 virtual CPU devices.

Multi-device DP logic (shard_map + psum over the mesh 'data' axis) is
tested the standard JAX way — faking a slice with
``--xla_force_host_platform_device_count`` (SURVEY.md §4). Must run before
anything imports jax.
"""

import os

# Force CPU even though the session env pins JAX_PLATFORMS=axon (the real
# TPU tunnel, registered by sitecustomize before this file runs). The env
# var was already read at jax import, so the override must go through
# jax.config before the first device query.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from pcseg_tpu.parallel.mesh import MeshSpec, make_mesh

    return make_mesh(MeshSpec(data=8))


@pytest.fixture(scope="session")
def small_events():
    from pcseg_tpu.data.synthetic import synthetic_events

    return list(
        synthetic_events(
            32, num_classes=4, min_points=50, max_points=300, seed=7
        )
    )


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
