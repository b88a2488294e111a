"""Test configuration: force an 8-device CPU platform.

Tests never touch the TPU: they run on a virtual 8-device CPU mesh so
data-parallel correctness (1-chip vs N-chip equivalence) is testable
anywhere. Note the axon sitecustomize imports jax at interpreter start
with jax_platforms=axon,cpu; backends initialize lazily, so overriding
here — before any device use — is effective.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from cape_tpu.meshops import assets


@pytest.fixture(scope="session")
def template():
    verts, faces = assets.template_mesh()
    return verts, faces


@pytest.fixture(scope="session")
def small_mesh():
    """A small closed mesh (258-vert icosphere) for fast topology/qslim tests."""
    from cape_tpu.meshops.toy import icosphere

    return icosphere(3)
