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
    """A small closed mesh (icosphere-ish) for fast topology/qslim tests."""
    # subdivided octahedron projected to the sphere
    verts = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        dtype=np.float64,
    )
    faces = np.array(
        [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]],
        dtype=np.int32,
    )
    for _ in range(3):  # subdivide to 258 verts
        verts, faces = _subdivide(verts, faces)
    return verts, faces


def _subdivide(verts, faces):
    verts = list(map(tuple, verts))
    cache = {}

    def midpoint(i, j):
        key = (min(i, j), max(i, j))
        if key not in cache:
            v = (np.asarray(verts[i]) + np.asarray(verts[j])) / 2.0
            v = v / np.linalg.norm(v)
            cache[key] = len(verts)
            verts.append(tuple(v))
        return cache[key]

    new_faces = []
    for a, b, c in faces:
        ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
        new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
    return np.asarray(verts, dtype=np.float64), np.asarray(new_faces, dtype=np.int32)
