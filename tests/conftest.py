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

# Persistent compilation cache: many tests compile *identical* HLO (every
# Trainer instance re-jits the same train step), and the cache is keyed by
# HLO hash, so it dedupes those compiles even within one cold run — and
# makes warm reruns of the suite much faster on this 1-CPU box.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest

from cape_tpu.meshops import assets


@pytest.fixture(scope="session")
def template():
    verts, faces = assets.template_mesh()
    return verts, faces


@pytest.fixture(scope="session")
def flagship_ctx():
    """The full-template banded GraphContext (for_demo + ds2 pyramids,
    default production args), built ONCE per session. Every full-template
    test file shares this instead of rebuilding its own — pyramid
    permutation + band packing of the 6890-vertex mesh costs ~10s a copy
    and used to run once per module."""
    from cape_tpu.ops.sparse import build_graph_context

    verts, _ = assets.template_mesh()
    return build_graph_context(
        assets.load_pyramid("for_demo"), assets.load_pyramid("ds2"),
        assets.smpl_edges(), verts,
    )


@pytest.fixture(scope="session")
def small_mesh():
    """A small closed mesh (258-vert icosphere) for fast topology/qslim tests."""
    from cape_tpu.meshops.toy import icosphere

    return icosphere(3)
