"""Native C++ BVH tests (skipped when no toolchain is available)."""

import numpy as np
import pytest

from cape_tpu.meshops.toy import icosphere
from cape_tpu.meshops.transfer import _nearest_numpy

native = pytest.importorskip("cape_tpu.meshops.native_aabb")


def _try_native():
    try:
        native._load()
        return True
    except ImportError:
        return False


pytestmark = pytest.mark.skipif(not _try_native(), reason="native build unavailable")


def test_native_matches_numpy_backend():
    verts, faces = icosphere(3)
    rng = np.random.default_rng(0)
    q = rng.standard_normal((400, 3)) * 0.8
    f_n, b_n = native.nearest_triangles(verts, faces, q)
    f_p, b_p = _nearest_numpy(q, verts, faces)

    def closest(f, b):
        return np.einsum("qk,qkc->qc", b, verts[faces[f]])

    d = np.linalg.norm(closest(f_n, b_n) - closest(f_p, b_p), axis=1)
    assert d.max() < 1e-9


def test_native_barycentric_validity():
    verts, faces = icosphere(2)
    q = np.random.default_rng(1).standard_normal((100, 3))
    f, b = native.nearest_triangles(verts, faces, q)
    assert f.min() >= 0 and f.max() < len(faces)
    np.testing.assert_allclose(b.sum(axis=1), 1.0, atol=1e-9)
    assert b.min() >= -1e-9


def test_native_on_smpl_template(template):
    verts, faces = template
    # template vertices are their own nearest points with bary ~ one-hot
    f, b = native.nearest_triangles(verts, faces, verts[:100])
    rec = np.einsum("qk,qkc->qc", b, verts[faces[f]])
    np.testing.assert_allclose(rec, verts[:100], atol=1e-9)
