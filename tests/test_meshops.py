"""Mesh-precompute layer tests, including golden checks against the
shipped reference transform matrices (SURVEY §4 implication 1)."""

import numpy as np
import pytest
import scipy.sparse as sp

from cape_tpu.meshops import assets
from cape_tpu.meshops.laplacian import (
    normalized_laplacian,
    rescale_laplacian,
    scaled_adjacency,
)
from cape_tpu.meshops.pyramid import build_pyramid
from cape_tpu.meshops.qslim import qslim_decimate, vertex_quadrics
from cape_tpu.meshops.topology import faces_by_vertex, vert_connectivity, vertices_per_edge
from cape_tpu.meshops.transfer import build_upsample_matrix, closest_point_on_triangles


def test_vert_connectivity_matches_shipped(template):
    verts, faces = template
    A = vert_connectivity(faces, len(verts))
    A_ref = sp.csr_matrix(assets.load_pyramid("for_demo").adjacencies[0])
    assert A.shape == A_ref.shape
    assert (A != A_ref).nnz == 0


def test_vertices_per_edge_matches_shipped(template):
    verts, faces = template
    e = vertices_per_edge(faces, len(verts))
    e_ref = np.sort(assets.smpl_edges(), axis=1)
    e_ref = np.unique(e_ref, axis=0)
    assert e.shape == e_ref.shape
    np.testing.assert_array_equal(e, e_ref)


def test_laplacian_properties(template):
    verts, faces = template
    A = vert_connectivity(faces, len(verts))
    L = normalized_laplacian(A)
    # symmetric, zero row sums in the unnormalized sense, diagonal of ones
    assert abs(L - L.T).max() < 1e-12
    np.testing.assert_allclose(L.diagonal(), 1.0)
    # rescaled equals the closed form -D^{-1/2} W D^{-1/2}
    Lr = rescale_laplacian(L, lmax=2.0)
    Ls = scaled_adjacency(A, lmax=2.0)
    assert abs(Lr - Ls).max() < 1e-12


def test_faces_by_vertex(small_mesh):
    verts, faces = small_mesh
    fbv = faces_by_vertex(faces, len(verts))
    assert fbv.shape == (len(verts), len(faces))
    # every face is incident to exactly 3 vertices
    np.testing.assert_array_equal(np.asarray(fbv.sum(axis=0)).ravel(), 3.0)


def test_vertex_quadrics_zero_on_plane():
    # all-planar mesh: quadric error of any point in the plane must be ~0
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], dtype=float)
    faces = np.array([[0, 1, 2], [1, 3, 2]])
    Qv = vertex_quadrics(verts, faces)
    p = np.array([0.3, 0.4, 0.0, 1.0])
    for q in Qv:
        assert abs(p @ q @ p) < 1e-12


def test_qslim_halves_vertex_count(small_mesh):
    verts, faces = small_mesh
    new_faces, D = qslim_decimate(verts, faces, factor=0.5)
    assert D.shape[1] == len(verts)
    assert D.shape[0] <= int(np.ceil(len(verts) * 0.5))
    # D is a pure selection: one unit entry per row
    assert np.allclose(D.data, 1.0)
    assert (np.diff(sp.csr_matrix(D).indptr) == 1).all()
    # faces index into the new vertex set
    assert new_faces.max() < D.shape[0]
    # decimated mesh still roughly covers the sphere
    new_v = D @ verts
    r = np.linalg.norm(new_v, axis=1)
    assert r.min() > 0.7 and r.max() < 1.3


def test_closest_point_on_triangles_regions():
    tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], dtype=float)[None]
    # interior projection
    d2, bary = closest_point_on_triangles(np.array([[0.2, 0.2, 1.0]]), tri)
    np.testing.assert_allclose(d2[0, 0], 1.0, atol=1e-12)
    np.testing.assert_allclose(bary[0, 0], [0.6, 0.2, 0.2], atol=1e-12)
    # vertex region
    d2, bary = closest_point_on_triangles(np.array([[-1.0, -1.0, 0.0]]), tri)
    np.testing.assert_allclose(bary[0, 0], [1, 0, 0], atol=1e-12)
    # edge region (midpoint of AB, below)
    d2, bary = closest_point_on_triangles(np.array([[0.5, -1.0, 0.0]]), tri)
    np.testing.assert_allclose(bary[0, 0], [0.5, 0.5, 0.0], atol=1e-12)
    np.testing.assert_allclose(d2[0, 0], 1.0, atol=1e-12)


def test_upsample_matrix_partition_of_unity(small_mesh):
    verts, faces = small_mesh
    new_faces, D = qslim_decimate(verts, faces, factor=0.5)
    coarse = D @ verts
    U = build_upsample_matrix(coarse, new_faces, verts)
    assert U.shape == (len(verts), len(coarse))
    # barycentric rows sum to 1
    np.testing.assert_allclose(np.asarray(U.sum(axis=1)).ravel(), 1.0, atol=1e-6)
    # upsampling the coarse verts approximately reconstructs the fine verts
    rec = U @ coarse
    err = np.linalg.norm(rec - verts, axis=1)
    assert np.median(err) < 0.05


def test_build_pyramid_shapes(small_mesh):
    verts, faces = small_mesh
    pyr = build_pyramid(verts, faces, factors=[1, 2, 2])
    assert pyr.num_levels == 4
    sizes = pyr.level_sizes
    assert sizes[0] == sizes[1] == len(verts)
    assert sizes[2] <= int(np.ceil(sizes[1] / 2)) + 1
    assert sizes[3] <= int(np.ceil(sizes[2] / 2)) + 1
    # identity levels produce identity transforms
    assert (pyr.downsamples[0] != sp.identity(len(verts))).nnz == 0
    # Laplacians have eigenvalue-rescaled range
    for L in pyr.scaled_laplacians():
        assert abs(L).max() <= 1.0 + 1e-9


def test_shipped_pyramid_level_sizes():
    pyr = assets.load_pyramid("for_demo")
    assert pyr.level_sizes == [6890, 6890, 3445, 3445, 1723, 1723, 862, 862, 862]
    pyr_d = assets.load_pyramid("ds2")
    assert pyr_d.level_sizes == [6890, 3445, 1723, 862, 431]


def test_build_pyramid_on_template_matches_shipped_sizes(template):
    """Our QSlim chain on the real SMPL template reproduces the shipped
    pyramid's level sizes exactly (6890,6890,3445,3445,1723,1723,862x3).
    Decimation ordering may differ from psbody's (heap tie-breaking), but
    the size contract — ceil(V/2) per factor-2 level — must hold."""
    verts, faces = template
    pyr = build_pyramid(verts, faces, [1, 2, 1, 2, 1, 2, 1, 1])
    assert pyr.level_sizes == assets.load_pyramid("for_demo").level_sizes
    # downsamples are selections, upsamples are barycentric
    for D in pyr.downsamples:
        assert np.allclose(sp.csr_matrix(D).data, 1.0)
    for U in pyr.upsamples:
        rowsums = np.asarray(sp.csr_matrix(U).sum(axis=1)).ravel()
        np.testing.assert_allclose(rowsums, 1.0, atol=1e-6)
