"""On-device op tests against scipy/numpy oracles (SURVEY §4 implication 2)."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np
import scipy.sparse as sp

from cape_tpu.meshops import assets
from cape_tpu.meshops.laplacian import scaled_adjacency
from cape_tpu.ops.cheb import cheb_conv
from cape_tpu.ops.norm import group_norm
from cape_tpu.ops.sparse import (
    DenseOp,
    IdentityOp,
    dense_from_scipy,
    ell_from_scipy,
    make_op,
)


def _random_sparse(rows, cols, density, seed):
    rng = np.random.default_rng(seed)
    m = sp.random(rows, cols, density=density, random_state=np.random.RandomState(seed))
    return sp.csr_matrix(m)


def test_ell_matches_scipy():
    m = _random_sparse(50, 40, 0.1, 0)
    op = ell_from_scipy(m)
    x = np.random.default_rng(1).standard_normal((3, 40, 7)).astype(np.float32)
    got = np.asarray(op(jnp.asarray(x)))
    want = np.einsum("rc,bcf->brf", m.toarray(), x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ell_selection_fast_path():
    # a pure selection matrix collapses to a gather
    sel = sp.csr_matrix(
        (np.ones(3), (np.arange(3), [5, 2, 7])), shape=(3, 10)
    )
    op = ell_from_scipy(sel)
    assert op.select
    x = np.arange(10 * 2, dtype=np.float32).reshape(1, 10, 2)
    got = np.asarray(op(jnp.asarray(x)))
    np.testing.assert_array_equal(got, x[:, [5, 2, 7]])


def test_dense_matches_ell():
    m = _random_sparse(30, 30, 0.2, 2)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 30, 5)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ell_from_scipy(m)(x)),
        np.asarray(dense_from_scipy(m)(x)),
        rtol=1e-5, atol=1e-5,
    )


def test_make_op_detects_identity():
    assert isinstance(make_op(sp.identity(8, format="csr")), IdentityOp)
    assert not isinstance(make_op(_random_sparse(8, 8, 0.3, 4)), IdentityOp)
    assert isinstance(make_op(sp.identity(8, format="csr"), mode="dense"), DenseOp)


def test_cheb_conv_matches_reference_formulation(template):
    """Our accumulate-per-order conv == the reference's concat-then-matmul
    (lib/models.py:69-103) on the real SMPL Laplacian."""
    verts, faces = template
    from cape_tpu.meshops.topology import vert_connectivity

    A = vert_connectivity(faces, len(verts))
    Lt = scaled_adjacency(A)                       # rescaled Laplacian
    lap = ell_from_scipy(Lt)

    rng = np.random.default_rng(5)
    B, V, Fin, Fout, K = 2, len(verts), 3, 4, 3
    x = rng.standard_normal((B, V, Fin)).astype(np.float32)
    W = rng.standard_normal((K, Fin, Fout)).astype(np.float32) * 0.1

    got = np.asarray(cheb_conv(jnp.asarray(x), lap, jnp.asarray(W)))

    # numpy oracle: the reference's basis construction
    Ld = Lt.toarray()
    x0 = x
    x1 = np.einsum("vu,buf->bvf", Ld, x0)
    x2 = 2 * np.einsum("vu,buf->bvf", Ld, x1) - x0
    want = (
        np.einsum("bvf,fo->bvo", x0, W[0])
        + np.einsum("bvf,fo->bvo", x1, W[1])
        + np.einsum("bvf,fo->bvo", x2, W[2])
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_banded_apply_bm_matches_xla(small_mesh):
    """Pallas v4 batch-major window apply (interpret mode on CPU) ==
    the production XLA banded apply on a toy pyramid level."""
    from cape_tpu.meshops.pyramid import build_pyramid
    from cape_tpu.meshops.topology import vertices_per_edge
    from cape_tpu.ops.pallas.cheb_kernel import banded_apply_bm
    from cape_tpu.ops.sparse import build_graph_context

    verts, faces = small_mesh
    pyr = build_pyramid(verts, faces, [1, 2, 1, 2, 1, 2, 1, 1])
    ctx = build_graph_context(
        pyr, build_pyramid(verts, faces, [2, 2, 2, 2]),
        vertices_per_edge(faces, len(verts)), verts,
    )
    lap = ctx.lap[0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, lap.n_rows, 8)), jnp.float32)
    ref = np.asarray(lap(x))
    got = np.asarray(
        banded_apply_bm(x, lap.blocks, lap.pad_left, lap.pad_right, lap.n_rows)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_cheb_conv_projfirst_matches_accumulation(template):
    """Fout < Fin routes to the Clenshaw project-first ordering
    (ops/cheb.py _cheb_conv_projfirst); it must agree with the
    accumulate-per-order form in value AND gradient, K=2 and K=3."""
    from cape_tpu.ops.cheb import _cheb_conv_projfirst, cheb_basis

    verts, faces = template
    from cape_tpu.meshops.topology import vert_connectivity

    A = vert_connectivity(faces, len(verts))
    lap = ell_from_scipy(scaled_adjacency(A))

    rng = np.random.default_rng(6)
    B, V, Fin, Fout = 2, len(verts), 8, 3
    x = jnp.asarray(rng.standard_normal((B, V, Fin)).astype(np.float32))
    for K in (2, 3):
        W = jnp.asarray(
            rng.standard_normal((K, Fin, Fout)).astype(np.float32) * 0.1
        )

        def acc(x, W):
            return sum(
                jnp.einsum("bvi,io->bvo", xk, W[k])
                for k, xk in enumerate(cheb_basis(x, lap, K))
            )

        want = np.asarray(acc(x, W))
        # the public entry routes here on Fout < Fin
        got = np.asarray(cheb_conv(x, lap, W))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        got2 = np.asarray(_cheb_conv_projfirst(x, lap, W))
        np.testing.assert_allclose(got2, want, rtol=1e-4, atol=1e-5)

        g_want = jax.grad(lambda x, W: jnp.sum(jnp.sin(acc(x, W))), argnums=(0, 1))(x, W)
        g_got = jax.grad(
            lambda x, W: jnp.sum(jnp.sin(_cheb_conv_projfirst(x, lap, W))),
            argnums=(0, 1),
        )(x, W)
        for a, b in zip(g_want, g_got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_group_norm_matches_oracle():
    rng = np.random.default_rng(7)
    B, V, C, G = 2, 11, 8, 4
    x = rng.standard_normal((B, V, C)).astype(np.float32)
    gamma = rng.standard_normal(C).astype(np.float32)
    beta = rng.standard_normal(C).astype(np.float32)
    got = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), num_groups=G))

    # oracle following the reference layout (lib/models.py:693-709)
    xt = np.transpose(x, (0, 2, 1)).reshape(B, G, C // G, V)
    mean = xt.mean(axis=(2, 3), keepdims=True)
    var = xt.var(axis=(2, 3), keepdims=True)
    xn = (xt - mean) / np.sqrt(var + 1e-5)
    out = xn.reshape(B, C, V) * gamma[None, :, None] + beta[None, :, None]
    want = np.transpose(out, (0, 2, 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_shipped_laplacian_is_negated_adjacency():
    pyr = assets.load_pyramid("ds2")
    Lt = pyr.scaled_laplacians()[0]
    A = sp.csr_matrix(pyr.adjacencies[0])
    # sparsity pattern identical to adjacency, all entries negative
    assert (abs(Lt) > 0).sum() == A.nnz
    assert Lt.data.max() < 0


def test_ell_custom_vjp_matches_dense_grad():
    """The transpose-ELL backward must equal the dense matmul gradient."""
    import jax

    m = _random_sparse(40, 30, 0.15, 11)
    ell = ell_from_scipy(m)
    dense = dense_from_scipy(m)
    x = jnp.asarray(np.random.default_rng(12).standard_normal((2, 30, 5)), jnp.float32)

    def loss_e(x):
        return jnp.sum(jnp.sin(ell(x)))

    def loss_d(x):
        return jnp.sum(jnp.sin(dense(x)))

    ge = jax.grad(loss_e)(x)
    gd = jax.grad(loss_d)(x)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(gd), rtol=1e-4, atol=1e-5)


def test_ell_selection_custom_vjp_grad():
    import jax

    sel = sp.csr_matrix((np.ones(3), (np.arange(3), [5, 2, 7])), shape=(3, 10))
    ell = ell_from_scipy(sel)
    assert ell.select
    dense = dense_from_scipy(sel)
    x = jnp.asarray(np.random.default_rng(13).standard_normal((1, 10, 4)), jnp.float32)
    ge = jax.grad(lambda x: jnp.sum(ell(x) ** 2))(x)
    gd = jax.grad(lambda x: jnp.sum(dense(x) ** 2))(x)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(gd), rtol=1e-4, atol=1e-5)


def test_ell_transpose_packing_symmetric_laplacian(template):
    """Symmetric matrices pack to identical forward and transpose gathers."""
    verts, faces = template
    from cape_tpu.meshops.topology import vert_connectivity

    Lt = scaled_adjacency(vert_connectivity(faces, len(verts)))
    op = ell_from_scipy(Lt)
    np.testing.assert_array_equal(np.asarray(op.idx), np.asarray(op.t_idx))
    np.testing.assert_allclose(np.asarray(op.val), np.asarray(op.t_val), atol=1e-7)


def test_banded_matches_ell_on_permuted_pyramid():
    """BandedOp == EllOp on the RCM-permuted pyramid (values and grads)."""
    import jax

    from cape_tpu.meshops.ordering import permute_pyramid, pyramid_orderings
    from cape_tpu.ops.banded import banded_from_scipy

    pyr = assets.load_pyramid("ds2")
    perms = pyramid_orderings(pyr)
    ppyr = permute_pyramid(pyr, perms)
    for m in [ppyr.scaled_laplacians()[0], ppyr.downsamples[0], ppyr.upsamples[1]]:
        m = sp.csr_matrix(m)
        band = banded_from_scipy(m)
        ell = ell_from_scipy(m)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, m.shape[1], 4)), jnp.float32
        )
        np.testing.assert_allclose(
            np.asarray(band(x)), np.asarray(ell(x)), rtol=1e-4, atol=1e-5
        )
        gb = jax.grad(lambda x: jnp.sum(jnp.sin(band(x))))(x)
        ge = jax.grad(lambda x: jnp.sum(jnp.sin(ell(x))))(x)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ge), rtol=1e-4, atol=1e-5)


def test_normals_and_normal_losses(small_mesh):
    from cape_tpu import losses as L
    from cape_tpu.meshops.normals import face_normals, vertex_normals

    verts, faces = small_mesh
    v = jnp.asarray(verts, jnp.float32)[None]
    fn = np.asarray(face_normals(v, jnp.asarray(faces)))[0]
    # sphere face normals point outward: positive dot with centroid dir
    centroids = verts[faces].mean(axis=1)
    dots = np.einsum("fc,fc->f", fn, centroids / np.linalg.norm(centroids, axis=1, keepdims=True))
    assert (dots > 0.5).all()
    vn = np.asarray(vertex_normals(v, jnp.asarray(faces)))[0]
    # vertex normals on a unit sphere approximate the vertex directions
    cos = np.einsum("vc,vc->v", vn, verts)
    assert cos.min() > 0.9
    # identical meshes have zero normal loss
    assert float(L.face_normal_loss(v, v, jnp.asarray(faces))) < 1e-6
    assert float(L.vertex_normal_loss(v, v, jnp.asarray(faces))) < 1e-6
    # perturbed meshes have positive loss
    v2 = v + 0.05 * jnp.asarray(np.random.default_rng(0).standard_normal(v.shape), jnp.float32)
    assert float(L.face_normal_loss(v2, v, jnp.asarray(faces))) > 1e-4


def test_pallas_cheb_kernel_matches_xla(small_mesh):
    """Fused Pallas K=2 cheb conv (interpret mode on CPU) == XLA path."""
    import jax

    from cape_tpu.meshops.laplacian import scaled_adjacency
    from cape_tpu.meshops.ordering import pyramid_orderings
    from cape_tpu.meshops.topology import vert_connectivity
    from cape_tpu.ops import pallas as pcfg
    from cape_tpu.ops.banded import banded_from_scipy
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    verts, faces = small_mesh
    A = vert_connectivity(faces, len(verts))
    perm = np.asarray(reverse_cuthill_mckee(sp.csr_matrix(A), symmetric_mode=True))
    Lt = sp.csr_matrix(scaled_adjacency(A))[perm][:, perm]
    op = banded_from_scipy(Lt)
    assert op.pallas_eligible

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, Lt.shape[0], 6)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((2, 6, 4)).astype(np.float32) * 0.1)

    def loss(x, W):
        return jnp.sum(jnp.sin(cheb_conv(x, op, W)))

    was = pcfg.enabled()
    try:
        pcfg.set_enabled(False)
        ref, (gx_ref, gw_ref) = loss(x, W), jax.grad(loss, argnums=(0, 1))(x, W)
        pcfg.set_enabled(True)
        out, (gx, gw) = loss(x, W), jax.grad(loss, argnums=(0, 1))(x, W)
    finally:
        pcfg.set_enabled(was)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), rtol=1e-4, atol=1e-4)


def test_pallas_cheb_v3_large_batch_matches_xla(small_mesh):
    """The auto-selected large-batch vertex-major path (cheb.VM_MIN_COLS)
    must match the batch-major XLA path, values and both gradients."""
    import jax

    from cape_tpu.meshops.laplacian import scaled_adjacency
    from cape_tpu.meshops.topology import vert_connectivity
    from cape_tpu.ops import cheb as cheb_mod
    from cape_tpu.ops.banded import banded_from_scipy
    from cape_tpu.ops.pallas.cheb_kernel import cheb2_banded_pallas_v3
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    verts, faces = small_mesh
    A = vert_connectivity(faces, len(verts))
    perm = np.asarray(reverse_cuthill_mckee(sp.csr_matrix(A), symmetric_mode=True))
    Lt = sp.csr_matrix(scaled_adjacency(A))[perm][:, perm]
    op = banded_from_scipy(Lt)
    assert op.pallas_eligible

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((3, Lt.shape[0], 5)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((2, 5, 4)).astype(np.float32) * 0.1)

    def loss_ref(x, W):
        return jnp.sum(jnp.sin(cheb_conv(x, op, W)))

    def loss_v3(x, W):
        return jnp.sum(jnp.sin(cheb2_banded_pallas_v3(x, op, W)))

    ref, (gx_ref, gw_ref) = loss_ref(x, W), jax.grad(loss_ref, argnums=(0, 1))(x, W)
    out, (gx, gw) = loss_v3(x, W), jax.grad(loss_v3, argnums=(0, 1))(x, W)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), rtol=1e-4, atol=1e-4)

    # the dispatcher routes to v3 exactly at the thresholds (both gates:
    # min batch and min merged columns)
    calls = []
    B, C = x.shape[0], x.shape[2]
    orig = (cheb_mod.VM_MIN_COLS, cheb_mod.VM_MIN_BATCH)
    import cape_tpu.ops.pallas.cheb_kernel as ck

    real_v3 = ck.cheb2_banded_pallas_v3
    try:
        cheb_mod.VM_MIN_COLS = B * C
        cheb_mod.VM_MIN_BATCH = B
        ck.cheb2_banded_pallas_v3 = lambda *a: (calls.append(1), real_v3(*a))[1]
        cheb_conv(x, op, W)
        assert calls, "v3 not selected at thresholds"
        for narrow in ({"VM_MIN_COLS": B * C + 1}, {"VM_MIN_BATCH": B + 1}):
            for k, v in narrow.items():
                setattr(cheb_mod, k, v)
            calls.clear()
            cheb_conv(x, op, W)
            assert not calls, f"v3 selected despite {narrow}"
            cheb_mod.VM_MIN_COLS, cheb_mod.VM_MIN_BATCH = B * C, B
    finally:
        cheb_mod.VM_MIN_COLS, cheb_mod.VM_MIN_BATCH = orig
        ck.cheb2_banded_pallas_v3 = real_v3


def test_batch_norm_and_dispatcher():
    from cape_tpu.ops.norm import batch_norm, normalize

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((4, 10, 6)) * 3 + 1, jnp.float32)
    gamma = jnp.ones(6)
    beta = jnp.zeros(6)
    out = np.asarray(batch_norm(x, gamma, beta))
    np.testing.assert_allclose(out.mean(axis=(0, 1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=(0, 1)), 1.0, atol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(normalize(x, gamma, beta, kind="none")), np.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(normalize(x, gamma, beta, kind="batch")), out, atol=1e-6
    )


def test_b2relu_vertex_bias():
    from cape_tpu.core.params import b2relu, vertex_bias

    b = vertex_bias(5, 3)
    assert b.shape == (5, 3) and float(b[0, 0]) == pytest.approx(0.1)
    x = jnp.asarray(np.full((2, 5, 3), -0.05), jnp.float32)
    out = np.asarray(b2relu(x, b))
    np.testing.assert_allclose(out, 0.05, atol=1e-7)



def test_banded_padded_matches_natural(small_mesh):
    """Persistent-padded BandedOp apply == natural apply in value AND VJP,
    on every operator shape class of a real pyramid (square Laplacians,
    rectangular down/up). Tail input rows are garbage by contract and must
    not affect the output; tail input cotangents must come back zero."""
    from cape_tpu.meshops.pyramid import build_pyramid
    from cape_tpu.meshops.topology import vertices_per_edge
    from cape_tpu.ops.banded import BandedOp, padded_size
    from cape_tpu.ops.sparse import build_graph_context

    verts, faces = small_mesh
    pyr = build_pyramid(verts, faces, [1, 2, 1, 2, 1, 2, 1, 1])
    ctx = build_graph_context(
        pyr, build_pyramid(verts, faces, [2, 2, 2, 2]),
        vertices_per_edge(faces, len(verts)), verts,
    )
    rng = np.random.default_rng(0)
    ops = (
        list(ctx.lap) + list(ctx.down) + list(ctx.up)
        + list(ctx.lap_d) + list(ctx.down_d) + [ctx.edge_op]
    )
    tested = 0
    for op in ops:
        if not isinstance(op, BandedOp):
            continue
        tested += 1
        opp = op.replace(padded=True)
        P_in, P_out = opp.p_cols, opp.p_rows
        assert P_in == padded_size(op.n_cols) and P_out == padded_size(op.n_rows)

        x = jnp.asarray(rng.standard_normal((2, op.n_cols, 5)), jnp.float32)
        garbage = jnp.asarray(
            rng.standard_normal((2, P_in - op.n_cols, 5)) * 50.0, jnp.float32
        )
        xp = jnp.concatenate([x, garbage], axis=1)

        y = np.asarray(op(x))
        yp = np.asarray(opp(xp))
        assert yp.shape == (2, P_out, 5)
        np.testing.assert_array_equal(yp[:, : op.n_rows], y)      # bit-exact
        np.testing.assert_array_equal(yp[:, op.n_rows :], 0.0)    # zero tail

        g_nat = jax.grad(lambda v: jnp.sum(op(v) ** 2))(x)
        g_pad = jax.grad(lambda v: jnp.sum((opp(v)[:, : op.n_rows]) ** 2))(xp)
        np.testing.assert_allclose(
            np.asarray(g_pad[:, : op.n_cols]), np.asarray(g_nat),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_array_equal(np.asarray(g_pad[:, op.n_cols :]), 0.0)
    assert tested >= 8  # laps + non-identity down/up of both pyramids


def test_group_norm_masked_stats_match_natural():
    """group_norm(n_valid=V) over a padded tensor == group_norm over the
    natural rows, regardless of tail garbage; batch_norm likewise."""
    from cape_tpu.ops.norm import batch_norm, group_norm

    rng = np.random.default_rng(4)
    V, P, C = 37, 64, 8
    x = jnp.asarray(rng.standard_normal((3, V, C)), jnp.float32)
    tail = jnp.asarray(rng.standard_normal((3, P - V, C)) * 100.0, jnp.float32)
    xp = jnp.concatenate([x, tail], axis=1)
    gamma = jnp.asarray(rng.standard_normal(C), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(C), jnp.float32)

    want = np.asarray(group_norm(x, gamma, beta, num_groups=4))
    got = np.asarray(group_norm(xp, gamma, beta, num_groups=4, n_valid=V))
    np.testing.assert_allclose(got[:, :V], want, rtol=1e-4, atol=1e-5)

    want_b = np.asarray(batch_norm(x, gamma, beta))
    got_b = np.asarray(batch_norm(xp, gamma, beta, n_valid=V))
    np.testing.assert_allclose(got_b[:, :V], want_b, rtol=1e-4, atol=1e-5)


def test_use_pallas_false_forces_xla_path(small_mesh):
    """allow_pallas=False (cfg.use_pallas) and the CAPE_TPU_PALLAS=0 kill
    switch must both bypass the auto-selected v3 kernel."""
    import os

    import cape_tpu.ops.cheb as cheb_mod
    import cape_tpu.ops.pallas.cheb_kernel as ck
    from cape_tpu.meshops.pyramid import build_pyramid
    from cape_tpu.meshops.topology import vertices_per_edge
    from cape_tpu.ops.sparse import build_graph_context

    verts, faces = small_mesh
    pyr = build_pyramid(verts, faces, [1, 2, 1, 2, 1, 2, 1, 1])
    ctx = build_graph_context(
        pyr, build_pyramid(verts, faces, [2, 2, 2, 2]),
        vertices_per_edge(faces, len(verts)), verts, use_pallas=False,
    )
    op = ctx.lap[0]
    assert not op.allow_pallas
    B, C = 64, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, op.n_rows, C)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((2, C, C)) * 0.1, jnp.float32)

    calls = []
    real_v3 = ck.cheb2_banded_pallas_v3
    ck.cheb2_banded_pallas_v3 = lambda *a, **k: calls.append(1) or real_v3(*a, **k)
    orig = (cheb_mod.VM_MIN_COLS, cheb_mod.VM_MIN_BATCH)
    try:
        cheb_mod.VM_MIN_COLS, cheb_mod.VM_MIN_BATCH = B * C, B
        from cape_tpu.ops.cheb import cheb_conv

        cheb_conv(x, op, W)                       # allow_pallas=False
        assert not calls, "v3 selected despite use_pallas=False"

        op_on = op.replace(allow_pallas=True)
        cheb_conv(x, op_on, W)
        assert calls, "v3 not selected with allow_pallas=True at thresholds"

        calls.clear()
        os.environ["CAPE_TPU_PALLAS"] = "0"       # global kill switch
        try:
            cheb_conv(x, op_on, W)
            assert not calls, "v3 selected despite CAPE_TPU_PALLAS=0"
        finally:
            del os.environ["CAPE_TPU_PALLAS"]

        calls.clear()
        os.environ["CAPE_TPU_PALLAS"] = "1"       # force-on overrides config
        try:
            cheb_conv(x, op, W)                   # allow_pallas=False
            assert calls, "CAPE_TPU_PALLAS=1 did not override use_pallas=False"
        finally:
            del os.environ["CAPE_TPU_PALLAS"]
    finally:
        cheb_mod.VM_MIN_COLS, cheb_mod.VM_MIN_BATCH = orig
        ck.cheb2_banded_pallas_v3 = real_v3


@pytest.mark.slow  # retired kernels, never routed in production; ~50s of
# interpret-mode compile on this box — parity stays covered in the full suite
@pytest.mark.parametrize("kernel", ["v5", "v6", "v7"])
def test_pallas_whole_conv_kernels_match_xla(small_mesh, kernel):
    """The whole-conv fusion kernels (retired measured baselines, PERF.md
    'the question is CLOSED': v5 merged-sample lanes + block-diagonal
    projections, v6 rolling circular buffer, v7 supertile rolling buffer;
    interpret mode on CPU) == the XLA path, natural AND padded layouts,
    values and both gradients — including a batch not divisible by v5's
    lane-merge group (group fallback) and C != F."""
    import jax

    from cape_tpu.meshops.pyramid import build_pyramid
    from cape_tpu.meshops.topology import vertices_per_edge
    from cape_tpu.ops.cheb import cheb_conv
    from cape_tpu.ops.pallas import cheb_kernel as ck
    from cape_tpu.ops.sparse import build_graph_context

    fused = getattr(ck, f"cheb2_banded_pallas_{kernel}")
    verts, faces = small_mesh
    pyr = build_pyramid(verts, faces, [1, 2, 1, 2, 1, 2, 1, 1])
    pyr_d = build_pyramid(verts, faces, [2, 2, 2, 2])
    edges = vertices_per_edge(faces, len(verts))
    ctx_n = build_graph_context(pyr, pyr_d, edges, verts)
    ctx_p = build_graph_context(pyr, pyr_d, edges, verts, padded=True)
    op_n, op_p = ctx_n.lap[0], ctx_p.lap[0]

    rng = np.random.default_rng(11)
    for B, C, F in ((4, 16, 12), (2, 8, 8), (6, 8, 16)):
        x = jnp.asarray(rng.standard_normal((B, op_n.n_rows, C)), jnp.float32)
        W = jnp.asarray(rng.standard_normal((2, C, F)) * 0.1, jnp.float32)

        def loss_ref(x, W):
            return jnp.sum(
                jnp.sin(cheb_conv(x, op_n.replace(allow_pallas=False), W))
            )

        def loss_fused(x, W):
            return jnp.sum(jnp.sin(fused(x, op_n, W)))

        ref, (gx_ref, gw_ref) = loss_ref(x, W), jax.grad(loss_ref, (0, 1))(x, W)
        out, (gx, gw) = loss_fused(x, W), jax.grad(loss_fused, (0, 1))(x, W)
        np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(gw), np.asarray(gw_ref), rtol=1e-4, atol=1e-4
        )

        # padded layout: zero-padded input tails -> matching natural rows
        xp = jnp.pad(x, ((0, 0), (0, op_p.p_rows - op_n.n_rows), (0, 0)))
        got_p = np.asarray(fused(xp, op_p, W))
        want = np.asarray(cheb_conv(x, op_n.replace(allow_pallas=False), W))
        np.testing.assert_allclose(
            got_p[:, : op_n.n_rows], want, rtol=1e-5, atol=1e-5
        )


def test_pallas_v3_padded_matches_natural(small_mesh):
    """The large-batch v3 kernel under the persistent-padded layout ==
    the natural-layout conv (interpret mode on CPU), value and grads."""
    import cape_tpu.ops.cheb as cheb_mod
    from cape_tpu.meshops.pyramid import build_pyramid
    from cape_tpu.meshops.topology import vertices_per_edge
    from cape_tpu.ops.cheb import cheb_conv
    from cape_tpu.ops.sparse import build_graph_context

    verts, faces = small_mesh
    pyr = build_pyramid(verts, faces, [1, 2, 1, 2, 1, 2, 1, 1])
    pyr_d = build_pyramid(verts, faces, [2, 2, 2, 2])
    edges = vertices_per_edge(faces, len(verts))
    ctx_n = build_graph_context(pyr, pyr_d, edges, verts)
    ctx_p = build_graph_context(pyr, pyr_d, edges, verts, padded=True)
    op_n, op_p = ctx_n.lap[0], ctx_p.lap[0]

    B, C, F = 8, 16, 12
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((B, op_n.n_rows, C)), jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, op_p.p_rows - op_n.n_rows), (0, 0)))
    W = jnp.asarray(rng.standard_normal((2, C, F)) * 0.1, jnp.float32)

    orig = (cheb_mod.VM_MIN_COLS, cheb_mod.VM_MIN_BATCH)
    try:
        cheb_mod.VM_MIN_COLS, cheb_mod.VM_MIN_BATCH = B * C, B  # force v3
        want = np.asarray(cheb_conv(x, op_n.replace(allow_pallas=False), W))
        got = np.asarray(cheb_conv(xp, op_p, W))
        np.testing.assert_allclose(got[:, : op_n.n_rows], want, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(got[:, op_n.n_rows :], 0.0)

        g_nat = jax.grad(
            lambda w: jnp.sum(cheb_conv(x, op_n.replace(allow_pallas=False), w) ** 2)
        )(W)
        g_pad = jax.grad(
            lambda w: jnp.sum(cheb_conv(xp, op_p, w)[:, : op_n.n_rows] ** 2)
        )(W)
        np.testing.assert_allclose(
            np.asarray(g_pad), np.asarray(g_nat), rtol=1e-4, atol=1e-4
        )
    finally:
        cheb_mod.VM_MIN_COLS, cheb_mod.VM_MIN_BATCH = orig


def test_masked_norm_stats_nan_safe():
    """Tail rows may hold ARBITRARY values incl. inf/NaN (padded-op
    contract); masked statistics must not be poisoned by them."""
    from cape_tpu.ops.norm import batch_norm, group_norm

    rng = np.random.default_rng(2)
    V, P, C = 20, 32, 8
    x = jnp.asarray(rng.standard_normal((2, V, C)), jnp.float32)
    bad = jnp.full((2, P - V, C), jnp.nan, jnp.float32)
    bad = bad.at[0, 0, 0].set(jnp.inf)
    xp = jnp.concatenate([x, bad], axis=1)
    gamma = jnp.ones(C)
    beta = jnp.zeros(C)

    g = np.asarray(group_norm(xp, gamma, beta, num_groups=4, n_valid=V))
    want = np.asarray(group_norm(x, gamma, beta, num_groups=4))
    assert np.all(np.isfinite(g[:, :V]))
    np.testing.assert_allclose(g[:, :V], want, rtol=1e-4, atol=1e-5)

    b = np.asarray(batch_norm(xp, gamma, beta, n_valid=V))
    want_b = np.asarray(batch_norm(x, gamma, beta))
    assert np.all(np.isfinite(b[:, :V]))
    np.testing.assert_allclose(b[:, :V], want_b, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_lap_up_composite_matches_sequential(small_mesh):
    """ctx.lap_up[i] (precomposed L~@U) == lap[i] applied after up[i], in
    value and VJP, natural and padded; identity-upsample levels reuse the
    plain Laplacian op object."""
    from cape_tpu.meshops.pyramid import build_pyramid
    from cape_tpu.meshops.topology import vertices_per_edge
    from cape_tpu.ops.cheb import cheb_conv, cheb_conv_up
    from cape_tpu.ops.sparse import IdentityOp, build_graph_context

    verts, faces = small_mesh
    pyr = build_pyramid(verts, faces, [1, 2, 1, 2, 1, 2, 1, 1])
    pyr_d = build_pyramid(verts, faces, [2, 2, 2, 2])
    edges = vertices_per_edge(faces, len(verts))
    rng = np.random.default_rng(3)

    for padded in (False, True):
        ctx = build_graph_context(
            pyr, pyr_d, edges, verts, padded=padded, build_fused=True
        )
        assert len(ctx.lap_up) == len(ctx.up)
        fused_real = 0
        for lap, up, lap_up in zip(ctx.lap, ctx.up, ctx.lap_up):
            if isinstance(up, IdentityOp):
                assert lap_up is lap
                continue
            fused_real += 1
            n_in = up.p_cols if padded else up.n_cols
            x = jnp.asarray(rng.standard_normal((2, n_in, 6)), jnp.float32)
            np.testing.assert_allclose(
                np.asarray(lap_up(x)), np.asarray(lap(up(x))),
                rtol=1e-5, atol=1e-5,
            )
            g_seq = jax.grad(lambda v: jnp.sum(lap(up(v)) ** 2))(x)
            g_fus = jax.grad(lambda v: jnp.sum(lap_up(v) ** 2))(x)
            np.testing.assert_allclose(
                np.asarray(g_fus), np.asarray(g_seq), rtol=1e-4, atol=1e-5
            )

            # cheb_conv_up == up-then-cheb_conv for K=2 and K=1 weights
            for K in (1, 2):
                w = jnp.asarray(rng.standard_normal((K, 6, 4)) * 0.2, jnp.float32)
                ref = cheb_conv(up(x), lap, w)
                got = cheb_conv_up(x, up, lap_up, w)
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
                )
        assert fused_real >= 3


@pytest.mark.slow
def test_lap_up_not_built_by_default(small_mesh):
    """The composed L~@U operators cost ~40% more block data than U per
    level; the default (fuse_decoder=False) context must not build or hold
    them, and asking the model to fuse on such a context fails loudly."""
    import jax as _jax
    import pytest as _pytest

    from cape_tpu.core.config import CAPEConfig
    from cape_tpu.meshops.pyramid import build_pyramid
    from cape_tpu.meshops.topology import vertices_per_edge
    from cape_tpu.models.cape import CAPE
    from cape_tpu.ops.sparse import build_graph_context

    verts, faces = small_mesh
    pyr = build_pyramid(verts, faces, [1, 2, 1, 1])
    pyr_d = build_pyramid(verts, faces, [2, 2])
    edges = vertices_per_edge(faces, len(verts))
    ctx = build_graph_context(pyr, pyr_d, edges, verts)
    assert ctx.lap_up == ()

    cfg = CAPEConfig(
        num_conv_layers=4, nf=8, nz=6, nz_cond=5, nz_cond2=3,
        use_res_block_dec=True, affine=True, reduce_dim=0, batch_size=2,
        fuse_decoder=True,
    )
    model = CAPE(cfg)
    params = model.init_params(_jax.random.PRNGKey(0), ctx)
    z = jnp.zeros((2, cfg.z_total_dim))
    y = jnp.zeros((2, cfg.nz_cond))
    y2 = jnp.zeros((2, cfg.nz_cond2))
    with _pytest.raises(ValueError, match="build_fused"):
        model.decode(params, ctx, z, y, y2)
