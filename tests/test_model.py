"""Model-level tests: shapes, jit-ability, architecture parity facts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cape_tpu.core.config import CAPEConfig
from cape_tpu.meshops import assets
from cape_tpu.models.cape import CAPE, _cond_hidden_width
from cape_tpu.ops.sparse import build_graph_context


@pytest.fixture()
def ctx(flagship_ctx):
    """Alias of the session-scoped full-template context (conftest)."""
    return flagship_ctx


def _inputs(cfg, B, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.standard_normal((B, 6890, 3)), jnp.float32),
        jnp.asarray(rng.standard_normal((B, cfg.cond_dim)), jnp.float32),
        jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, B)]),
    )


CONFIGS = {
    "small_plain": CAPEConfig(
        nz=18, nz_cond=24, nz_cond2=8, use_res_block=False,
        use_res_block_dec=False, affine=False, reduce_dim=64, batch_size=2,
    ),
    "flagship_affine": CAPEConfig(
        nz=64, nz_cond=32, nz_cond2=32, use_res_block=False,
        use_res_block_dec=True, affine=True, reduce_dim=64, batch_size=2,
    ),
    "res_cmr": CAPEConfig(
        nz=18, nz_cond=24, nz_cond2=8, use_res_block=True,
        use_res_block_dec=True, affine=False, reduce_dim=4,
        cond_encoder=True, batch_size=2,
    ),
}


# full-template forward compiles are slow-tier on this 1-CPU box: wiring
# correctness is covered fast by tests/test_reference_parity (icosphere,
# eager), and the driver compile-checks the flagship entry() every round
@pytest.mark.slow
@pytest.mark.parametrize("name", list(CONFIGS))
def test_forward_shapes(ctx, name):
    cfg = CONFIGS[name]
    model = CAPE(cfg)
    params = model.init_params(jax.random.PRNGKey(0), ctx)
    x, pose, clo = _inputs(cfg, 2)

    y, y2 = model.embed_conditions(params, pose, clo)
    assert y.shape == (2, cfg.nz_cond) and y2.shape == (2, cfg.nz_cond2)

    @jax.jit
    def fwd(params, x, pose, clo, rng):
        y, y2 = model.embed_conditions(params, pose, clo)
        x_hat, z_mean, z_logvar, z = model.generate(params, ctx, x, y, y2, rng)
        d = model.discriminate(params, ctx, x_hat, y, y2)
        return x_hat, z_mean, z_logvar, d

    x_hat, z_mean, z_logvar, d = fwd(params, x, pose, clo, jax.random.PRNGKey(1))
    assert x_hat.shape == (2, 6890, 3)
    assert z_mean.shape == (2, cfg.nz) and z_logvar.shape == (2, cfg.nz)
    assert d.shape == (2, 431, 1)
    assert np.all(np.isfinite(np.asarray(x_hat)))


@pytest.mark.slow
def test_decode_deterministic(ctx):
    cfg = CONFIGS["flagship_affine"]
    model = CAPE(cfg)
    params = model.init_params(jax.random.PRNGKey(0), ctx)
    _, pose, clo = _inputs(cfg, 2)
    y, y2 = model.embed_conditions(params, pose, clo)
    z = jnp.asarray(np.random.default_rng(0).standard_normal((2, cfg.nz)), jnp.float32)
    zt = jnp.concatenate([z, y, y2], axis=-1)
    out1 = model.decode(params, ctx, zt, y, y2)
    out2 = model.decode(params, ctx, zt, y, y2)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_cond_hidden_width_heuristic():
    # reference lib/models.py:498-503
    assert _cond_hidden_width(126, 32) == 63    # nz < y//2
    assert _cond_hidden_width(126, 24) == 63
    assert _cond_hidden_width(8, 8) == 8        # y//2 <= nz < 2y
    assert _cond_hidden_width(4, 32) == 16      # nz >= 2y

def test_reparam_statistics():
    cfg = CONFIGS["small_plain"]
    model = CAPE(cfg)
    mean = jnp.ones((4096, cfg.nz)) * 2.0
    logvar = jnp.zeros((4096, cfg.nz))
    z = model.sample_z(jax.random.PRNGKey(0), mean, logvar)
    assert abs(float(jnp.mean(z)) - 2.0) < 0.05
    assert abs(float(jnp.std(z)) - 1.0) < 0.05


@pytest.mark.slow
def test_param_counts_scale_with_config(ctx):
    small = CAPE(CONFIGS["small_plain"])
    big = CAPE(CONFIGS["flagship_affine"])
    p_small = small.init_params(jax.random.PRNGKey(0), ctx)
    p_big = big.init_params(jax.random.PRNGKey(0), ctx)
    n = lambda p: sum(x.size for x in jax.tree_util.tree_leaves(p))
    assert n(p_big) > n(p_small)


@pytest.mark.slow
def test_condition_folding_is_exact(ctx):
    """Folded condition path == materialized concat path, same params."""
    for name, base in CONFIGS.items():
        cfg_fold = base.replace(fold_conditions=True)
        cfg_mat = base.replace(fold_conditions=False)
        m_fold, m_mat = CAPE(cfg_fold), CAPE(cfg_mat)
        params = m_mat.init_params(jax.random.PRNGKey(0), ctx)
        x, pose, clo = _inputs(base, 2, seed=42)
        y, y2 = m_mat.embed_conditions(params, pose, clo)
        z = jnp.asarray(np.random.default_rng(1).standard_normal((2, base.nz)), jnp.float32)
        zt = jnp.concatenate([z, y, y2], axis=-1)

        dec_a = np.asarray(m_fold.decode(params, ctx, zt, y, y2))
        dec_b = np.asarray(m_mat.decode(params, ctx, zt, y, y2))
        np.testing.assert_allclose(dec_a, dec_b, rtol=2e-4, atol=2e-5, err_msg=f"decode {name}")

        d_a = np.asarray(m_fold.discriminate(params, ctx, x, y, y2))
        d_b = np.asarray(m_mat.discriminate(params, ctx, x, y, y2))
        np.testing.assert_allclose(d_a, d_b, rtol=2e-4, atol=2e-5, err_msg=f"disc {name}")

        e_a = m_fold.encode(params, ctx, x, y, y2)
        e_b = m_mat.encode(params, ctx, x, y, y2)
        np.testing.assert_allclose(
            np.asarray(e_a[0]), np.asarray(e_b[0]), rtol=2e-4, atol=2e-5,
            err_msg=f"encode {name}",
        )


def test_flagship_architecture_facts(ctx):
    """Lock the documented architecture facts (SURVEY §2a) against
    refactors: channel plan, pyramid sizes, fc dims, param shapes."""
    cfg = CONFIGS["flagship_affine"]
    assert cfg.channels == [64, 64, 128, 128, 256, 256, 512, 512]
    assert cfg.ds_factors == [1, 2, 1, 2, 1, 2, 1, 1]
    assert cfg.reduce_rate == 8 and cfg.z_total_dim == 128
    assert ctx.level_sizes == (6890, 6890, 3445, 3445, 1723, 1723, 862, 862, 862)
    assert ctx.level_sizes_d == (6890, 3445, 1723, 862, 431)

    model = CAPE(cfg)
    # only shapes/sizes are asserted — eval_shape skips materializing the
    # ~17M params (20s of eager trunc-normal on this 1-CPU box)
    params = jax.eval_shape(model.init_params, jax.random.PRNGKey(0), ctx)
    enc = params["generator"]["encoder"]
    dec = params["generator"]["decoder"]
    disc = params["discriminator"]

    # encoder: conv0 has Fin=3 (cond_encoder off), K=2; reduce to 64 ch
    assert enc["layer0"]["w"].shape == (2, 3, 64)
    assert enc["layer7"]["w"].shape == (2, 512, 512)
    assert enc["reduce"]["w"].shape == (1, 512, 64)
    assert enc["fc_mean"]["kernel"].shape == (862 * 64, 64)

    # decoder: fc1 maps [z|y|y2] (128) to 862*64; expand back to 512
    assert dec["fc1"]["kernel"].shape == (128, 862 * 64)
    assert dec["expand"]["w"].shape == (1, 64, 512)
    # affine block 0: input 512 + 64 cond channels -> 256 (half of 512)
    assert dec["layer0"]["conv"]["w"].shape == (2, 576, 256)
    assert dec["layer0"]["affine"]["w"].shape == (1, 576, 256)
    # final conv: last block out (32) + 64 cond -> 3; per-vertex bias
    assert dec["out"]["w"].shape == (2, 96, 3)
    assert dec["out"]["b"].shape == (6890, 3)

    # discriminator: 4 Kd=3 blocks over ds2, input 3+64 cond channels;
    # final pred conv uses the VAE order K=2 (reference quirk kept)
    assert disc["layer0"]["w"].shape == (3, 67, 64)
    assert disc["layer3"]["w"].shape == (3, 128, 128)
    assert disc["pred"]["w"].shape == (2, 128, 1)

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert 15_000_000 < n_params < 20_000_000, n_params


# ---------------------------------------------------------------------------
# Persistent-padded vertex layout (ops.banded padded mode): the model must
# produce identical outputs AND parameter gradients with padded and natural
# GraphContexts, for every block family (plain, affine-folded, res+CMR+GN).
# ---------------------------------------------------------------------------

_SMALL_CONFIGS = {
    "plain": dict(
        nz=8, nz_cond=8, nz_cond2=4, nf=8, use_res_block=False,
        use_res_block_dec=False, affine=False, reduce_dim=8,
    ),
    "affine_folded": dict(
        nz=8, nz_cond=8, nz_cond2=4, nf=8, use_res_block=False,
        use_res_block_dec=True, affine=True, reduce_dim=8,
    ),
    # CMR group norms need every post-concat channel count divisible by
    # G=min(32, C) — true for the reference configs (channels and ncond are
    # multiples of 32); nf=32 keeps that property at test scale.
    "res_cmr": dict(
        nz=8, nz_cond=24, nz_cond2=8, nf=32, use_res_block=True,
        use_res_block_dec=True, affine=False, reduce_dim=32,
        cond_encoder=True,
    ),
}


@pytest.mark.slow
@pytest.mark.parametrize("name", list(_SMALL_CONFIGS))
def test_padded_layout_equivalence(small_mesh, name):
    from cape_tpu.meshops.pyramid import build_pyramid
    from cape_tpu.meshops.topology import vertices_per_edge
    from cape_tpu.train.step import _gan_losses

    verts, faces = small_mesh
    nv = len(verts)
    cfg = CAPEConfig(batch_size=2, **_SMALL_CONFIGS[name])
    pyr = build_pyramid(verts, faces, cfg.ds_factors)
    pyr_d = build_pyramid(verts, faces, [2, 2, 2, 2])
    edges = vertices_per_edge(faces, nv)
    ctx_n = build_graph_context(pyr, pyr_d, edges, verts)
    ctx_p = build_graph_context(pyr, pyr_d, edges, verts, padded=True)
    assert ctx_p.padded and not ctx_n.padded

    model = CAPE(cfg)
    params = model.init_params(jax.random.PRNGKey(0), ctx_n)
    rng = np.random.default_rng(3)
    B = cfg.batch_size
    batch = {
        "disp_g": jnp.asarray(rng.standard_normal((B, nv, 3)), jnp.float32),
        "pose_g": jnp.asarray(rng.standard_normal((B, cfg.cond_dim)), jnp.float32),
        "clo_g": jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, B)]),
        "disp_d": jnp.asarray(rng.standard_normal((B, nv, 3)), jnp.float32),
        "pose_d": jnp.asarray(rng.standard_normal((B, cfg.cond_dim)), jnp.float32),
        "clo_d": jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, B)]),
    }
    key = jax.random.PRNGKey(7)

    def run(ctx):
        def loss_fn(p):
            total, metrics = _gan_losses(model, cfg, p, ctx, batch, key)
            return total, metrics

        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return total, metrics, grads

    t_n, m_n, g_n = jax.jit(run)(ctx_n)
    t_p, m_p, g_p = jax.jit(run)(ctx_p)

    np.testing.assert_allclose(float(t_n), float(t_p), rtol=1e-5)
    for k in m_n:
        np.testing.assert_allclose(
            float(m_n[k]), float(m_p[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )
    flat_n = jax.tree_util.tree_leaves_with_path(g_n)
    flat_p = jax.tree_util.tree_leaves(g_p)
    assert len(flat_n) == len(flat_p)
    for (path, a), b in zip(flat_n, flat_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow
def test_padded_layout_forward_exact(small_mesh):
    """Forward decode/discriminate outputs are bit-close between layouts
    (the padded apply adds only exact-zero contributions)."""
    from cape_tpu.meshops.pyramid import build_pyramid
    from cape_tpu.meshops.topology import vertices_per_edge

    verts, faces = small_mesh
    nv = len(verts)
    cfg = CAPEConfig(batch_size=2, **_SMALL_CONFIGS["affine_folded"])
    pyr = build_pyramid(verts, faces, cfg.ds_factors)
    pyr_d = build_pyramid(verts, faces, [2, 2, 2, 2])
    edges = vertices_per_edge(faces, nv)
    ctx_n = build_graph_context(pyr, pyr_d, edges, verts)
    ctx_p = build_graph_context(pyr, pyr_d, edges, verts, padded=True)

    model = CAPE(cfg)
    params = model.init_params(jax.random.PRNGKey(1), ctx_n)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, nv, 3)), jnp.float32)
    pose = jnp.asarray(rng.standard_normal((2, cfg.cond_dim)), jnp.float32)
    clo = jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, 2)])
    key = jax.random.PRNGKey(2)

    def fwd(ctx):
        y, y2 = model.embed_conditions(params, pose, clo)
        x_hat, z_mean, z_logvar, _ = model.generate(params, ctx, x, y, y2, key)
        d = model.discriminate(params, ctx, x, y, y2)
        return x_hat, z_mean, z_logvar, d

    out_n = jax.jit(fwd)(ctx_n)
    out_p = jax.jit(fwd)(ctx_p)
    for a, b in zip(out_n, out_p):
        assert a.shape == b.shape                 # natural shapes at the API
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


@pytest.mark.parametrize(
    "name",
    [
        n if n == "flagship_affine" else pytest.param(n, marks=pytest.mark.slow)
        for n in CONFIGS
    ],
)
def test_summary_describe(ctx, name):
    """The architecture table's numbers match the real param pytree."""
    import re

    from cape_tpu.models.summary import describe

    cfg = CONFIGS[name]
    model = CAPE(cfg)
    # describe() only reads leaf shapes — eval_shape skips materializing
    # the flagship's ~17M params (~20s eager on this 1-CPU box)
    params = jax.eval_shape(model.init_params, jax.random.PRNGKey(0), ctx)
    text = describe(model, ctx, params)

    # static lines exist for every encoder/decoder/discriminator layer
    for i in range(cfg.num_conv_layers):
        assert f"encoder_layer{i}:" in text and f"decoder_layer{i}:" in text
    assert "discriminator_pred:" in text

    # printed fc shapes are the actual param shapes
    m = re.search(r"encoder_fc_mean: \((\d+), (\d+)\)", text)
    assert m is not None
    assert params["generator"]["encoder"]["fc_mean"]["kernel"].shape == (
        int(m.group(1)), int(m.group(2)))
    m = re.search(r"decoder_fc1: \((\d+), (\d+)\)", text)
    assert params["generator"]["decoder"]["fc1"]["kernel"].shape == (
        int(m.group(1)), int(m.group(2)))

    # printed parameter totals are exact leaf-size sums
    m = re.search(r"total: ([\d,]+)", text)
    want = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    assert int(m.group(1).replace(",", "")) == want


@pytest.mark.slow
@pytest.mark.parametrize("name", ["small_plain", "flagship_affine"])
@pytest.mark.parametrize("padded", [False, True])
def test_fused_decoder_matches_unfused(name, padded):
    """cfg.fuse_decoder (precomposed L~@U decoder applies) is exact vs the
    unpool-then-conv path: decode values and parameter gradients agree on
    the udn (small_plain) and affine (flagship) folded paths, natural and
    padded layouts. Params are shared — fusion changes no layout."""
    pyr = assets.load_pyramid("for_demo")
    pyr_d = assets.load_pyramid("ds2")
    verts, _ = assets.template_mesh()
    ctx = build_graph_context(
        pyr, pyr_d, assets.smpl_edges(), verts, padded=padded, build_fused=True
    )
    cfg = CONFIGS[name]
    m_fused = CAPE(cfg.replace(fuse_decoder=True))
    m_plain = CAPE(cfg.replace(fuse_decoder=False))
    params = jax.device_get(m_plain.init_params(jax.random.PRNGKey(1), ctx))

    rng = np.random.default_rng(7)
    B = 2
    z_total = jnp.asarray(rng.standard_normal((B, cfg.z_total_dim)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, cfg.nz_cond)), jnp.float32)
    y2 = jnp.asarray(rng.standard_normal((B, cfg.nz_cond2)), jnp.float32)

    @jax.jit
    def dec_fused(params, ctx):
        return m_fused.decode(params, ctx, z_total, y, y2)

    @jax.jit
    def dec_plain(params, ctx):
        return m_plain.decode(params, ctx, z_total, y, y2)

    def close(a, b, tol, msg):
        # scale-aware: f32 through ~10 reassociated matmul layers; tiny
        # elements of large-dynamic-range tensors carry no relative meaning
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.max(np.abs(b)), 1e-6)
        err = np.max(np.abs(a - b)) / scale
        assert err <= tol, (msg, err, scale)

    out_f = dec_fused(params, ctx)
    out_p = dec_plain(params, ctx)
    assert out_f.shape == out_p.shape
    close(out_f, out_p, 1e-5, "decode output")

    gf = jax.jit(jax.grad(lambda p, c: jnp.sum(m_fused.decode(p, c, z_total, y, y2) ** 2)))(params, ctx)
    gp = jax.jit(jax.grad(lambda p, c: jnp.sum(m_plain.decode(p, c, z_total, y, y2) ** 2)))(params, ctx)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(gp))
    for path, leaf in flat_f:
        close(leaf, flat_p[path], 1e-4, str(path))
