"""TF-checkpoint converter tests: the scope mapping is validated by
synthesizing reference-named variables from a real param tree (inverse
mapping) and checking the converter reproduces the tree exactly."""

import jax
import numpy as np
import pytest

from cape_tpu.core.config import CAPEConfig
from cape_tpu.meshops import assets
from cape_tpu.models.cape import CAPE
from cape_tpu.ops.sparse import build_graph_context
from cape_tpu.tools.tf_ckpt_converter import cheb_to_ours, convert, verify_against_template


@pytest.fixture(scope="module")
def ctx():
    verts, _ = assets.template_mesh()
    return build_graph_context(
        assets.load_pyramid("for_demo"), assets.load_pyramid("ds2"),
        assets.smpl_edges(), verts,
    )


def ours_to_tf_cheb(w: np.ndarray) -> np.ndarray:
    """[K, Fin, Fout] -> reference flat [Fin*K, Fout] (row = fin*K + k)."""
    K, fin, fout = w.shape
    return np.ascontiguousarray(w.transpose(1, 0, 2).reshape(fin * K, fout))


def test_cheb_layout_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((3, 5, 7))
    np.testing.assert_array_equal(cheb_to_ours(ours_to_tf_cheb(w), 3), w)


def _synthesize_tfvars(params: dict, cfg: CAPEConfig) -> dict:
    """Inverse of the converter's mapping: our tree -> TF-named variables."""
    tf = {}
    tf["condition_pose/fc1/dense/kernel"] = params["cond_pose"]["fc1"]["kernel"]
    tf["condition_pose/fc1/dense/bias"] = params["cond_pose"]["fc1"]["bias"]
    tf["condition_pose/fc2/dense/kernel"] = params["cond_pose"]["fc2"]["kernel"]
    tf["condition_pose/fc2/dense/bias"] = params["cond_pose"]["fc2"]["bias"]
    tf["condition_clo_label/fc1/dense/kernel"] = params["cond_clo"]["fc1"]["kernel"]
    tf["condition_clo_label/fc1/dense/bias"] = params["cond_clo"]["fc1"]["bias"]

    enc = params["generator"]["encoder"]
    for i in range(cfg.num_conv_layers):
        s = f"generator/encoder/encoder_conv{i + 1}"
        tf[f"{s}/weights"] = ours_to_tf_cheb(np.asarray(enc[f"layer{i}"]["w"]))
        tf[f"{s}/bias"] = np.asarray(enc[f"layer{i}"]["b"]).reshape(1, 1, -1)
    tf["generator/encoder/1x1-conv/weights"] = ours_to_tf_cheb(np.asarray(enc["reduce"]["w"]))
    for head in ("fc_mean", "fc_var"):
        tf[f"generator/encoder/{head}/dense/kernel"] = enc[head]["kernel"]
        tf[f"generator/encoder/{head}/dense/bias"] = enc[head]["bias"]

    dec = params["generator"]["decoder"]
    tf["generator/decoder/fc1/dense/kernel"] = dec["fc1"]["kernel"]
    tf["generator/decoder/fc1/dense/bias"] = dec["fc1"]["bias"]
    tf["generator/decoder/1x1-conv/weights"] = ours_to_tf_cheb(np.asarray(dec["expand"]["w"]))
    for i in range(cfg.num_conv_layers):
        s = f"generator/decoder/decoder_resblock_affine{i + 1}"
        tf[f"{s}/graph_conv/weights"] = ours_to_tf_cheb(np.asarray(dec[f"layer{i}"]["conv"]["w"]))
        tf[f"{s}/affine/weights"] = ours_to_tf_cheb(np.asarray(dec[f"layer{i}"]["affine"]["w"]))
    tf["generator/decoder/outputs/weights"] = ours_to_tf_cheb(np.asarray(dec["out"]["w"]))
    tf["generator/decoder/outputs/bias"] = np.asarray(dec["out"]["b"])[None]

    disc = params["discriminator"]
    i = 0
    while f"layer{i}" in disc:
        s = f"discriminator/shared/conv{i + 1}"
        tf[f"{s}/weights"] = ours_to_tf_cheb(np.asarray(disc[f"layer{i}"]["w"]))
        tf[f"{s}/bias"] = np.asarray(disc[f"layer{i}"]["b"]).reshape(1, 1, -1)
        i += 1
    tf["discriminator/prediction_map/weights"] = ours_to_tf_cheb(np.asarray(disc["pred"]["w"]))
    return {k: np.asarray(v) for k, v in tf.items()}


def test_convert_roundtrip_flagship(ctx):
    cfg = CAPEConfig(
        nz=64, nz_cond=32, nz_cond2=32, use_res_block=False,
        use_res_block_dec=True, affine=True, reduce_dim=64,
    )
    model = CAPE(cfg)
    params = jax.device_get(model.init_params(jax.random.PRNGKey(0), ctx))
    tfvars = _synthesize_tfvars(params, cfg)
    converted = convert(tfvars, cfg)
    verify_against_template(converted, model, ctx)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(
        (jax.tree_util.keystr(p), l)
        for p, l in jax.tree_util.tree_flatten_with_path(converted)[0]
    )
    for path, leaf in flat_a:
        key = jax.tree_util.keystr(path)
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[key]), err_msg=key
        )


def test_convert_applies_vertex_perm_to_out_bias(ctx):
    """The reference stores the per-vertex decoder output bias in natural
    (template) vertex order; the banded runtime stores it RCM-permuted.
    convert(vertex_perm=...) must translate."""
    cfg = CAPEConfig(
        nz=64, nz_cond=32, nz_cond2=32, use_res_block=False,
        use_res_block_dec=True, affine=True, reduce_dim=64,
    )
    model = CAPE(cfg)
    params = jax.device_get(model.init_params(jax.random.PRNGKey(0), ctx))
    perm = np.asarray(ctx.vertex_perm)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))

    tfvars = _synthesize_tfvars(params, cfg)
    # rewrite the out bias into natural order (as a real TF ckpt stores it)
    dev_b = np.asarray(params["generator"]["decoder"]["out"]["b"])
    tfvars["generator/decoder/outputs/bias"] = dev_b[inv][None]

    converted = convert(tfvars, cfg, vertex_perm=perm)
    np.testing.assert_array_equal(
        np.asarray(converted["generator"]["decoder"]["out"]["b"]), dev_b
    )


@pytest.mark.slow
def test_converted_npz_drives_simple_demo_cli(ctx, tmp_path):
    """The reference's headline user journey (README.md:24-35): pretrained
    checkpoint -> demo. Fabricate a reference-named variable set for the
    flagship config, convert, write the .npz, and push it through the
    simple-demo CLI end to end."""
    from cape_tpu.apps import simple_demo
    from cape_tpu.core.config import load_config
    from cape_tpu.train.checkpoint import flatten_tree

    config_path = "configs/CAPE-affineconv_nz64_pose32_clotype32_male.yaml"
    cfg = load_config(config_path)
    model = CAPE(cfg)
    params = jax.device_get(model.init_params(jax.random.PRNGKey(1), ctx))
    perm = np.asarray(ctx.vertex_perm)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))

    tfvars = _synthesize_tfvars(params, cfg)
    tfvars["generator/decoder/outputs/bias"] = np.asarray(
        params["generator"]["decoder"]["out"]["b"]
    )[inv][None]
    converted = convert(tfvars, cfg, vertex_perm=perm)
    verify_against_template(converted, model, ctx)

    npz = str(tmp_path / "converted_params.npz")
    np.savez(npz, **flatten_tree(converted))

    simple_demo.main(
        ["--config", config_path, "--params", npz,
         "--results_dir", str(tmp_path / "demo_results")]
    )
    out_dir = tmp_path / "demo_results" / "sample_vary_clotype"
    objs = sorted(p.name for p in out_dir.glob("*.obj"))
    assert len(objs) == 12, objs          # 4 clotypes x 3 samples
    # exported meshes are finite and body-scaled
    from cape_tpu.meshops.obj_io import load_obj

    v, _ = load_obj(str(out_dir / objs[0]))
    assert np.all(np.isfinite(v)) and 0.1 < np.ptp(v) < 10.0
