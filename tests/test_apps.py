"""App-layer tests: inference engine batching, demo suite, CLI config flow."""

import json
import os

import jax
import numpy as np
import pytest

from cape_tpu.apps.demos import DemoSuite, SimpleDemo
from cape_tpu.apps.inference import InferenceEngine
from cape_tpu.core.config import CAPEConfig, load_config
from cape_tpu.data.synthetic import synthetic_bodydata
from cape_tpu.meshops import assets
from cape_tpu.models.cape import CAPE
from cape_tpu.ops.sparse import build_graph_context


@pytest.fixture(scope="module")
def engine_parts(flagship_ctx):
    cfg = CAPEConfig(
        name="apps_test", nf=8, nz=18, nz_cond=24, nz_cond2=8,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=8, batch_size=4,
    )
    model = CAPE(cfg)
    params = model.init_params(jax.random.PRNGKey(0), flagship_ctx)
    return model, flagship_ctx, params


@pytest.fixture(scope="module")
def engine(engine_parts):
    model, ctx, params = engine_parts
    return InferenceEngine(model, ctx, params, batch_size=4)


@pytest.mark.slow
def test_mesh_parallel_engine_matches_single_device(engine_parts, engine):
    """Bulk inference sharded over the 8-device mesh returns the same
    values as the single-device engine (per-sample math is batch-
    independent); uneven row counts exercise the pad/shard path."""
    from cape_tpu.parallel.mesh import DataParallel

    model, ctx, params = engine_parts
    dp_engine = InferenceEngine(model, ctx, params, batch_size=1, dp=DataParallel())
    assert dp_engine.batch_size == 8  # 1 per device x 8 devices

    rng = np.random.default_rng(7)
    n = 11  # not a multiple of the global batch
    disp = rng.standard_normal((n, 6890, 3)).astype(np.float32) * 0.01
    pose = rng.standard_normal((n, 126)).astype(np.float32)
    clo = np.eye(4, dtype=np.float32)[rng.integers(0, 4, n)]

    zm_dp, zl_dp, y_dp, y2_dp = dp_engine.encode(disp, pose, clo)
    zm, zl, y, y2 = engine.encode(disp, pose, clo)
    np.testing.assert_allclose(zm_dp, zm, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(y_dp, y, rtol=1e-5, atol=1e-6)

    zt = np.concatenate([zm, y, y2], axis=-1)
    np.testing.assert_allclose(
        dp_engine.decode(zt, y, y2), engine.decode(zt, y, y2),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.slow
def test_encode_only_condition_handles_uneven_batches(engine):
    rng = np.random.default_rng(0)
    pose = rng.standard_normal((6, 126)).astype(np.float32)   # not divisible by 4
    clo = np.eye(4, dtype=np.float32)[rng.integers(0, 4, 6)]
    y, y2 = engine.encode_only_condition(pose, clo)
    assert y.shape == (6, 24) and y2.shape == (6, 8)
    # batching must not change values: compare vs single big batch
    y_1, _ = engine.encode_only_condition(pose[:1], clo[:1])
    np.testing.assert_allclose(y[:1], y_1, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_decode_broadcasts_single_condition(engine):
    rng = np.random.default_rng(1)
    nz = engine.model.cfg.nz
    z = rng.standard_normal((5, nz)).astype(np.float32)
    y = rng.standard_normal((1, 24)).astype(np.float32)
    y2 = rng.standard_normal((1, 8)).astype(np.float32)
    z_total = np.concatenate([z, np.repeat(y, 5, 0), np.repeat(y2, 5, 0)], axis=-1)
    out = engine.decode(z_total, y, y2)
    assert out.shape == (5, 6890, 3)
    assert np.all(np.isfinite(out))


@pytest.mark.slow
def test_autoencode_mean_vs_sample(engine):
    rng = np.random.default_rng(2)
    disp = rng.standard_normal((3, 6890, 3)).astype(np.float32)
    pose = rng.standard_normal((3, 126)).astype(np.float32)
    clo = np.eye(4, dtype=np.float32)[[0, 1, 2]]
    mean_out = engine.autoencode(disp, pose, clo, sample=False)
    # mean path is deterministic
    np.testing.assert_array_equal(mean_out, engine.autoencode(disp, pose, clo, sample=False))
    samp = engine.autoencode(disp, pose, clo, sample=True, rng=jax.random.PRNGKey(7))
    assert samp.shape == mean_out.shape


@pytest.fixture(scope="module")
def demo_suite(engine, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("results"))
    return DemoSuite(
        engine, name="apps_test", n_sample=2, save_objs=True,
        smpl_model_folder="/nonexistent", results_root=root, seed=0,
    )


@pytest.mark.slow
def test_demo_test_model_metric(demo_suite):
    data = synthetic_bodydata(n_train=24, n_test=6, num_verts=6890, n_val=4, seed=0)
    result = demo_suite.test_model(data)
    assert set(result) >= {"euclidean_mean_m", "euclidean_std_m", "euclidean_median_m"}
    assert np.isfinite(result["euclidean_mean_m"])
    assert os.path.exists(
        os.path.join(demo_suite.results_dir, "test_results_dataset_male_4clotypes.txt")
    )


@pytest.mark.slow
def test_sample_vary_clotype_exports_objs(demo_suite):
    out = demo_suite.sample_vary_clotype()
    assert out.shape == (4, 2, 6890, 3)          # 4 clotypes x n_sample
    obj_dir = os.path.join(demo_suite.results_dir, "sample_vary_clotype")
    objs = [f for f in os.listdir(obj_dir) if f.endswith(".obj")]
    assert len(objs) == 8


@pytest.mark.slow
def test_sample_vary_pose(demo_suite):
    out = demo_suite.sample_vary_pose()
    assert out.shape == (6, 2, 6890, 3)          # 6 demo poses x n_sample


@pytest.mark.slow
def test_sample_gmm_prior(demo_suite):
    out = demo_suite.sample_gmm_prior(n=3)       # nz=18 matches the asset
    assert out.shape == (3, 6890, 3)
    assert np.all(np.isfinite(out))


def test_config_presets_load():
    for preset in (
        "configs/CAPE-affineconv_nz64_pose32_clotype32_male.yaml",
        "configs/CAPE_nz18_pose24_clotype8_female.yaml",
        "configs/default_config.yaml",
        "configs/config.yaml",                # new-training template
    ):
        cfg = load_config(preset)
        assert cfg.num_conv_layers == 8
        assert len(cfg.channels) == 8
    cfg = load_config("configs/CAPE-affineconv_nz64_pose32_clotype32_male.yaml")
    assert cfg.nz == 64 and cfg.affine and not cfg.use_res_block
    assert cfg.reduce_rate == 8 and cfg.z_total_dim == 128


def test_obj_roundtrip(tmp_path):
    from cape_tpu.meshops.obj_io import load_obj, save_obj
    from cape_tpu.meshops.toy import icosphere

    verts, faces = icosphere(1)
    p = str(tmp_path / "m.obj")
    save_obj(p, verts, faces)
    v2, f2 = load_obj(p)
    np.testing.assert_allclose(v2, verts, atol=1e-7)
    np.testing.assert_array_equal(f2, faces)


@pytest.mark.slow
def test_banded_and_ell_modes_agree():
    """The permuted banded formulation and the natural-order ELL
    formulation produce identical results through the full inference
    engine (validates the whole reorder-at-IO-boundary machinery)."""
    cfg = CAPEConfig(
        name="mode_parity", nf=4, nz=8, nz_cond=8, nz_cond2=4,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=4, batch_size=2,
    )
    verts, _ = assets.template_mesh()
    pyr, pyr_d = assets.load_pyramid("for_demo"), assets.load_pyramid("ds2")
    edges = assets.smpl_edges()

    ctx_band = build_graph_context(pyr, pyr_d, edges, verts, mode="banded")
    ctx_ell = build_graph_context(pyr, pyr_d, edges, verts, mode="ell")
    assert ctx_band.vertex_perm is not None and ctx_ell.vertex_perm is None

    model = CAPE(cfg)
    # same params work in both modes except the per-vertex output bias,
    # which lives in vertex order: permute it for the banded context
    params_ell = jax.device_get(model.init_params(jax.random.PRNGKey(0), ctx_ell))
    import copy

    params_band = copy.deepcopy(params_ell)
    perm = ctx_band.vertex_perm
    params_band["generator"]["decoder"]["out"]["b"] = params_ell["generator"][
        "decoder"
    ]["out"]["b"][perm]

    rng = np.random.default_rng(7)
    disp = rng.standard_normal((3, 6890, 3)).astype(np.float32)
    pose = rng.standard_normal((3, 126)).astype(np.float32)
    clo = np.eye(4, dtype=np.float32)[[0, 1, 2]]

    eng_band = InferenceEngine(model, ctx_band, params_band, batch_size=2)
    eng_ell = InferenceEngine(model, ctx_ell, params_ell, batch_size=2)

    out_band = eng_band.autoencode(disp, pose, clo, sample=False)
    out_ell = eng_ell.autoencode(disp, pose, clo, sample=False)
    np.testing.assert_allclose(out_band, out_ell, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_sample_gmm_sweep(demo_suite):
    out = demo_suite.sample_gmm_sweep(n=1)
    assert out.shape == (6, 4, 1, 6890, 3)      # poses x clotypes x n
    assert np.all(np.isfinite(out))


def test_render_contact_sheet(small_mesh, tmp_path):
    """Offscreen renderer: an icosphere must produce a shaded foreground
    disk, not a blank or uniform image."""
    from PIL import Image

    from cape_tpu.meshops.render import contact_sheet, render_mesh

    verts, faces = small_mesh
    img = render_mesh(verts, faces, size=128)
    assert img.shape == (128, 128, 3) and img.dtype == np.uint8
    fg = img[..., 0] < 250
    assert 0.2 < fg.mean() < 0.9, f"foreground fraction {fg.mean()}"
    assert img[fg].std() > 5, "no shading variation"

    path = str(tmp_path / "sheet.png")
    contact_sheet(np.stack([verts, verts + 0.1]), faces, path, size=96)
    with Image.open(path) as sheet:
        assert sheet.size == (192, 96)


@pytest.mark.slow
def test_demo_vis_flag_writes_pngs(engine, tmp_path):
    """vis_demo wiring: DemoSuite(vis=True) emits a contact sheet and an
    interactive HTML viewer next to the .objs (replaces the reference
    MeshViewers path, demos.py:225-246)."""
    suite = DemoSuite(
        engine, name="vis_test", n_sample=2, save_objs=False, vis=True,
        smpl_model_folder="/nonexistent", results_root=str(tmp_path), seed=0,
    )
    suite.sample_vary_clotype()
    obj_dir = os.path.join(suite.results_dir, "sample_vary_clotype")
    pngs = [f for f in os.listdir(obj_dir) if f.endswith("_sheet.png")]
    assert len(pngs) == 4, pngs
    htmls = [f for f in os.listdir(obj_dir) if f.endswith("_viewer.html")]
    assert len(htmls) == 4, htmls
    objs = [f for f in os.listdir(obj_dir) if f.endswith(".obj")]
    assert objs == []                               # save_objs=False respected


def test_viewer_export_roundtrip(small_mesh, tmp_path):
    """export_html embeds the exact mesh bytes (base64), fills every
    template placeholder, and stays self-contained (no external URLs)."""
    import base64
    import re

    from cape_tpu.meshops.viewer import export_html

    verts, faces = small_mesh
    batch = np.stack([verts, verts * 1.5]).astype(np.float32)
    path = export_html(
        batch, faces, str(tmp_path / "v.html"), title="t", names=["a", "b"]
    )
    html = open(path).read()
    assert "__VERTS__" not in html and "__NV__" not in html and "__TITLE__" not in html
    assert re.search(r'https?://', html) is None, "viewer must be offline-capable"
    # decode the first embedded mesh back and compare bit-exactly
    m = re.search(r'const VB64 = (\[.*?\]);', html, re.S)
    verts_b64 = json.loads(m.group(1))
    assert len(verts_b64) == 2
    got = np.frombuffer(base64.b64decode(verts_b64[0]), "<f4").reshape(verts.shape)
    np.testing.assert_array_equal(got, batch[0])
    m = re.search(r'const FB64 = "([^"]*)";', html)
    got_f = np.frombuffer(base64.b64decode(m.group(1)), "<u4").reshape(-1, 3)
    np.testing.assert_array_equal(got_f, faces.astype(np.uint32))
    assert json.dumps(["a", "b"]) in html


def test_cli_can_disable_extension_bools():
    """The TPU-extension booleans must be settable to False from the CLI
    (type=bool would make bool('0') True and the flags un-disablable)."""
    from cape_tpu.core.config import parse_cli

    cfg = parse_cli([
        "--name", "t", "--padded_layout", "0", "--use_pallas", "false",
        "--remat", "1", "--fold_conditions", "0",
    ])
    assert cfg.padded_layout is False
    assert cfg.use_pallas is False
    assert cfg.remat is True
    assert cfg.fold_conditions is False


def test_resolve_config_pose_type_intent_fix():
    """pose_type='pose' conditions on 42-dim axis-angle (14 joints x 3);
    the reference hardcodes cond_dim=14*9 even then (main.py:69) — pin the
    rebuilt intent (apps.main.resolve_config)."""
    from cape_tpu.apps.main import resolve_config

    cfg = CAPEConfig(pose_type="pose")
    assert resolve_config(cfg).cond_dim == 42
    assert resolve_config(CAPEConfig(pose_type="rot")).cond_dim == 126
    # an explicit cond_dim is the user's call; don't override it
    assert resolve_config(CAPEConfig(pose_type="pose", cond_dim=30)).cond_dim == 30


def test_synthetic_fallback_honors_pose_type(monkeypatch):
    """load_bodydata's synthetic stand-in must produce axis-angle
    conditions under pose_type='pose' (72 -> filtered 42), or the
    cond_dim=42 model would crash on its own fallback data."""
    import cape_tpu.apps.main as main_mod
    from cape_tpu.apps.main import load_bodydata, resolve_config
    from cape_tpu.data.synthetic import synthetic_bodydata

    # shrink the stand-in (production 512x6890 costs ~20s of host RNG
    # on this box; the assertion is about condition dims, not size)
    monkeypatch.setattr(
        main_mod, "synthetic_bodydata",
        lambda **kw: synthetic_bodydata(
            **{**kw, "n_train": 48, "n_test": 8, "num_verts": 200}
        ),
    )
    cfg = resolve_config(CAPEConfig(pose_type="pose", dataset="missing_ds"))
    data = load_bodydata(cfg, datadir_root="/nonexistent")
    assert data.pose_train.shape[-1] == 42
    assert data.pose_train_full.shape[-1] == 72


@pytest.mark.slow
def test_demo_suite_pose_type_pose(engine_parts, tmp_path):
    """sample_vary_pose with a 42-dim axis-angle model: _demo_conditions
    must pick the 72-d demo pose params and filter them to the 14 clothing
    joints (reference lib/utils.py:40-62)."""
    from cape_tpu.apps.inference import InferenceEngine

    _, ctx, _ = engine_parts
    cfg = CAPEConfig(
        name="apps_pose_aa", nf=4, nz=8, nz_cond=8, nz_cond2=4,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=4, batch_size=4, pose_type="pose", cond_dim=42,
    )
    model = CAPE(cfg)
    params = model.init_params(jax.random.PRNGKey(3), ctx)
    engine = InferenceEngine(model, ctx, params, batch_size=4)
    suite = DemoSuite(
        engine, name="apps_pose_aa", n_sample=1, save_objs=False,
        smpl_model_folder="/nonexistent", results_root=str(tmp_path), seed=0,
    )
    assert suite._demo_conditions().shape == (6, 42)
    out = suite.sample_vary_pose()
    assert out.shape == (6, 1, 6890, 3)
    assert np.all(np.isfinite(out))


@pytest.mark.slow
def test_gmm_refit_loop_on_nz64_model(engine_parts, tmp_path):
    """Close the flagship GMM loop (VERDICT r3 item 5): the shipped prior
    is 18-dim, the flagship nz is 64 — so encode train latents, refit a
    64-dim prior (tools.fit_latent_gmm's fit + npz format), reload it, and
    drive sample_gmm_sweep through it. The shipped asset must still raise
    on the dim mismatch."""
    from cape_tpu.apps.inference import InferenceEngine
    from cape_tpu.models.gmm import GMM, fit_gmm

    _, ctx, _ = engine_parts
    cfg = CAPEConfig(
        name="apps_gmm64", nf=4, nz=64, nz_cond=8, nz_cond2=4,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=4, batch_size=8,
    )
    model = CAPE(cfg)
    params = model.init_params(jax.random.PRNGKey(5), ctx)
    engine = InferenceEngine(model, ctx, params, batch_size=8)
    suite = DemoSuite(
        engine, name="apps_gmm64", n_sample=1, save_objs=False,
        smpl_model_folder="/nonexistent", results_root=str(tmp_path), seed=0,
    )

    # the shipped 18-dim prior cannot drive a 64-dim latent space
    with pytest.raises(ValueError, match="18-dim"):
        suite.sample_gmm_prior(n=1)

    # train-set latents -> refit prior -> npz roundtrip -> sweep
    # > 64 samples so the 64-dim full covariance is well-conditioned
    data = synthetic_bodydata(n_train=136, n_test=8, num_verts=6890, n_val=8, seed=3)
    z_mean, _, _, _ = engine.encode(data.disp_train, data.pose_train, data.clo_train)
    assert z_mean.shape == (128, 64)
    gmm = fit_gmm(np.asarray(z_mean), n_components=3, n_iter=15, seed=0)
    path = str(tmp_path / "latent_gmm64.npz")
    np.savez(
        path,
        weights=np.asarray(gmm.weights),
        means=np.asarray(gmm.means),
        covariances=np.asarray(gmm.covariances),
    )
    loaded = GMM.from_npz(path)
    assert loaded.means.shape == (3, 64)

    out = suite.sample_gmm_sweep(n=1, gmm=loaded)
    assert out.shape == (6, 4, 1, 6890, 3)
    assert np.all(np.isfinite(out))
