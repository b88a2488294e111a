"""TF-checkpoint converter tests: the scope mapping is validated by
synthesizing reference-named variables from a real param tree (inverse
mapping) and checking the converter reproduces the tree exactly."""

import jax
import numpy as np
import pytest

from cape_tpu.core.config import CAPEConfig
from cape_tpu.models.cape import CAPE
from cape_tpu.tools.tf_ckpt_converter import (
    cheb_to_ours,
    convert,
    ours_to_tf_cheb,
    synthesize_reference_vars,
    verify_against_template,
)


@pytest.fixture()
def ctx(flagship_ctx):
    # same build args as the session-scoped conftest fixture — share it
    return flagship_ctx


# ours_to_tf_cheb / synthesize_reference_vars moved into the converter
# module (shared with tools.artifact_drill); re-exported above.
_synthesize_tfvars = synthesize_reference_vars


def test_cheb_layout_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((3, 5, 7))
    np.testing.assert_array_equal(cheb_to_ours(ours_to_tf_cheb(w), 3), w)


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


@pytest.mark.slow
def test_artifact_drill_end_to_end(tmp_path):
    """The artifact-landing drill (tools.artifact_drill): pack -> train ->
    acceptance -> convert -> demo -> deploy, chained on synthetic
    stand-ins. Proves each stage hands off to the next so the same
    invocation works the day the license-gated artifacts land
    (docs/ROADMAP.md)."""
    import json

    from cape_tpu.tools.artifact_drill import main as drill_main

    drill_main(["--workdir", str(tmp_path / "drill")])
    # every stage's artifact exists
    root = tmp_path / "drill"
    assert (root / "datasets").is_dir()
    assert (root / "drill_run" / "checkpoints").is_dir()
    assert (root / "converted_params.npz").is_file()
    objs = list((root / "demo_results").rglob("*.obj"))
    assert objs
    assert (root / "drill_run.capex").is_file()  # deploy stage artifact


def test_plot_metrics_dashboard(tmp_path):
    """plot_metrics turns a run's metrics.jsonl into a self-contained SVG
    dashboard: one chart per metric, EMA overlay on loss_g, val markers,
    final-values table; tolerates a torn tail line from a live run."""
    import json

    from cape_tpu.tools.plot_metrics import plot_metrics, read_metrics

    run = tmp_path / "runx"
    run.mkdir()
    with open(run / "metrics.jsonl", "w") as fh:
        for s in range(0, 40, 10):
            fh.write(json.dumps({"step": s, "t": s * 0.1, "loss_g": 3.0 - s * 0.01,
                                 "loss_d": 0.5, "recon": 1.0 / (s + 1)}) + "\n")
        fh.write(json.dumps({"step": 39, "t": 4.0, "loss_g": 2.5, "loss_d": 0.4,
                             "recon": 0.02, "loss_g_ema": 2.7, "loss_d_ema": 0.45,
                             "val_recon": 0.03, "epoch": 1, "lr_g": 8e-3,
                             "step_ms": 11.0}) + "\n")
        fh.write('{"step": 40, "loss_g": 2.4')      # torn tail (live run)

    out = plot_metrics(str(run))
    html_text = open(out).read()
    assert out.endswith("metrics.html")
    for key in ("loss_g", "loss_d", "recon", "val_recon", "lr_g", "step_ms"):
        assert key in html_text, key
    assert html_text.count("<polyline") >= 7        # 6 charts + EMA overlay
    assert "stroke-dasharray" in html_text          # the EMA overlay style
    assert "Final values" in html_text
    # torn line ignored, full records parsed
    assert len(read_metrics(str(run / "metrics.jsonl"))) == 5

    # CLI entry
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "cape_tpu.tools.plot_metrics", str(run),
         "-o", str(tmp_path / "alt.html")],
        capture_output=True, text=True,
    )
    assert r.returncode == 0 and (tmp_path / "alt.html").exists()

    # zero records must raise ValueError, NOT SystemExit: Trainer.fit's
    # dashboard hook guards with `except Exception`, and a SystemExit
    # would slip past it and kill a finished run
    empty = tmp_path / "empty_run"
    empty.mkdir()
    (empty / "metrics.jsonl").touch()
    with pytest.raises(ValueError):
        plot_metrics(str(empty))


def test_perf_ab_tools_import_clean():
    """The on-chip A/B harnesses (docs/PERF.md round 5) import without a
    backend: jax is deliberately imported inside main() so a syntax or
    top-level regression is caught here without touching the relay."""
    import cape_tpu.tools.opt_state_ab as osab
    import cape_tpu.tools.xla_opts_ab as xoab

    assert callable(osab.main) and callable(xoab.main)
    assert xoab.VARIANTS and "baseline" in xoab.VARIANTS
    assert osab.STEPS_PER_DISPATCH == xoab.STEPS_PER_DISPATCH == 32
