"""The real TF-Saver checkpoint file path, end to end.

The published CAPE models are tf.train.Saver V2 checkpoints
(reference lib/models.py:351). Everything else about the converter is
covered by roundtrip + parity tests on in-memory dicts; this file covers
the one function that runs FIRST on checkpoint-landing day —
read_tf_checkpoint — against files actually written by TensorFlow:

  reference-named variables -> tf.compat.v1.Variable graph ->
  tf.train.Saver().save() -> read_tf_checkpoint -> convert -> verify.

Slow tier: imports TensorFlow (several seconds) and writes real files.
"""

from __future__ import annotations

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from cape_tpu.core.config import CAPEConfig
from cape_tpu.meshops.pyramid import build_pyramid
from cape_tpu.meshops.toy import icosphere
from cape_tpu.models.cape import CAPE
from cape_tpu.ops.sparse import build_graph_context
from cape_tpu.tools.tf_ckpt_converter import (
    convert,
    read_tf_checkpoint,
    synthesize_reference_vars,
    verify_against_template,
    write_tf_checkpoint,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def toy():
    cfg = CAPEConfig(
        num_conv_layers=4, nf=8, nz=6, nz_cond=5, nz_cond2=3,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=4, batch_size=2,
    )
    verts, faces = icosphere(3)
    pyr = build_pyramid(verts, faces, cfg.ds_factors)
    pyr_d = build_pyramid(verts, faces, [2, 2])
    ctx = build_graph_context(pyr, pyr_d, pyr.edges[0], verts, mode="ell")

    import jax

    params = jax.device_get(CAPE(cfg).init_params(jax.random.PRNGKey(0), ctx))
    shapes = synthesize_reference_vars(params, cfg)
    rng = np.random.default_rng(11)
    refvars = {
        k: rng.standard_normal(v.shape).astype(np.float32) for k, v in shapes.items()
    }
    return cfg, ctx, refvars


def test_saver_file_roundtrips_exactly(toy, tmp_path):
    """Every variable written by tf.train.Saver reads back bit-identical;
    optimizer slots and bookkeeping variables are filtered out."""
    cfg, ctx, refvars = toy
    saved = write_tf_checkpoint(
        refvars, str(tmp_path / "model"), global_step=120, fake_slots=True
    )
    assert saved.endswith("model-120")

    got = read_tf_checkpoint(saved)
    assert set(got) == set(refvars)           # Momentum + global_step dropped
    for name, v in refvars.items():
        np.testing.assert_array_equal(got[name], v, err_msg=name)


def test_directory_resolves_latest_checkpoint(toy, tmp_path):
    """read_tf_checkpoint on a directory picks tf.train.latest_checkpoint,
    exactly how the reference restores (lib/models.py:209-215)."""
    cfg, ctx, refvars = toy
    early = {k: np.zeros_like(v) for k, v in refvars.items()}
    write_tf_checkpoint(early, str(tmp_path / "model"), global_step=10)
    write_tf_checkpoint(refvars, str(tmp_path / "model"), global_step=20)

    got = read_tf_checkpoint(str(tmp_path))
    np.testing.assert_array_equal(
        got["generator/decoder/outputs/weights"],
        refvars["generator/decoder/outputs/weights"],
    )


def test_saver_file_converts_and_verifies(toy, tmp_path):
    """The full landing-day journey on a TF-written file: read -> convert
    -> template shape verification."""
    cfg, ctx, refvars = toy
    saved = write_tf_checkpoint(refvars, str(tmp_path / "model"), global_step=7)
    params = convert(read_tf_checkpoint(saved), cfg)
    verify_against_template(params, CAPE(cfg), ctx)
    np.testing.assert_array_equal(
        params["generator"]["decoder"]["out"]["b"],
        refvars["generator/decoder/outputs/bias"].reshape(-1, 3),
    )


def test_missing_checkpoint_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_tf_checkpoint(str(tmp_path))
