"""tools/tf_reference_bench builds THE reference computation.

The measured `vs_reference_cpu_measured` ratio (BENCH_r05) is only
meaningful if the TF graph being timed is really the reference's
training graph. This anchors it two ways:

* numerically — initialized from `synthesize_reference_vars` (the same
  reference-named variable dict the parity matrix uses), the graph's
  encoder stats, generator output, and discriminator logits match the
  straight-line numpy transcription of lib/models.py
  (tests/reference_oracle.py) to f32 tolerance;
* operationally — `time_steps` runs the reference's two-session.run
  G-then-D step (lib/models.py:905-906) end to end, optimizers and all.

Slow tier: imports TensorFlow (~10 s) and builds a TF1 graph.
"""

from __future__ import annotations

import numpy as np
import pytest

pytest.importorskip("tensorflow")

import jax

from cape_tpu.core.config import CAPEConfig
from cape_tpu.meshops.pyramid import build_pyramid
from cape_tpu.meshops.toy import icosphere
from cape_tpu.models.cape import CAPE
from cape_tpu.ops.sparse import build_graph_context
from cape_tpu.tools.tf_ckpt_converter import synthesize_reference_vars
from cape_tpu.tools.tf_reference_bench import ReferenceGraph
from reference_oracle import ReferenceCAPE

pytestmark = pytest.mark.slow

B = 2


@pytest.fixture(scope="module")
def world():
    verts, faces = icosphere(3)  # 258 verts
    pyr = build_pyramid(verts, faces, [2, 2, 2, 2])
    pyr_d = build_pyramid(verts, faces, [2, 2, 2, 2])
    cfg = CAPEConfig(
        name="tf_ref_bench_test", num_conv_layers=4, nf=8, nz=6, nz_cond=5,
        nz_cond2=3, use_res_block=False, use_res_block_dec=True, affine=True,
        cond_encoder=True, reduce_dim=4, batch_size=B,
    )
    ctx = build_graph_context(pyr, pyr_d, pyr.edges[0], verts, mode="ell")
    params = CAPE(cfg).init_params(jax.random.PRNGKey(0), ctx)
    shapes = synthesize_reference_vars(jax.device_get(params), cfg)
    rng = np.random.default_rng(20240817)
    refvars = {
        name: (rng.standard_normal(v.shape).astype(np.float32) * 0.2
               + (1.0 if name.endswith("/gamma") else 0.0))
        for name, v in shapes.items()
    }
    return cfg, pyr, pyr_d, verts, refvars


def test_graph_matches_transcription_oracle(world):
    cfg, pyr, pyr_d, verts, refvars = world
    graph = ReferenceGraph(
        cfg, pyr, pyr_d, verts, pyr.edges[0], refvars=refvars, batch_size=B
    )
    rng = np.random.default_rng(3)
    fd = graph.feed(rng)
    with graph.session() as sess:
        zm, zv, pred, d_real = sess.run(
            [graph.z_mean, graph.z_logvar, graph.op_prediction, graph.op_d_real],
            fd,
        )

    oracle = ReferenceCAPE(
        refvars, pyr.adjacencies, pyr.downsamples, pyr.upsamples,
        pyr_d.adjacencies, pyr_d.downsamples,
        out_channels=cfg.channels, K=cfg.K, Kd=cfg.Kd,
        nz=cfg.nz, nz_cond=cfg.nz_cond, nz_cond2=cfg.nz_cond2,
        n_layer_cond=cfg.n_layer_cond, use_res_block=cfg.use_res_block,
        use_res_block_dec=cfg.use_res_block_dec, affine=cfg.affine,
        cond_encoder=cfg.cond_encoder, reduce_dim=cfg.reduce_dim,
    )
    data_g = fd[graph.ph_data_g]
    y, y2 = oracle.embed_conditions(fd[graph.ph_cond_g], fd[graph.ph_cond2_g])
    zm_o, zv_o = oracle.encoder(data_g, y, y2)
    z = zm_o + np.sqrt(np.exp(zv_o)) * fd[graph.ph_eps]
    pred_o = oracle.decoder_cond_vert(
        np.concatenate([z, y, y2], axis=-1), y, y2
    )
    y_d, y2_d = oracle.embed_conditions(fd[graph.ph_cond_d], fd[graph.ph_cond2_d])
    d_real_o = oracle.discriminator(fd[graph.ph_data_d], y_d, y2_d)

    def close(got, want, msg):
        want = np.asarray(want)
        scale = max(float(np.max(np.abs(want))), 1.0)
        np.testing.assert_allclose(
            got, want, rtol=2e-4, atol=1e-4 * scale, err_msg=msg
        )

    close(zm, zm_o, "z_mean")
    close(zv, zv_o, "z_logvar")
    close(pred, pred_o, "generator output")
    close(d_real, d_real_o, "discriminator logits")


def test_two_session_run_step_executes(world):
    cfg, pyr, pyr_d, verts, refvars = world
    graph = ReferenceGraph(
        cfg, pyr, pyr_d, verts, pyr.edges[0], refvars=None, batch_size=B
    )
    ms = graph.time_steps(steps=2, warmup=1)
    assert np.isfinite(ms) and ms > 0
