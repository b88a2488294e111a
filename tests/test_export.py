"""AOT export artifact tests: parity with the live engine, loadability
with plain jax (no cape_tpu symbols), and the CLI round trip."""

import json
import subprocess
import sys
import zipfile

import jax
import numpy as np
import pytest

from cape_tpu.apps.inference import InferenceEngine
from cape_tpu.core.config import CAPEConfig
from cape_tpu.meshops import assets
from cape_tpu.models.cape import CAPE
from cape_tpu.ops.sparse import build_graph_context
from cape_tpu.tools.export_model import ExportedModel, export_model


@pytest.fixture(scope="module")
def exported(tmp_path_factory, flagship_ctx):
    cfg = CAPEConfig(
        name="export_test", nf=8, nz=18, nz_cond=24, nz_cond2=8,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=8, batch_size=4,
    )
    ctx = flagship_ctx
    model = CAPE(cfg)
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0), ctx)
    engine = InferenceEngine(model, ctx, params, batch_size=4)
    path = str(tmp_path_factory.mktemp("export") / "model.capex")
    meta = export_model(
        model, ctx, jax.device_get(params), 4, path, platforms=("cpu", "tpu")
    )
    return path, meta, engine, cfg


@pytest.mark.slow
def test_meta_and_members(exported):
    path, meta, _, cfg = exported
    assert meta["nz"] == cfg.nz and meta["batch_size"] == 4
    assert meta["platforms"] == ["cpu", "tpu"]
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
    assert {"meta.json", "embed.shlo", "encode.shlo", "decode.shlo"} <= names


@pytest.mark.slow
def test_parity_with_engine(exported):
    path, _, engine, cfg = exported
    em = ExportedModel.load(path)
    rng = np.random.default_rng(0)
    disp = rng.standard_normal((4, 6890, 3)).astype(np.float32) * 0.01
    pose = rng.standard_normal((4, cfg.cond_dim)).astype(np.float32)
    clo = np.eye(cfg.cond2_dim, dtype=np.float32)[:4]

    zm, zl, y, y2 = em.encode(disp, pose, clo)
    zm_e, zl_e, y_e, y2_e = engine.encode(disp, pose, clo)
    np.testing.assert_allclose(zm, zm_e, rtol=0, atol=1e-5)
    np.testing.assert_allclose(zl, zl_e, rtol=0, atol=1e-5)
    np.testing.assert_allclose(y, y_e, rtol=0, atol=1e-5)

    y_o, y2_o = em.embed(pose, clo)
    np.testing.assert_allclose(y_o, y_e, rtol=0, atol=1e-5)
    np.testing.assert_allclose(y2_o, y2_e, rtol=0, atol=1e-5)

    zt = np.concatenate([zm, y, y2], axis=-1)
    np.testing.assert_allclose(
        em.decode(zt, y, y2), engine.decode(zt, y, y2), rtol=0, atol=1e-5
    )


@pytest.mark.slow
def test_loads_with_plain_jax(exported):
    """The deployment claim: running the artifact needs jax + stdlib only.
    Deserialize and call without any cape_tpu symbol."""
    path, meta, _, cfg = exported
    from jax import export as jexport

    with zipfile.ZipFile(path) as zf:
        assert json.loads(zf.read("meta.json"))["format"] == "cape_tpu.export/1"
        call = jax.jit(jexport.deserialize(zf.read("decode.shlo")).call)
    zt = np.zeros((4, cfg.nz + cfg.nz_cond + cfg.nz_cond2), np.float32)
    y = np.zeros((4, cfg.nz_cond), np.float32)
    y2 = np.zeros((4, cfg.nz_cond2), np.float32)
    out = np.asarray(jax.device_get(call(zt, y, y2)))
    assert out.shape == (4, 6890, 3) and np.isfinite(out).all()


@pytest.mark.slow
def test_symbolic_batch_export(exported, tmp_path):
    """--symbolic-batch lowers the batch dim symbolically: one artifact
    executes at any batch size and matches the fixed-batch artifact."""
    _, _, engine, cfg = exported
    path = str(tmp_path / "sym.capex")
    # symbolic lowering needs the XLA-only routing (the Pallas gate
    # compares batch*channels against a threshold — inconclusive for a
    # symbolic dim); the CLI forces use_pallas=False the same way
    verts, _ = assets.template_mesh()
    ctx = build_graph_context(
        assets.load_pyramid("for_demo"), assets.load_pyramid("ds2"),
        assets.smpl_edges(), verts, use_pallas=False,
    )
    meta = export_model(
        engine.model, ctx, engine.params, 4, path,
        platforms=("cpu", "tpu"), symbolic_batch=True,
    )
    assert meta["symbolic_batch"] is True
    em = ExportedModel.load(path)
    rng = np.random.default_rng(2)
    for B in (3, 7):  # neither is the export batch
        zt = rng.standard_normal(
            (B, cfg.nz + cfg.nz_cond + cfg.nz_cond2)
        ).astype(np.float32)
        y = rng.standard_normal((B, cfg.nz_cond)).astype(np.float32)
        y2 = rng.standard_normal((B, cfg.nz_cond2)).astype(np.float32)
        out = em.decode(zt, y, y2)
        assert out.shape == (B, 6890, 3)
        np.testing.assert_allclose(
            out, engine.decode(zt, y, y2), rtol=0, atol=1e-5
        )


@pytest.mark.slow
def test_quantized_export_smaller_and_close(exported, tmp_path):
    """--quantize int8 (+ bf16 graph constants): the artifact shrinks and
    the outputs stay close to the f32 export — weight-only symmetric
    per-channel int8 with on-chip dequant (quantize_params), biases and
    norm parameters untouched."""
    import os

    path32, _, engine, cfg = exported
    path8 = str(tmp_path / "q.capex")
    ctx = engine.ctx
    meta = export_model(
        engine.model, ctx, jax.device_get(engine.params), 4, path8,
        platforms=("cpu",), quantize="int8", constants_dtype="bfloat16",
    )
    assert meta["quantize"] == "int8"
    assert meta["constants_dtype"] == "bfloat16"
    # int8 weights + bf16 constants must shrink the serialized programs;
    # the f32 baseline carries both at full width (cpu+tpu vs cpu-only
    # platforms does not change constant storage, which dominates)
    assert os.path.getsize(path8) < 0.7 * os.path.getsize(path32)

    em = ExportedModel.load(path8)
    rng = np.random.default_rng(4)
    zt = rng.standard_normal(
        (4, cfg.nz + cfg.nz_cond + cfg.nz_cond2)
    ).astype(np.float32)
    y = rng.standard_normal((4, cfg.nz_cond)).astype(np.float32)
    y2 = rng.standard_normal((4, cfg.nz_cond2)).astype(np.float32)
    out_q = em.decode(zt, y, y2)
    out_f = engine.decode(zt, y, y2)
    assert np.isfinite(out_q).all()
    rel = np.linalg.norm(out_q - out_f) / np.linalg.norm(out_f)
    assert rel < 0.05, f"int8 output drift {rel:.4f}"

    # the quantizer itself: int8 payloads, per-output-channel scales,
    # small relative weight error, non-weight leaves untouched
    from cape_tpu.tools.export_model import dequantize_params, quantize_params

    p = jax.device_get(engine.params)
    q = quantize_params(p)
    w = p["generator"]["decoder"]["fc1"]["kernel"]
    ql = q["generator"]["decoder"]["fc1"]["kernel"]
    assert ql["int8"].dtype == np.int8 and ql["scale"].shape == (w.shape[-1],)
    back = np.asarray(jax.device_get(dequantize_params(q)
        ["generator"]["decoder"]["fc1"]["kernel"]))
    assert np.linalg.norm(back - w) / np.linalg.norm(w) < 0.01
    np.testing.assert_array_equal(
        q["generator"]["decoder"]["out"]["b"], p["generator"]["decoder"]["out"]["b"]
    )


def test_rejects_non_artifact(tmp_path):
    bad = tmp_path / "bad.capex"
    with zipfile.ZipFile(bad, "w") as zf:
        zf.writestr("meta.json", json.dumps({"format": "other"}))
    with pytest.raises(ValueError, match="not a cape_tpu export artifact"):
        ExportedModel.load(str(bad))


@pytest.mark.slow
def test_artifact_serving(exported):
    """The model server runs on an ExportedEngine: deployment = artifact
    + server process, no config/checkpoint/model code."""
    import threading
    import urllib.request

    from cape_tpu.apps.server import serve
    from cape_tpu.tools.export_model import ExportedEngine

    path, meta, engine, cfg = exported
    ee = ExportedEngine(ExportedModel.load(path))
    httpd, ms = serve(ee, "127.0.0.1", 0)
    ms.warmup()
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        info = json.load(urllib.request.urlopen(base + "/health", timeout=30))
        assert info["nz"] == cfg.nz and info["batch_size"] == 4

        rng = np.random.default_rng(3)
        disp = rng.standard_normal((2, 6890, 3)).astype(np.float32) * 0.01
        pose = rng.standard_normal((2, cfg.cond_dim)).astype(np.float32)
        clo = np.eye(cfg.cond2_dim, dtype=np.float32)[:2]
        body = json.dumps(
            {"disp": disp.tolist(), "pose": pose.tolist(), "clo": clo.tolist()}
        ).encode()
        req = urllib.request.Request(
            base + "/reconstruct", body, {"Content-Type": "application/json"}
        )
        out = json.load(urllib.request.urlopen(req, timeout=120))
        # deterministic path matches the live engine exactly
        direct = engine.autoencode(disp, pose, clo, sample=False)
        np.testing.assert_allclose(
            np.asarray(out["disp"]), direct, rtol=0, atol=1e-5
        )
    finally:
        httpd.shutdown()
        httpd.server_close()
        thread.join(timeout=5)


@pytest.mark.slow
def test_sigterm_graceful_shutdown(exported):
    """The server CLI drains on SIGTERM: stops accepting, waits for any
    in-flight device call, closes the socket, exits 0 (what a container
    orchestrator sends on stop). Artifact mode + --platform cpu keeps the
    subprocess off the remote backend."""
    import signal
    import time

    path, *_ = exported
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "cape_tpu.apps.server",
            "--artifact", path, "--platform", "cpu", "--port", "0",
            "--no-warmup",
        ],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        deadline = time.monotonic() + 300
        for line in proc.stdout:
            if "serving" in line:
                break
            assert time.monotonic() < deadline, "server never announced"
        proc.send_signal(signal.SIGTERM)
        out = proc.stdout.read()
        proc.wait(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0
    assert "draining" in out and "server closed" in out


@pytest.mark.slow
def test_cli_round_trip(tmp_path):
    out = tmp_path / "cli.capex"
    subprocess.run(
        [
            sys.executable, "-m", "cape_tpu.tools.export_model",
            "--out", str(out), "--platform", "cpu",
            "--config", "configs/CAPE_nz18_pose24_clotype8_male.yaml",
            "--name", "cli_export_test", "--fresh-init", "--batch_size", "2",
        ],
        check=True, timeout=1200,
    )
    em = ExportedModel.load(str(out))
    assert em.meta["batch_size"] == 2
    disp = em.decode(
        np.zeros((2, em.meta["nz"] + em.meta["nz_cond"] + em.meta["nz_cond2"]), np.float32),
        np.zeros((2, em.meta["nz_cond"]), np.float32),
        np.zeros((2, em.meta["nz_cond2"]), np.float32),
    )
    assert disp.shape == (2, em.meta["num_verts"], 3)
