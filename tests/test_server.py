"""HTTP model-server tests: wire API, error paths, parity with direct
InferenceEngine calls. The server binds port 0 (OS-assigned) on loopback
and runs in a daemon thread; requests go through a real HTTP socket."""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from cape_tpu.apps.inference import InferenceEngine
from cape_tpu.apps.server import serve
from cape_tpu.core.config import CAPEConfig
from cape_tpu.meshops import assets
from cape_tpu.models.cape import CAPE
from cape_tpu.ops.sparse import build_graph_context


@pytest.fixture(scope="module")
def srv_parts(flagship_ctx):
    cfg = CAPEConfig(
        name="server_test", nf=8, nz=18, nz_cond=24, nz_cond2=8,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=8, batch_size=4,
    )
    model = CAPE(cfg)
    params = model.init_params(jax.random.PRNGKey(0), flagship_ctx)
    return model, flagship_ctx, params, cfg


@pytest.fixture(scope="module")
def srv(srv_parts):
    model, ctx, params, cfg = srv_parts
    engine = InferenceEngine(model, ctx, params, batch_size=4)

    from cape_tpu.models.gmm import GMM

    httpd, ms = serve(engine, "127.0.0.1", 0, gmm=GMM.load_pretrained())
    ms.warmup()  # the production startup path; later compiles are cache hits
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, engine, cfg
    httpd.shutdown()
    httpd.server_close()
    thread.join(timeout=5)


def _req(base, path, body=None, method=None):
    data = None if body is None else json.dumps(body).encode()
    req = urllib.request.Request(
        base + path, data=data, method=method or ("POST" if data else "GET"),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.mark.slow
def test_health_reports_model_dims(srv):
    base, _, cfg = srv
    status, info = _req(base, "/health")
    assert status == 200
    assert info["nz"] == cfg.nz and info["cond_dim"] == cfg.cond_dim
    assert info["num_verts"] == 6890
    assert info["gmm_prior"] is True


@pytest.mark.slow
def test_viewer_page_and_sample_roundtrip(srv):
    """GET /viewer serves the live WebGL page (the interactive surface
    replacing the reference's psbody MeshViewers window, demos.py:225-246)
    wired to this server's /sample; the page's own request shape must
    round-trip against the live endpoint."""
    import re

    base, _, cfg = srv
    req = urllib.request.Request(base + "/viewer")
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("text/html")
        page = resp.read().decode()
    # renderer + live controls + embedded template mesh are all present
    assert 'getContext("webgl"' in page
    assert 'fetch("/sample"' in page
    assert '"template"' in page
    assert f"const CLO_DIM = {cfg.cond2_dim}" in page
    assert "HAS_GMM = true" in page  # srv fixture loads the GMM
    # the page's demo-pose rows are model-shaped: replay its exact request
    poses = json.loads(re.search(r"const POSES = (\[\[.*?\]\]);", page).group(1))
    assert len(poses[0]) == cfg.cond_dim
    clo = [[1 if i == 0 else 0 for i in range(cfg.cond2_dim)]]
    status, out = _req(
        base, "/sample",
        {"n": 2, "seed": 1, "prior": "normal", "pose": [poses[0]], "clo": clo},
    )
    assert status == 200
    assert np.asarray(out["disp"]).shape == (2, 6890, 3)
    # the built page is cached: a second fetch returns identical bytes
    with urllib.request.urlopen(base + "/viewer", timeout=120) as resp:
        assert resp.read().decode() == page


@pytest.mark.slow
def test_sample_shapes_and_seed_determinism(srv):
    base, _, cfg = srv
    body = {
        "n": 3, "seed": 7,
        "pose": np.zeros((1, cfg.cond_dim)).tolist(),
        "clo": np.eye(cfg.cond2_dim)[:1].tolist(),
    }
    s1, r1 = _req(base, "/sample", body)
    s2, r2 = _req(base, "/sample", body)
    assert s1 == s2 == 200
    disp = np.asarray(r1["disp"])
    assert disp.shape == (3, 6890, 3)
    np.testing.assert_array_equal(disp, np.asarray(r2["disp"]))
    # a different seed gives different z, hence different meshes
    s3, r3 = _req(base, "/sample", {**body, "seed": 8})
    assert s3 == 200 and not np.allclose(disp, np.asarray(r3["disp"]))


@pytest.mark.slow
def test_sample_gmm_prior(srv):
    base, _, cfg = srv
    body = {
        "n": 2, "prior": "gmm",
        "pose": np.zeros((1, cfg.cond_dim)).tolist(),
        "clo": np.eye(cfg.cond2_dim)[:1].tolist(),
    }
    status, r = _req(base, "/sample", body)
    assert status == 200
    assert np.asarray(r["z"]).shape == (2, cfg.nz)
    assert np.asarray(r["disp"]).shape == (2, 6890, 3)


@pytest.mark.slow
def test_reconstruct_matches_direct_engine(srv):
    base, engine, cfg = srv
    rng = np.random.default_rng(0)
    disp = rng.standard_normal((2, 6890, 3)).astype(np.float32) * 0.01
    pose = rng.standard_normal((2, cfg.cond_dim)).astype(np.float32)
    clo = np.eye(cfg.cond2_dim, dtype=np.float32)[:2]
    status, r = _req(
        base, "/reconstruct",
        {"disp": disp.tolist(), "pose": pose.tolist(), "clo": clo.tolist()},
    )
    assert status == 200
    direct = engine.autoencode(disp, pose, clo, sample=False)
    np.testing.assert_allclose(np.asarray(r["disp"]), direct, rtol=0, atol=1e-5)


@pytest.mark.slow
def test_decode_pre_embedded_matches_z_path(srv):
    base, engine, cfg = srv
    rng = np.random.default_rng(1)
    z = rng.standard_normal((2, cfg.nz)).astype(np.float32)
    pose = rng.standard_normal((2, cfg.cond_dim)).astype(np.float32)
    clo = np.eye(cfg.cond2_dim, dtype=np.float32)[:2]
    s1, r1 = _req(
        base, "/decode", {"z": z.tolist(), "pose": pose.tolist(), "clo": clo.tolist()}
    )
    assert s1 == 200
    y, y2 = engine.encode_only_condition(pose, clo)
    zt = np.concatenate([z, y, y2], axis=-1)
    s2, r2 = _req(
        base, "/decode",
        {"z_total": zt.tolist(), "y": y.tolist(), "y2": y2.tolist()},
    )
    assert s2 == 200
    np.testing.assert_allclose(
        np.asarray(r1["disp"]), np.asarray(r2["disp"]), rtol=0, atol=1e-5
    )


@pytest.mark.slow
def test_error_paths(srv):
    base, _, cfg = srv
    status, r = _req(base, "/nope", {"x": 1})
    assert status == 404 and "no route" in r["error"]
    # missing required field
    status, r = _req(base, "/decode", {"z": [[0.0] * cfg.nz]})
    assert status == 400 and "pose" in r["error"]
    # wrong trailing dim
    status, r = _req(
        base, "/sample",
        {"pose": [[0.0] * (cfg.cond_dim + 1)], "clo": [[0.0] * cfg.cond2_dim]},
    )
    assert status == 400 and "pose" in r["error"]
    # non-finite input rejected before it reaches the device
    bad = [[float("nan")] * cfg.cond_dim]
    status, r = _req(base, "/sample", {"pose": bad, "clo": [[0.0] * cfg.cond2_dim]})
    assert status == 400 and "non-finite" in r["error"]
    # malformed JSON body
    req = urllib.request.Request(
        base + "/decode", data=b"{not json", method="POST",
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400 and "bad JSON" in json.loads(e.read())["error"]


@pytest.mark.slow
def test_stats_counts_requests(srv):
    base, _, cfg = srv
    # generate our own traffic (self-sufficient under pytest -k): one ok
    # /sample, one 400, and two unknown paths that must share one key
    ok_body = {
        "n": 1,
        "pose": np.zeros((1, cfg.cond_dim)).tolist(),
        "clo": np.eye(cfg.cond2_dim)[:1].tolist(),
    }
    assert _req(base, "/sample", ok_body)[0] == 200
    assert _req(base, "/sample", {"pose": [[0.0]], "clo": [[0.0]]})[0] == 400
    assert _req(base, "/whatever-1", {})[0] == 404
    assert _req(base, "/whatever-2", {})[0] == 404
    status, stats = _req(base, "/stats")
    assert status == 200
    ep = "POST /sample"
    assert stats[ep]["requests"] >= 2
    assert stats[ep]["errors"] >= 1
    assert stats[ep]["latency_ms_p50"] is not None
    # unknown paths collapse to one fixed key (bounded stats memory)
    assert not any(k.startswith(("POST /whatever", "GET /whatever")) for k in stats)
    assert stats["(unrouted)"]["requests"] >= 2


@pytest.mark.slow
def test_concurrent_requests_coalesce_and_stay_correct(srv):
    """The HTTP layer is threaded; device work micro-batches across
    requests. N concurrent /sample requests must all succeed with
    correct, seed-deterministic bodies (per-row math is independent of
    batch neighbors), and the batcher must have coalesced at least some
    of them into shared device calls."""
    import concurrent.futures

    base, _, cfg = srv
    def one(seed):
        body = {
            "n": 1, "seed": seed,
            "pose": np.zeros((1, cfg.cond_dim)).tolist(),
            "clo": np.eye(cfg.cond2_dim)[:1].tolist(),
        }
        return seed, _req(base, "/sample", body)
    with concurrent.futures.ThreadPoolExecutor(max_workers=6) as ex:
        results = list(ex.map(one, [1, 2, 1, 2, 1, 2]))
    by_seed = {}
    for seed, (status, r) in results:
        assert status == 200
        disp = np.asarray(r["disp"])
        assert disp.shape == (1, 6890, 3)
        if seed in by_seed:  # same seed -> identical mesh, across threads
            np.testing.assert_array_equal(disp, by_seed[seed])
        else:
            by_seed[seed] = disp
    assert not np.allclose(by_seed[1], by_seed[2])
    mb = _req(base, "/stats")[1]["(micro_batch)"]
    assert mb["decode_requests"] >= 6
    assert mb["decode_calls"] < mb["decode_requests"]


@pytest.mark.slow
def test_concurrent_encode_and_reconstruct_coalesce(srv):
    """/encode and deterministic /reconstruct share the encode batcher;
    concurrent mixed traffic coalesces and every response still matches
    the direct-engine result for its own rows."""
    import concurrent.futures

    base, engine, cfg = srv
    rng = np.random.default_rng(3)
    disp = rng.standard_normal((8, 6890, 3)).astype(np.float32) * 0.01
    pose = rng.standard_normal((8, cfg.cond_dim)).astype(np.float32)
    clo = np.tile(np.eye(cfg.cond2_dim, dtype=np.float32)[:1], (8, 1))

    def one(i):
        body = {
            "disp": disp[i : i + 1].tolist(),
            "pose": pose[i : i + 1].tolist(),
            "clo": clo[i : i + 1].tolist(),
        }
        path = "/encode" if i % 2 == 0 else "/reconstruct"
        return i, path, _req(base, path, body)

    before = _req(base, "/stats")[1]["(micro_batch)"]
    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(one, range(8)))
    zm_all, *_ = engine.encode(disp, pose, clo)
    rec_all = engine.autoencode(disp, pose, clo, sample=False)
    for i, path, (status, r) in results:
        assert status == 200
        if path == "/encode":
            np.testing.assert_allclose(
                np.asarray(r["z_mean"]), zm_all[i : i + 1], rtol=0, atol=1e-5
            )
        else:
            np.testing.assert_allclose(
                np.asarray(r["disp"]), rec_all[i : i + 1], rtol=0, atol=1e-5
            )
    after = _req(base, "/stats")[1]["(micro_batch)"]
    new_req = after["encode_requests"] - before["encode_requests"]
    new_calls = after["encode_calls"] - before["encode_calls"]
    assert new_req == 8 and new_calls < new_req


@pytest.mark.slow
def test_mesh_parallel_serving_matches_single_device(srv_parts, srv):
    """One server process over a 2-device mesh (engine dp=) returns the
    same bytes as the single-device server for the same seed."""
    import threading

    from cape_tpu.parallel.mesh import DataParallel

    model, ctx, params, cfg = srv_parts
    engine = InferenceEngine(model, ctx, params, batch_size=2, dp=DataParallel(2))
    httpd, ms = serve(engine, "127.0.0.1", 0)
    ms.warmup()  # compile outside the HTTP request timeout (loaded-box flake)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base_dp = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        body = {
            "n": 5, "seed": 21,
            "pose": np.zeros((1, cfg.cond_dim)).tolist(),
            "clo": np.eye(cfg.cond2_dim)[:1].tolist(),
        }
        s1, r_dp = _req(base_dp, "/sample", body)
        s2, r_1 = _req(srv[0], "/sample", body)
        assert s1 == s2 == 200
        np.testing.assert_allclose(
            np.asarray(r_dp["disp"]), np.asarray(r_1["disp"]), rtol=0, atol=1e-5
        )
    finally:
        httpd.shutdown()
        httpd.server_close()
        thread.join(timeout=5)


@pytest.mark.slow
def test_python_client_round_trip(srv):
    """CapeClient mirrors the engine surface over the wire."""
    from cape_tpu.apps.client import CapeClient, CapeServerError

    base, engine, cfg = srv
    c = CapeClient(base)
    assert c.health()["nz"] == cfg.nz

    rng = np.random.default_rng(5)
    disp = rng.standard_normal((2, 6890, 3)).astype(np.float32) * 0.01
    pose = rng.standard_normal((2, cfg.cond_dim)).astype(np.float32)
    clo = np.eye(cfg.cond2_dim, dtype=np.float32)[:2]

    zm, zl, y, y2 = c.encode(disp, pose, clo)
    zm_e, *_ = engine.encode(disp, pose, clo)
    np.testing.assert_allclose(zm, zm_e, rtol=0, atol=1e-5)

    out = c.reconstruct(disp, pose, clo)
    np.testing.assert_allclose(
        out, engine.autoencode(disp, pose, clo, sample=False), rtol=0, atol=1e-5
    )

    disp_s, z_s = c.sample(pose[:1], clo[:1], n=3, seed=4)
    assert disp_s.shape == (3, 6890, 3) and z_s.shape == (3, cfg.nz)

    with pytest.raises(CapeServerError, match="rows"):
        c.decode(
            z=np.zeros((2, cfg.nz), np.float32),
            pose=np.zeros((3, cfg.cond_dim), np.float32), clo=clo,
        )
    assert "POST /sample" in c.stats()


@pytest.mark.slow
def test_npz_and_json_wires_agree(srv):
    """The binary npz wire (production: raw float32 bytes, no JSON
    encode of ~82k floats/mesh) returns byte-identical results to JSON,
    and npz errors are still JSON 400s."""
    from cape_tpu.apps.client import CapeClient, CapeServerError

    base, _, cfg = srv
    npz = CapeClient(base, wire="npz")
    js = CapeClient(base, wire="json")
    pose = np.zeros((1, cfg.cond_dim), np.float32)
    clo = np.eye(cfg.cond2_dim, dtype=np.float32)[:1]
    d_npz, z_npz = npz.sample(pose, clo, n=2, seed=13)
    d_js, z_js = js.sample(pose, clo, n=2, seed=13)
    assert d_npz.dtype == np.float32
    np.testing.assert_array_equal(d_npz, np.asarray(d_js, np.float32))
    np.testing.assert_array_equal(z_npz, np.asarray(z_js, np.float32))
    with pytest.raises(CapeServerError, match="n must be"):
        npz.sample(pose, clo, n=-3)
    # a garbage npz body is a 400, not a 500
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        base + "/sample", b"not an npz archive",
        {"Content-Type": "application/x-npz"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400


@pytest.mark.slow
def test_metrics_prometheus_exposition(srv):
    """GET /metrics mirrors /stats in Prometheus text format: counters,
    latency quantiles, micro-batch coalescing, and the model-info gauge."""
    base, _, cfg = srv
    ok_body = {
        "n": 1,
        "pose": np.zeros((1, cfg.cond_dim)).tolist(),
        "clo": np.eye(cfg.cond2_dim)[:1].tolist(),
    }
    assert _req(base, "/sample", ok_body)[0] == 200
    with urllib.request.urlopen(base + "/metrics", timeout=30) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("text/plain")
        text = resp.read().decode()
    assert 'cape_model_info{model="server_test"' in text
    assert 'cape_requests_total{endpoint="POST /sample"}' in text
    assert 'quantile="0.95"' in text
    assert 'cape_microbatch_device_calls_total{stage="decode"}' in text
    # every sample line parses as `name{labels} value`
    for line in text.splitlines():
        if line.startswith("#") or not line:
            continue
        name_labels, value = line.rsplit(" ", 1)
        float(value)
        assert name_labels.startswith("cape_") and name_labels.endswith("}")


@pytest.mark.slow
def test_sample_bad_n_is_client_error(srv):
    base, _, cfg = srv
    body = {
        "n": "abc",
        "pose": np.zeros((1, cfg.cond_dim)).tolist(),
        "clo": np.eye(cfg.cond2_dim)[:1].tolist(),
    }
    status, r = _req(base, "/sample", body)
    assert status == 400 and "'n'" in r["error"]
    status, r = _req(base, "/sample", {**body, "n": 2, "seed": [1]})
    assert status == 400 and "'seed'" in r["error"]
    # json accepts NaN/Infinity tokens; they are 400s, not 500s
    status, r = _req(base, "/sample", {**body, "n": float("nan")})
    assert status == 400 and "'n'" in r["error"]
    status, r = _req(base, "/sample", {**body, "n": 2, "seed": float("inf")})
    assert status == 400 and "'seed'" in r["error"]
    # negative seeds are rejected consistently across endpoints
    status, r = _req(base, "/sample", {**body, "n": 2, "seed": -1})
    assert status == 400 and ">= 0" in r["error"]
    # zero-row arrays are a 400, not a 500 from the engine
    status, r = _req(base, "/sample", {**body, "n": 2, "pose": [], "seed": 0})
    assert status == 400


@pytest.mark.slow
def test_handle_fuzz_never_500(srv):
    """Seeded fuzz over the request surface: any garbage body must come
    back as a clean 4xx (or 200 when it happens to be valid) — never a
    500, which would mean an exception class the validators don't own."""
    from cape_tpu.apps.server import ModelServer

    _, engine, cfg = srv
    ms = ModelServer(engine, micro_batch=False)
    rng = np.random.default_rng(42)

    def rand_val(depth=0):
        k = int(rng.integers(0, 10))
        if k == 0:
            return None
        if k == 1:
            return float(rng.standard_normal()) * 10 ** int(rng.integers(0, 12))
        if k == 2:
            return int(rng.integers(-(2**40), 2**40))
        if k == 3:
            return str(rng.choice(["", "abc", "gmm", "normal", "NaN"]))
        if k == 4:
            return bool(rng.integers(0, 2))
        if k == 5:
            return float("nan") if rng.integers(0, 2) else float("inf")
        if k == 6 and depth < 2:
            return [rand_val(depth + 1) for _ in range(int(rng.integers(0, 4)))]
        if k == 7 and depth < 2:
            return {"x": rand_val(depth + 1)}
        if k == 8:
            shape = tuple(
                int(rng.integers(0, 5)) for _ in range(int(rng.integers(1, 4)))
            )
            return rng.standard_normal(shape).tolist()
        # occasionally a plausibly-valid field to push past the validators
        width = int(rng.choice([cfg.cond_dim, cfg.cond2_dim, cfg.nz, 3]))
        return np.zeros((1, width), np.float32).tolist()

    keys = np.array(
        ["pose", "clo", "disp", "z", "z_total", "y", "y2", "n", "seed",
         "prior", "sample"]
    )
    paths = ["/encode", "/decode", "/reconstruct", "/sample", "/nope"]
    for i in range(300):
        nk = int(rng.integers(0, 6))
        body = {str(k): rand_val() for k in rng.choice(keys, size=nk, replace=False)}
        status, resp = ms.handle("POST", paths[i % len(paths)], body)
        assert status in (200, 400, 404), (status, resp, body)


def test_micro_batcher_unit():
    """_MicroBatcher mechanics, no HTTP/engine: rows coalesce up to
    capacity, each future gets exactly its own rows back in order, a
    multi-row request spans correctly, and a failing device fn rejects
    every waiting future instead of hanging them."""
    import time

    from cape_tpu.apps.server import _MicroBatcher

    calls = []

    def fn(a, b):
        calls.append(len(a))
        return a * 2.0, b + 1.0

    mb = _MicroBatcher(fn, capacity=4, window_ms=30.0, name="unit")
    futs = [
        mb.submit([np.full((1, 3), i, np.float32), np.full((1, 2), i, np.float32)])
        for i in range(6)
    ]
    outs = [f.result(timeout=30) for f in futs]
    for i, (a2, b1) in enumerate(outs):
        np.testing.assert_array_equal(a2, np.full((1, 3), 2.0 * i))
        np.testing.assert_array_equal(b1, np.full((1, 2), i + 1.0))
    assert mb.requests == 6 and mb.calls == len(calls)
    assert all(c <= 4 for c in calls)  # capacity respected per device call

    # a 3-row submission mixed with 1-row ones keeps row accounting right
    big = mb.submit([np.arange(9, dtype=np.float32).reshape(3, 3), np.zeros((3, 2), np.float32)])
    small = mb.submit([np.full((1, 3), 7, np.float32), np.zeros((1, 2), np.float32)])
    a2, _ = big.result(timeout=30)
    np.testing.assert_array_equal(a2, 2.0 * np.arange(9, dtype=np.float32).reshape(3, 3))
    np.testing.assert_array_equal(small.result(timeout=30)[0], np.full((1, 3), 14.0))

    def bad(a, b):
        raise RuntimeError("device on fire")

    mbad = _MicroBatcher(bad, capacity=4, window_ms=5.0, name="unit-bad")
    f1 = mbad.submit([np.zeros((1, 3), np.float32), np.zeros((1, 2), np.float32)])
    f2 = mbad.submit([np.zeros((1, 3), np.float32), np.zeros((1, 2), np.float32)])
    for f in (f1, f2):
        with pytest.raises(RuntimeError, match="device on fire"):
            f.result(timeout=30)


@pytest.mark.slow
def test_drain_waits_for_inflight_requests(srv):
    """drain() blocks while a tracked request is open (through response
    serialization) and returns promptly once it closes — the guarantee
    the SIGTERM path builds on."""
    import time

    from cape_tpu.apps.server import ModelServer

    _, engine, _ = srv
    ms = ModelServer(engine, micro_batch=False)
    assert ms.drain(timeout=0.1)  # nothing in flight
    release = threading.Event()
    started = threading.Event()

    def busy():
        with ms.track_request():
            started.set()
            release.wait()

    t = threading.Thread(target=busy)
    t.start()
    assert started.wait(5)
    assert not ms.drain(timeout=0.2)  # blocked on the open request
    release.set()
    assert ms.drain(timeout=5.0)
    t.join(timeout=5)


@pytest.mark.slow
def test_npz_missing_field_is_clean_400(srv):
    """Omitted optional arrays must reach the server as ABSENT fields, not
    np.asarray(None) object arrays pickled into the npz body — the error
    is the endpoint's 'missing required field', not an npz parse failure."""
    from cape_tpu.apps.client import CapeClient, CapeServerError

    base, _, cfg = srv
    c = CapeClient(base, wire="npz")
    zt = np.zeros((2, cfg.nz + cfg.nz_cond + cfg.nz_cond2), np.float32)
    with pytest.raises(CapeServerError, match="missing required field 'y'"):
        c.decode(z_total=zt)


@pytest.mark.slow
def test_negative_content_length_rejected(srv):
    """Content-Length: -1 must not reach rfile.read(-1) (which would block
    until the client closes, pinning the handler thread)."""
    import socket

    base, _, _ = srv
    host, port = base.removeprefix("http://").split(":")
    with socket.create_connection((host, int(port)), timeout=30) as s:
        s.sendall(
            b"POST /sample HTTP/1.1\r\nHost: t\r\n"
            b"Content-Type: application/json\r\nContent-Length: -1\r\n\r\n"
        )
        reply = s.recv(4096).decode()
    assert reply.startswith("HTTP/1.1 413")


@pytest.mark.slow
def test_decode_pre_embedded_row_mismatch_rejected(srv):
    base, engine, cfg = srv
    zt = np.zeros((4, cfg.nz + cfg.nz_cond + cfg.nz_cond2), np.float32)
    y = np.zeros((2, cfg.nz_cond), np.float32)
    y2 = np.zeros((4, cfg.nz_cond2), np.float32)
    status, r = _req(
        base, "/decode",
        {"z_total": zt.tolist(), "y": y.tolist(), "y2": y2.tolist()},
    )
    assert status == 400 and "rows" in r["error"]


def test_viewer_artifact_engine_topology_handling():
    """GET /viewer vs artifact-served engines (tools/export_model.py
    ExportedEngine): the duck-typed engine ships no template_verts and no
    natural-order mapping, so a non-flagship artifact must get a clean
    ServerError (-> 404), not an AttributeError (-> 500); a
    flagship-shaped (6890-vertex) artifact resolves its template from
    assets/ and serves the page."""
    from types import SimpleNamespace

    from cape_tpu.apps.server import ModelServer, ServerError

    def artifact_engine(nv):
        return SimpleNamespace(
            batch_size=4,
            model=SimpleNamespace(
                cfg=SimpleNamespace(
                    name="artifact", nz=8, nz_cond=8, nz_cond2=4,
                    cond_dim=126, cond2_dim=4, compute_dtype="float32",
                )
            ),
            ctx=SimpleNamespace(level_sizes=[nv]),
        )

    with pytest.raises(ServerError, match="no mesh topology"):
        ModelServer(artifact_engine(258), micro_batch=False).viewer_html()

    page = ModelServer(artifact_engine(6890), micro_batch=False).viewer_html()
    assert b"/sample" in page and len(page) > 10_000
