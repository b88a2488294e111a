"""HTTP model server: a JSON-over-HTTP serving surface for a trained CAPE.

The reference has no serving path at all — its inference re-enters the
TF1 session loop per script invocation (lib/models.py:931-1174 via
run_simple_demo.py / demos.py). This module puts the `InferenceEngine`
behind a long-lived process with a stable wire API, which is how a
deployment actually consumes the model: the checkpoint is restored once,
the jitted fixed-batch functions compile once, and every request after
that pays only device compute plus the dispatch round-trip (measured in
`perf_lab serve`, docs/PERF.md "Serving").

Stdlib-only (http.server + json): nothing to install, works anywhere the
framework does.

Wire formats: JSON (nested lists) for debuggability, and a binary npz
format for production — a mesh is ~82k floats, and JSON costs hundreds
of ms to encode/decode where raw float32 bytes cost ~nothing (measured
in `perf_lab http`). POST a `numpy.savez` archive with
`Content-Type: application/x-npz` (0-d entries become scalars), and/or
request binary responses with `Accept: application/x-npz`. Errors are
always JSON. apps/client.CapeClient speaks npz by default.

Endpoints (all arrays are nested JSON lists, float32 on the wire):
  GET  /health       -> model identity, dims, batch size
  GET  /stats        -> per-endpoint request counts + latency quantiles
  POST /encode       {disp [N,V,3], pose [N,cond_dim], clo [N,cond2_dim]}
                     -> {z_mean, z_logvar, y, y2}
  POST /decode       {z [N,nz], pose [N,cond_dim], clo [N,cond2_dim]}
                     or {z_total [N,nz+nzc+nzc2], y, y2} (pre-embedded)
                     -> {disp [N,V,3]}
  POST /reconstruct  {disp, pose, clo, sample?: bool, seed?: int}
                     -> {disp}
  POST /sample       {pose [1|N,cond_dim], clo [1|N,cond2_dim], n?: int,
                      prior?: "normal"|"gmm", seed?: int} -> {disp}

Concurrency model (TPU-shaped): the HTTP layer is threaded so slow
clients don't serialize each other, but device work goes through one
lock — a single chip runs one batch at a time anyway, and funneling
requests through the engine's fixed-batch padding keeps every call on
the same compiled executable (no per-shape recompiles). Multi-chip
serving is data-parallel at the process level: one server per chip
behind any off-the-shelf HTTP load balancer.

Dynamic micro-batching (on by default, --no-micro-batch to disable):
concurrent /sample, /decode, /encode, and deterministic /reconstruct
requests coalesce into shared fixed-batch device calls — the embed,
encode, and decode stages each gather up to batch_size rows across
requests, waiting at most ~2 ms after the first arrival. Per-row math
is batch-independent, so coalesced results equal per-request results;
under concurrent single-mesh load this turns N dispatch round-trips
into ~N/batch_size. /reconstruct sample=true stays per-request: the
device sampler takes one seed per call. Device-call counts are
reported under "(micro_batch)" in /stats.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from cape_tpu.apps.inference import InferenceEngine

NPZ_CONTENT_TYPE = "application/x-npz"


class ServerError(ValueError):
    """Client-visible request error (becomes a 400 with the message)."""


def _npz_to_body(raw: bytes) -> dict:
    """Decode an npz request body: arrays stay arrays, 0-d entries become
    python scalars (n, seed, sample, prior, ...)."""
    try:
        with np.load(io.BytesIO(raw), allow_pickle=False) as z:
            return {
                k: (v.item() if v.ndim == 0 else v) for k, v in z.items()
            }
    except Exception as e:
        raise ValueError(str(e)) from None


def _body_to_npz(payload: dict) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **payload)  # uncompressed: wire speed over size
    return buf.getvalue()


class _MicroBatcher:
    """Dynamic request coalescing: rows from concurrent requests merge
    into one fixed-batch device call. A worker drains the queue up to
    `capacity` rows, waiting at most `window_ms` after the first arrival
    (negligible vs the ~29 ms dispatch round-trip it saves per coalesced
    request). `fn` receives row-stacked arrays and returns row-stacked
    outputs; per-row math must be batch-independent (it is: every model
    reduction is per-sample)."""

    def __init__(self, fn, capacity: int, window_ms: float = 2.0, name: str = ""):
        import queue

        self.fn = fn
        self.capacity = max(1, capacity)
        self.window = window_ms / 1000.0
        self.calls = 0          # device calls issued (see /stats)
        self.requests = 0       # submissions coalesced into them
        self._q = queue.Queue()
        self._thread = threading.Thread(
            target=self._run, daemon=True, name=f"microbatch-{name}"
        )
        self._thread.start()

    def submit(self, arrays):
        """arrays: per-argument [n, ...] rows. Returns a Future resolving
        to the tuple of this request's output rows."""
        from concurrent.futures import Future

        f = Future()
        self._q.put((arrays, f))
        return f

    def _run(self):
        import queue

        while True:
            batch = [self._q.get()]
            rows = len(batch[0][0][0])
            deadline = time.monotonic() + self.window
            while rows < self.capacity:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                batch.append(nxt)
                rows += len(nxt[0][0])
            try:
                args = [
                    np.concatenate([b[0][i] for b in batch])
                    for i in range(len(batch[0][0]))
                ]
                out = self.fn(*args)
                out = out if isinstance(out, tuple) else (out,)
                self.calls += 1
                self.requests += len(batch)
                off = 0
                for arrays, fut in batch:
                    n = len(arrays[0])
                    fut.set_result(tuple(o[off : off + n] for o in out))
                    off += n
            except Exception as e:  # deliver to every waiting request
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)


def _as_array(obj, name: str, ndim: int, last_dim: int | None = None) -> np.ndarray:
    if obj is None:
        raise ServerError(f"missing required field {name!r}")
    try:
        arr = np.asarray(obj, np.float32)
    except (TypeError, ValueError) as e:
        raise ServerError(f"field {name!r} is not a numeric array: {e}") from None
    if arr.ndim != ndim:
        raise ServerError(f"field {name!r} must have {ndim} dims, got {arr.ndim}")
    if last_dim is not None and arr.shape[-1] != last_dim:
        raise ServerError(
            f"field {name!r} last dim must be {last_dim}, got {arr.shape[-1]}"
        )
    if arr.shape[0] == 0:
        raise ServerError(f"field {name!r} has zero rows")
    if not np.isfinite(arr).all():
        raise ServerError(f"field {name!r} contains non-finite values")
    return arr


def _as_int(body: dict, name: str, default: int, min_value: int | None = None) -> int:
    v = body.get(name, default)
    # bool is an int subclass but "n": true is a client mistake, not a
    # count; json.loads also accepts NaN/Infinity tokens, so int() can
    # raise ValueError/OverflowError — all are 400s, not 500s
    try:
        if isinstance(v, bool) or not isinstance(v, (int, float)) or int(v) != v:
            raise ValueError
    except (ValueError, OverflowError):
        raise ServerError(f"field {name!r} must be an integer, got {v!r}") from None
    v = int(v)
    if min_value is not None and v < min_value:
        raise ServerError(f"field {name!r} must be >= {min_value}, got {v}")
    return v


class _Stats:
    """Per-endpoint request counter + latency ring (median/p95 over the
    last `window` requests; serving dashboards want quantiles, not means)."""

    def __init__(self, window: int = 256):
        self.window = window
        self._lock = threading.Lock()
        self._counts: dict[str, int] = {}
        self._errors: dict[str, int] = {}
        self._lat: dict[str, list[float]] = {}

    def record(self, endpoint: str, ms: float, ok: bool) -> None:
        with self._lock:
            self._counts[endpoint] = self._counts.get(endpoint, 0) + 1
            if not ok:
                self._errors[endpoint] = self._errors.get(endpoint, 0) + 1
            ring = self._lat.setdefault(endpoint, [])
            ring.append(ms)
            if len(ring) > self.window:
                del ring[: len(ring) - self.window]

    def snapshot(self) -> dict:
        with self._lock:
            out = {}
            for ep, n in sorted(self._counts.items()):
                lat = sorted(self._lat.get(ep, []))
                # nearest-rank quantile: ceil(p*n)-1 (p50 of 2 = the lower)
                q = lambda p: round(lat[max(0, -(-int(p * 100 * len(lat)) // 100) - 1)], 3)
                out[ep] = {
                    "requests": n,
                    "errors": self._errors.get(ep, 0),
                    "latency_ms_p50": q(0.50) if lat else None,
                    "latency_ms_p95": q(0.95) if lat else None,
                }
            return out


class _RequestSpan:
    """One in-flight request for ModelServer.drain accounting (a plain
    object, not a per-request contextmanager generator)."""

    __slots__ = ("ms",)

    def __init__(self, ms):
        self.ms = ms

    def __enter__(self):
        with self.ms._inflight_cv:
            self.ms._inflight += 1
        return self

    def __exit__(self, *exc):
        with self.ms._inflight_cv:
            self.ms._inflight -= 1
            self.ms._inflight_cv.notify_all()
        return False


class ModelServer:
    """Request handling around one InferenceEngine. Pure logic — transport
    lives in `serve()` so tests can call handle() directly too."""

    def __init__(
        self,
        engine: InferenceEngine,
        gmm=None,
        micro_batch: bool = True,
        viewer_mesh: tuple | None = None,
    ):
        self.engine = engine
        # (faces, mean, std, demo_poses) for GET /viewer; None = resolve
        # from the shipped flagship assets at first request (or 404 for
        # non-template meshes). Built lazily — most deployments never pay
        # the ~1 MB page build unless a browser actually asks for it.
        self._viewer_mesh = viewer_mesh
        self._viewer_page: bytes | None = None
        # optional latent prior for /sample prior="gmm" — fetched to host
        # once: sampling an 18-dim GMM is host work (sample_np), and
        # per-request device fetches/eager ops cost ~29 ms-seconds each
        # through the remote relay
        if gmm is not None:
            import jax

            gmm = jax.device_get(gmm)
        self.gmm = gmm
        self.stats = _Stats()
        self._device_lock = threading.Lock()
        self._inflight = 0
        self._inflight_cv = threading.Condition()
        self.draining = False  # set at shutdown: responses add Connection: close
        self._embed_b = self._decode_b = self._encode_b = None
        if micro_batch:
            self._embed_b = _MicroBatcher(
                self._locked(engine.encode_only_condition),
                engine.batch_size, name="embed",
            )
            self._decode_b = _MicroBatcher(
                self._locked(engine.decode), engine.batch_size, name="decode"
            )
            self._encode_b = _MicroBatcher(
                self._locked(engine.encode), engine.batch_size, name="encode"
            )
        cfg = engine.model.cfg
        ctx = engine.ctx
        self.info = {
            "status": "ok",
            "model": cfg.name,
            "num_verts": int(ctx.level_sizes[0]),
            "nz": cfg.nz,
            "nz_cond": cfg.nz_cond,
            "nz_cond2": cfg.nz_cond2,
            "cond_dim": cfg.cond_dim,
            "cond2_dim": cfg.cond2_dim,
            "batch_size": engine.batch_size,
            "compute_dtype": cfg.compute_dtype,
            "gmm_prior": gmm is not None,
        }

    def viewer_html(self) -> bytes:
        """The GET /viewer page: the WebGL renderer with this model's
        template mesh embedded and controls wired to POST /sample — the
        live replacement for the reference's windowed MeshViewers
        (reference demos.py:225-246). Raises ServerError when no mesh
        topology is known for this model (the transport maps it to 404)."""
        if self._viewer_page is not None:
            return self._viewer_page
        from cape_tpu.meshops.viewer import live_viewer_html

        cfg = self.engine.model.cfg
        # the live InferenceEngine carries the (device-order) template;
        # an artifact-served ExportedEngine ships no topology at all —
        # its duck-typed ctx has neither template_verts nor the
        # natural-order mapping, so fall through to assets (flagship) or
        # a clean 404 instead of an AttributeError->500
        template = None
        tv = getattr(self.engine.ctx, "template_verts", None)
        if tv is not None and hasattr(self.engine, "_to_natural_order"):
            import jax

            template = self.engine._to_natural_order(
                np.asarray(jax.device_get(tv), np.float32)[None]
            )[0]
        if self._viewer_mesh is not None:
            faces, mean, std, demo_poses = self._viewer_mesh
        elif self.info["num_verts"] == 6890:
            # flagship SMPL topology: everything ships in assets/
            from cape_tpu.meshops import assets
            from cape_tpu.smpl.joints import filter_cloth_pose

            averts, faces = assets.template_mesh()
            if template is None:
                template = np.asarray(averts, np.float32)  # natural order
            mean, std = assets.trainset_stats()
            poses = assets.demo_pose_params()
            raw = poses["rot"] if cfg.cond_dim % 9 == 0 else poses["pose"]
            demo_poses = (
                filter_cloth_pose(raw) if raw.shape[-1] != cfg.cond_dim else raw
            )
        else:
            raise ServerError(
                "no mesh topology known for this model — pass viewer_mesh="
                "(faces, mean, std, demo_poses) to ModelServer/serve()"
            )
        if template is None:
            raise ServerError(
                "this engine ships no mesh template (artifact-served "
                "non-flagship model) — /viewer needs a live engine or the "
                "flagship SMPL topology"
            )
        if demo_poses is None or np.asarray(demo_poses).size == 0:
            demo_poses = np.zeros((1, cfg.cond_dim), np.float32)
        demo_poses = np.asarray(demo_poses, np.float32)
        if demo_poses.ndim == 1:
            demo_poses = demo_poses[None]
        if demo_poses.shape[-1] != cfg.cond_dim:
            raise ServerError(
                f"viewer demo poses are {demo_poses.shape[-1]}-dim but the "
                f"model conditions on {cfg.cond_dim}"
            )
        self._viewer_page = live_viewer_html(
            template, faces, demo_poses, cfg.cond2_dim,
            has_gmm=self.gmm is not None, mean=mean, std=std,
            title=f"cape_tpu live viewer — {cfg.name}",
        ).encode()
        return self._viewer_page

    def warmup(self) -> float:
        """Compile every endpoint's fixed-batch executable up front so the
        first client request pays device compute, not a 30-300 s remote
        compile. One autoencode(sample=True) traces embed + encode +
        sampler + decode — the full jit surface the endpoints share
        (discriminate is not served). Returns elapsed seconds."""
        t0 = time.perf_counter()
        cfg = self.engine.model.cfg
        disp = np.zeros((1, self.info["num_verts"], 3), np.float32)
        pose = np.zeros((1, cfg.cond_dim), np.float32)
        clo = np.zeros((1, cfg.cond2_dim), np.float32)
        with self._device_lock:
            self.engine.autoencode(disp, pose, clo, sample=True)
            # the artifact engine's embed is a separate exported program
            # (not reached through autoencode's encode); compile it too
            self.engine.encode_only_condition(pose, clo)
        return time.perf_counter() - t0

    def _locked(self, fn):
        def call(*args):
            with self._device_lock:
                return fn(*args)

        return call

    def track_request(self):
        """Context manager the transport wraps around each request —
        spans parsing, device work, AND response serialization, so
        drain() can wait for complete responses, not just device calls."""
        return _RequestSpan(self)

    def drain(self, timeout: float = 30.0, grace: float = 0.25) -> bool:
        """Block until every in-flight request has fully completed
        (response bytes written), or the timeout passes. Call AFTER
        setting self.draining (responses then carry Connection: close, so
        kept-alive clients cannot pipeline drain-prolonging requests, and
        the closed accept loop admits no new connections). The grace
        re-check catches a request whose bytes arrived just before the
        count hit zero but whose handler had not yet entered its span.
        Idle keep-alive connections don't count — nothing of theirs is
        cut by exiting."""
        deadline = time.monotonic() + timeout
        while True:
            with self._inflight_cv:
                while self._inflight > 0:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        return False
                    self._inflight_cv.wait(remaining)
            time.sleep(grace)
            with self._inflight_cv:
                if self._inflight == 0:
                    return True

    def metrics_text(self) -> str:
        """Prometheus text exposition (version 0.0.4) of the same numbers
        /stats reports as JSON: request/error counters, latency quantiles
        over the ring window, micro-batch coalescing counters, and one
        cape_model_info gauge carrying the model identity labels."""
        esc = (
            lambda s: str(s)
            .replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")  # exposition format 0.0.4 label escaping
        )
        lines = [
            "# TYPE cape_requests_total counter",
            "# TYPE cape_request_errors_total counter",
            "# TYPE cape_request_latency_ms summary",
            "# TYPE cape_microbatch_requests_total counter",
            "# TYPE cape_microbatch_device_calls_total counter",
            "# TYPE cape_model_info gauge",
        ]
        info = self.info
        lines.append(
            'cape_model_info{model="%s",batch_size="%s",compute_dtype="%s"} 1'
            % (esc(info["model"]), info["batch_size"], esc(info["compute_dtype"]))
        )
        for ep, row in self.stats.snapshot().items():
            label = f'endpoint="{esc(ep)}"'
            lines.append("cape_requests_total{%s} %d" % (label, row["requests"]))
            lines.append(
                "cape_request_errors_total{%s} %d" % (label, row["errors"])
            )
            for q, key in (("0.5", "latency_ms_p50"), ("0.95", "latency_ms_p95")):
                if row[key] is not None:
                    lines.append(
                        'cape_request_latency_ms{%s,quantile="%s"} %s'
                        % (label, q, row[key])
                    )
        if self._decode_b is not None:
            for stage, b in (
                ("embed", self._embed_b),
                ("encode", self._encode_b),
                ("decode", self._decode_b),
            ):
                lines.append(
                    'cape_microbatch_requests_total{stage="%s"} %d'
                    % (stage, b.requests)
                )
                lines.append(
                    'cape_microbatch_device_calls_total{stage="%s"} %d'
                    % (stage, b.calls)
                )
        return "\n".join(lines) + "\n"

    def _embed_then_decode(self, z: np.ndarray, pose: np.ndarray, clo: np.ndarray):
        """The generation hot path (shared by /sample and /decode-with-z),
        micro-batched across concurrent requests when enabled. pose/clo may
        have 1 row for n z-rows: the condition net runs on the unique row
        and the embedding broadcasts host-side — one embed device call
        instead of ceil(n/batch) identical ones."""
        from cape_tpu.apps.inference import broadcast_conditions

        if self._embed_b is not None:
            y, y2 = self._embed_b.submit([pose, clo]).result()
        else:
            with self._device_lock:
                y, y2 = self.engine.encode_only_condition(pose, clo)
        y, y2 = broadcast_conditions(y, y2, len(z))
        zt = np.concatenate([z, y, y2], axis=-1)
        if self._decode_b is not None:
            (disp,) = self._decode_b.submit([zt, y, y2]).result()
            return disp
        with self._device_lock:
            return self.engine.decode(zt, y, y2)

    # ----------------------------------------------------------- handlers
    def _conditions(self, body: dict, n: int | None = None):
        cfg = self.engine.model.cfg
        pose = _as_array(body.get("pose"), "pose", 2, cfg.cond_dim)
        clo = _as_array(body.get("clo"), "clo", 2, cfg.cond2_dim)
        if n is not None:
            # rows may be 1 (broadcast over n samples) or n. Align pose/clo
            # to each other but do NOT tile to n here — _embed_then_decode
            # embeds the unique rows and broadcasts the embedding instead
            if pose.shape[0] not in (1, n) or clo.shape[0] not in (1, n):
                raise ServerError(
                    f"pose/clo rows ({pose.shape[0]}/{clo.shape[0]}) must be 1 or n={n}"
                )
            r = max(pose.shape[0], clo.shape[0])
            if pose.shape[0] != r:
                pose = np.repeat(pose, r, axis=0)
            if clo.shape[0] != r:
                clo = np.repeat(clo, r, axis=0)
        elif pose.shape[0] != clo.shape[0]:
            raise ServerError("pose and clo must have the same number of rows")
        return pose, clo

    def _disp(self, body: dict) -> np.ndarray:
        v = self.info["num_verts"]
        disp = _as_array(body.get("disp"), "disp", 3, 3)
        if v is not None and disp.shape[1] != v:
            raise ServerError(f"disp must be [N,{v},3], got {list(disp.shape)}")
        return disp

    def handle_encode(self, body: dict) -> dict:
        disp = self._disp(body)
        pose, clo = self._conditions(body)
        if pose.shape[0] != disp.shape[0]:
            raise ServerError("disp and pose must have the same number of rows")
        if self._encode_b is not None:
            z_mean, z_logvar, y, y2 = self._encode_b.submit([disp, pose, clo]).result()
        else:
            with self._device_lock:
                z_mean, z_logvar, y, y2 = self.engine.encode(disp, pose, clo)
        return {"z_mean": z_mean, "z_logvar": z_logvar, "y": y, "y2": y2}

    def handle_decode(self, body: dict) -> dict:
        cfg = self.engine.model.cfg
        if "z_total" in body:  # pre-embedded fast path (skip condition nets)
            zt = _as_array(
                body["z_total"], "z_total", 2, cfg.nz + cfg.nz_cond + cfg.nz_cond2
            )
            y = _as_array(body.get("y"), "y", 2, cfg.nz_cond)
            y2 = _as_array(body.get("y2"), "y2", 2, cfg.nz_cond2)
            n = zt.shape[0]
            # engine.decode broadcasts 1-row y/y2; any other mismatch would
            # silently pad/truncate inside the fixed-batch loop
            if y.shape[0] not in (1, n) or y2.shape[0] not in (1, n):
                raise ServerError(
                    f"y/y2 rows ({y.shape[0]}/{y2.shape[0]}) must be 1 or "
                    f"match z_total rows ({n})"
                )
            if self._decode_b is not None:
                from cape_tpu.apps.inference import broadcast_conditions

                y, y2 = broadcast_conditions(y, y2, n)  # rows must align
                (disp,) = self._decode_b.submit([zt, y, y2]).result()
            else:
                with self._device_lock:
                    disp = self.engine.decode(zt, y, y2)
            return {"disp": disp}
        z = _as_array(body.get("z"), "z", 2, cfg.nz)
        pose, clo = self._conditions(body, n=z.shape[0])
        return {"disp": self._embed_then_decode(z, pose, clo)}

    def handle_reconstruct(self, body: dict) -> dict:
        disp = self._disp(body)
        pose, clo = self._conditions(body)
        if pose.shape[0] != disp.shape[0]:
            raise ServerError("disp and pose must have the same number of rows")
        sample = bool(body.get("sample", False))
        # the integer seed goes straight into the engine's jitted sampler
        # (building a PRNGKey here would be an eager per-request dispatch)
        seed = _as_int(body, "seed", 0, min_value=0)
        if not sample and self._encode_b is not None:
            # deterministic path (z = posterior mean, inference.py:197-199):
            # per-row math, so it coalesces across requests like /encode +
            # /decode. sample=True stays on the engine path — its device
            # sampler takes one seed per CALL, and requests carry distinct
            # seeds, so coalescing would change which bits each row draws.
            z_mean, _, y, y2 = self._encode_b.submit([disp, pose, clo]).result()
            zt = np.concatenate([z_mean, y, y2], axis=-1)
            (out,) = self._decode_b.submit([zt, y, y2]).result()
            return {"disp": out}
        with self._device_lock:
            out = self.engine.autoencode(disp, pose, clo, rng=seed, sample=sample)
        return {"disp": out}

    def handle_sample(self, body: dict) -> dict:
        cfg = self.engine.model.cfg
        n = _as_int(body, "n", 1)
        if not 1 <= n <= 1024:
            raise ServerError("n must be in [1, 1024]")
        pose, clo = self._conditions(body, n=n)
        prior = body.get("prior", "normal")
        seed = _as_int(body, "seed", 0, min_value=0)
        if prior == "gmm":
            if self.gmm is None:
                raise ServerError("no GMM prior loaded on this server")
            z = self.gmm.sample_np(np.random.default_rng(seed), n)
            if z.shape[1] != cfg.nz:
                raise ServerError(
                    f"GMM prior is {z.shape[1]}-dim but model nz={cfg.nz}"
                )
        elif prior == "normal":
            z = np.random.default_rng(seed).standard_normal((n, cfg.nz)).astype(np.float32)
        else:
            raise ServerError(f"unknown prior {prior!r} (use 'normal' or 'gmm')")
        return {"disp": self._embed_then_decode(z, pose, clo), "z": z}

    # ------------------------------------------------------------ routing
    _POST = {
        "/encode": handle_encode,
        "/decode": handle_decode,
        "/reconstruct": handle_reconstruct,
        "/sample": handle_sample,
    }

    def handle(
        self, method: str, path: str, body: dict | None, raw: bool = False
    ) -> tuple[int, dict]:
        """(method, path, parsed body) -> (http status, response dict).
        raw=True leaves arrays as numpy (binary npz responses); errors and
        GET endpoints are plain dicts either way."""
        t0 = time.perf_counter()
        ok = True
        # stats key: fixed label for unknown paths so arbitrary client
        # request paths cannot grow the stats dicts without bound
        ep = f"{method} {path}"
        try:
            if method == "GET" and path == "/health":
                return 200, dict(self.info)
            if method == "GET" and path == "/stats":
                snap = self.stats.snapshot()
                if self._decode_b is not None:
                    snap["(micro_batch)"] = {
                        "embed_calls": self._embed_b.calls,
                        "embed_requests": self._embed_b.requests,
                        "encode_calls": self._encode_b.calls,
                        "encode_requests": self._encode_b.requests,
                        "decode_calls": self._decode_b.calls,
                        "decode_requests": self._decode_b.requests,
                    }
                return 200, snap
            fn = self._POST.get(path) if method == "POST" else None
            if fn is None:
                ok = False
                ep = "(unrouted)"
                return 404, {"error": f"no route {method} {path}"}
            out = fn(self, body or {})
            if raw:
                return 200, out
            return 200, {
                k: (v.tolist() if isinstance(v, np.ndarray) else v)
                for k, v in out.items()
            }
        except ServerError as e:
            ok = False
            return 400, {"error": str(e)}
        except Exception as e:  # surface, don't kill the server thread
            ok = False
            return 500, {"error": f"{type(e).__name__}: {e}"}
        finally:
            self.stats.record(ep, 1000.0 * (time.perf_counter() - t0), ok)


def _make_handler(server: ModelServer):
    class Handler(BaseHTTPRequestHandler):
        # ThreadingHTTPServer default is HTTP/1.0-style close-per-request;
        # keep-alive matters for latency-sensitive clients
        protocol_version = "HTTP/1.1"
        # reap dead/stalled connections: without a socket timeout a client
        # that stops sending mid-body pins its handler thread forever
        timeout = 300

        def log_message(self, fmt, *args):  # route through stats, not stderr
            pass

        def _reply(self, status: int, payload: dict):
            data = json.dumps(payload).encode()
            self._reply_bytes(status, data, "application/json")

        def _reply_bytes(self, status: int, data: bytes, ctype: str):
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            if server.draining:
                # shutting down: finish this response, then close so a
                # kept-alive client cannot pipeline drain-prolonging
                # requests (drain() relies on this bound)
                self.send_header("Connection", "close")
                self.close_connection = True
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            with server.track_request():
                self._do_get()

        def do_POST(self):
            with server.track_request():
                self._do_post()

        def _do_get(self):
            if self.path == "/metrics":  # Prometheus scrape: plain text,
                # not recorded in stats (a 15 s scrape would flood the
                # latency ring the endpoint itself reports)
                self._reply_bytes(
                    200, server.metrics_text().encode(),
                    "text/plain; version=0.0.4",
                )
                return
            if self.path == "/viewer":  # interactive WebGL page wired to
                # POST /sample (the /sample calls it triggers are recorded
                # in stats; the static page fetch itself is not)
                try:
                    self._reply_bytes(
                        200, server.viewer_html(), "text/html; charset=utf-8"
                    )
                except ServerError as e:
                    self._reply(404, {"error": str(e)})
                return
            status, payload = server.handle("GET", self.path, None)
            self._reply(status, payload)

        def _do_post(self):
            is_npz_req = NPZ_CONTENT_TYPE in (self.headers.get("Content-Type") or "")
            wants_npz = is_npz_req or (
                NPZ_CONTENT_TYPE in (self.headers.get("Accept") or "")
            )
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length < 0 or length > 512 << 20:
                    # the unread body would desync a kept-alive connection
                    # (its bytes would parse as the next request line); a
                    # negative length would make read() block until EOF
                    self.close_connection = True
                    self._reply(413, {"error": "request body too large"})
                    return
                raw = self.rfile.read(length)
                if is_npz_req:
                    body = _npz_to_body(raw) if raw else {}
                else:
                    body = json.loads(raw) if raw else {}
                if not isinstance(body, dict):
                    raise ValueError("body must be a JSON object")
            except (ValueError, UnicodeDecodeError) as e:
                kind = "npz" if is_npz_req else "JSON"
                self._reply(400, {"error": f"bad {kind} body: {e}"})
                return
            status, payload = server.handle("POST", self.path, body, raw=wants_npz)
            if wants_npz and status == 200:
                self._reply_bytes(status, _body_to_npz(payload), NPZ_CONTENT_TYPE)
            else:
                self._reply(status, payload)

    return Handler


def serve(
    engine: InferenceEngine, host: str = "127.0.0.1", port: int = 8080,
    gmm=None, micro_batch: bool = True, viewer_mesh: tuple | None = None,
) -> tuple[ThreadingHTTPServer, ModelServer]:
    """Bind and return (httpd, model_server); caller runs
    httpd.serve_forever() (or spawns a thread — see tests/test_server.py)."""
    ms = ModelServer(
        engine, gmm=gmm, micro_batch=micro_batch, viewer_mesh=viewer_mesh
    )
    httpd = ThreadingHTTPServer((host, port), _make_handler(ms))
    return httpd, ms


def main(argv=None):
    """python -m cape_tpu.apps.server --config configs/<preset>.yaml
         --name run1 [--host H] [--port P]
       python -m cape_tpu.apps.server --artifact model.capex [--host H] ...

    Restores the latest checkpoint for --name (like `main.py --mode demo`)
    and serves it; --fresh-init serves untrained params (smoke tests).
    With --artifact, serves an AOT export (tools/export_model.py) instead
    — no config, checkpoint, or model-building code involved."""
    import argparse
    import sys

    import jax

    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--fresh-init", action="store_true")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--no-micro-batch", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="jax runtime platform (e.g. cpu — serve an artifact "
                         "on a CPU host; artifacts carry cpu+tpu lowerings)")
    ap.add_argument("--workdir", default="results")
    ap.add_argument("--artifact", default=None,
                    help="serve a .capex export instead of a checkpoint")
    own, rest = ap.parse_known_args(argv)
    if own.platform:
        jax.config.update("jax_platforms", own.platform)

    if own.artifact:
        # checkpoint-mode flags (batch size, mesh, config, --fresh-init,
        # --workdir, ...) cannot apply to a baked artifact; silently
        # ignoring them would let an operator believe they configured
        # something (e.g. --fresh-init "smoke server" quietly serving the
        # artifact's baked trained params)
        if own.fresh_init:
            rest = ["--fresh-init"] + rest
        if own.workdir != "results":
            rest = ["--workdir", own.workdir] + rest
        if rest:
            print(f"error: unsupported flags with --artifact: {rest}", file=sys.stderr)
            sys.exit(2)
        from cape_tpu.tools.export_model import ExportedEngine, ExportedModel

        engine = ExportedEngine(ExportedModel.load(own.artifact))
        name = engine.model.cfg.name
    else:
        from cape_tpu.apps.main import build_context, restore_params
        from cape_tpu.core.config import parse_cli
        from cape_tpu.models.cape import CAPE

        cfg = parse_cli(rest)
        if not cfg.name:
            print("error: --name is required", file=sys.stderr)
            sys.exit(2)

        model = CAPE(cfg)
        ctx = build_context(cfg)
        if own.fresh_init:
            params = jax.jit(model.init_params)(jax.random.PRNGKey(cfg.seed), ctx)
        else:
            params = restore_params(cfg, model, ctx, own.workdir)
        # --data_parallel N > 1: one server process drives an N-device mesh
        # (batch axis sharded, batch_size rows per device) for bulk
        # throughput; the default stays single-device — latency-oriented
        # scale-out is process-per-chip behind a load balancer
        dp = None
        if cfg.data_parallel > 1:
            from cape_tpu.parallel.mesh import DataParallel

            dp = DataParallel(cfg.data_parallel)
            print(f"serving over a {dp.num_devices}-device mesh", flush=True)
        engine = InferenceEngine(model, ctx, params, cfg.batch_size, dp=dp)
        name = cfg.name

    gmm = None
    if engine.model.cfg.nz == 18:  # the pretrained prior's dimensionality
        try:
            from cape_tpu.models.gmm import GMM

            gmm = GMM.load_pretrained()
        except Exception as e:
            print(f"GMM prior unavailable ({e}); /sample prior='gmm' disabled")

    httpd, ms = serve(
        engine, own.host, own.port, gmm=gmm, micro_batch=not own.no_micro_batch
    )

    # graceful shutdown: SIGTERM (orchestrator stop) and SIGINT stop the
    # accept loop from a side thread (calling httpd.shutdown() from the
    # signal handler's thread would deadlock serve_forever); before the
    # socket closes, ms.drain() waits for every in-flight request to
    # finish — device compute and response serialization (handler threads
    # are daemons; without the drain, interpreter exit would cut them
    # mid-response). Registered BEFORE the port is announced: an
    # orchestrator may stop us the moment it sees the server as up
    import signal

    def _stop(signum, frame):
        print(f"received signal {signum}: draining", flush=True)
        ms.draining = True  # before shutdown: responses now close connections
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _stop)
    signal.signal(signal.SIGINT, _stop)

    if not own.no_warmup:
        print("warming up (compiling endpoint executables)...", flush=True)
        print(f"warmup done in {ms.warmup():.1f}s", flush=True)
    # report the BOUND port (--port 0 asks the OS for a free one)
    print(
        f"serving {name} on http://{own.host}:{httpd.server_address[1]}",
        flush=True,
    )
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        ms.draining = True  # also on non-signal exits (KeyboardInterrupt)
        if not ms.drain(timeout=30.0):
            print("drain timed out with requests in flight", flush=True)
        httpd.server_close()
        print("server closed", flush=True)


if __name__ == "__main__":
    main()
