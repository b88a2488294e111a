"""AOT model export: a single-file serving artifact via jax.export.

`jax.export` lowers a jitted function ahead of time to platform-tagged
StableHLO that `jax.export.deserialize` can run with **no model code** —
deployment needs jax plus the artifact, nothing from cape_tpu. Parameters
and graph constants (banded Laplacian blocks, pool/unpool matrices,
vertex permutation) are baked in as program constants, so one file is the
whole model. This is the serving-deployment story the reference lacks
entirely: its inference helpers re-open a TF session restoring a
checkpoint that must sit next to the model-building code
(lib/models.py:209-215, run_simple_demo.py:1-49).

Artifact layout (a zip, suggested suffix `.capex`):
  meta.json     model identity + dims + batch size + wire contract
  embed.shlo    (pose [B,cond_dim], clo [B,cond2_dim]) -> (y, y2)
  encode.shlo   (disp [B,V,3], pose, clo) -> (z_mean, z_logvar, y, y2)
  decode.shlo   (z_total [B,nz+nzc+nzc2], y, y2) -> disp [B,V,3]

The wire contract matches `InferenceEngine`: displacements are in the
dataset's z-scored space and **natural template vertex order** — the RCM
device permutation is folded into the exported programs, so consumers
never see device order. Shapes are fixed at the export batch size (the
same fixed-batch design the server uses; pad client-side).

Functions are exported for both "cpu" and "tpu" lowering platforms by
default, so one artifact serves locally and on-chip.
"""

from __future__ import annotations

import json
import zipfile

import numpy as np

from cape_tpu.apps.inference import BatchedCalls, broadcast_conditions


_FNS = ("embed", "encode", "decode")

# weight-matrix keys eligible for int8 quantization ("w": Chebyshev
# filterbanks [K,Fin,Fout], "kernel": dense layers [Fin,Fout]); biases,
# norm parameters, and the per-vertex output bias stay float — their
# error would add directly to the output instead of averaging out over
# a contraction
_QUANT_KEYS = ("w", "kernel")


def quantize_params(params, min_size: int = 1024):
    """Weight-only int8, symmetric per-output-channel.

    Returns a params-shaped pytree where each eligible weight leaf is
    replaced by {"int8": int8 array, "scale": f32 [Fout]} with
    scale = max|w| over all non-last axes / 127 (so w ~= int8 * scale).
    `dequantize_params` inverts it inside the exported program; leaves
    smaller than min_size stay float (no traffic to save)."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                arr = np.asarray(v) if not isinstance(v, dict) else None
                if (
                    k in _QUANT_KEYS
                    and arr is not None
                    and np.issubdtype(arr.dtype, np.floating)
                    and arr.ndim >= 2
                    and arr.size >= min_size
                ):
                    a = arr.astype(np.float32)
                    scale = np.max(
                        np.abs(a), axis=tuple(range(a.ndim - 1))
                    ) / 127.0
                    scale = np.maximum(scale, np.finfo(np.float32).tiny)
                    q = np.clip(np.rint(a / scale), -127, 127).astype(np.int8)
                    out[k] = {"int8": q, "scale": scale.astype(np.float32)}
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)


def dequantize_params(params):
    """Trace-time inverse of quantize_params: int8 leaves dequantize to
    f32 **through jax.lax.optimization_barrier**, which stops XLA from
    constant-folding int8 * scale back into a full-width f32 constant —
    the int8 table is what lives in HBM; the multiply runs on-chip."""
    import jax
    import jax.numpy as jnp

    def is_q(x):
        return isinstance(x, dict) and set(x) == {"int8", "scale"}

    def deq(x):
        if not is_q(x):
            return x
        q = jax.lax.optimization_barrier(jnp.asarray(x["int8"]))
        return q.astype(jnp.float32) * x["scale"]

    return jax.tree.map(deq, params, is_leaf=is_q)


def build_export_fns(model, ctx, params, batch_size: int):
    """The three serving closures with params/ctx/permutation baked in.

    Unlike the live jit path (where closing over ctx is banned because
    remote-compile uploads of inlined constants hit HTTP 413 — CLAUDE.md),
    AOT export *wants* the constants inlined: that is what makes the
    artifact self-contained. Lowering is local, so no upload occurs.
    """
    import jax.numpy as jnp

    perm = ctx.vertex_perm
    inv_perm = None
    if perm is not None:
        inv_perm = np.empty_like(perm)
        inv_perm[perm] = np.arange(len(perm))
        perm = jnp.asarray(perm)
        inv_perm = jnp.asarray(inv_perm)

    def embed(pose, clo):
        return model.embed_conditions(dequantize_params(params), pose, clo)

    def encode(disp, pose, clo):
        p = dequantize_params(params)
        y, y2 = model.embed_conditions(p, pose, clo)
        if perm is not None:
            disp = disp[:, perm]
        z_mean, z_logvar = model.encode(p, ctx, disp, y, y2)
        return z_mean, z_logvar, y, y2

    def decode(z_total, y, y2):
        out = model.decode(dequantize_params(params), ctx, z_total, y, y2)
        if inv_perm is not None:
            out = out[:, inv_perm]
        return out

    cfg = model.cfg
    B, V = batch_size, int(ctx.level_sizes[0])
    f32 = np.float32
    specs = {
        "embed": ((B, cfg.cond_dim), (B, cfg.cond2_dim)),
        "encode": ((B, V, 3), (B, cfg.cond_dim), (B, cfg.cond2_dim)),
        "decode": (
            (B, cfg.nz + cfg.nz_cond + cfg.nz_cond2),
            (B, cfg.nz_cond),
            (B, cfg.nz_cond2),
        ),
    }
    import jax

    specs = {
        k: tuple(jax.ShapeDtypeStruct(s, f32) for s in v) for k, v in specs.items()
    }
    return {"embed": embed, "encode": encode, "decode": decode}, specs


def export_model(
    model, ctx, params, batch_size: int, out_path: str,
    platforms=("cpu", "tpu"), symbolic_batch: bool = False,
    quantize: str | None = None, constants_dtype: str | None = None,
) -> dict:
    """Write the artifact zip; returns the meta dict.

    symbolic_batch=True lowers the batch dimension as a jax.export
    symbolic shape: one artifact runs at ANY batch size (each distinct
    size still compiles once at load time). batch_size is then only the
    suggested serving batch recorded in meta. Requires the ctx built with
    use_pallas=False — the Pallas routing gate compares batch*channels
    against a threshold, which is inconclusive for a symbolic dim (and a
    Pallas custom-call would not be portable to the cpu lowering anyway;
    the CLI forces this).

    Compression knobs (both shrink the artifact AND the serving-time HBM
    weight/constant traffic — the baked tables are what the chip reads):
      quantize="int8"   weight matrices become symmetric per-channel int8
                        with an on-chip dequant multiply (quantize_params)
      constants_dtype="bfloat16"  graph constants (banded Laplacian
                        blocks, pool/unpool tables) bake at bf16 — for a
                        compute_dtype=bfloat16 model this is numerically
                        IDENTICAL to the live path, which casts the same
                        f32 constants to bf16 at trace time
    """
    import jax
    from jax import export as jexport

    if quantize not in (None, "int8"):
        raise ValueError(f"unsupported quantize mode {quantize!r}")
    if quantize == "int8":
        params = quantize_params(params)
    if constants_dtype:
        import jax.numpy as jnp

        cd = jnp.dtype(constants_dtype)
        ctx = jax.tree.map(
            lambda a: a.astype(cd)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            ctx,
        )
    fns, specs = build_export_fns(model, ctx, params, batch_size)
    if symbolic_batch:
        (b,) = jexport.symbolic_shape("b")
        specs = {
            k: tuple(
                jax.ShapeDtypeStruct((b,) + s.shape[1:], s.dtype) for s in v
            )
            for k, v in specs.items()
        }
    cfg = model.cfg
    meta = {
        "format": "cape_tpu.export/1",
        "model": cfg.name,
        "batch_size": batch_size,
        "symbolic_batch": bool(symbolic_batch),
        "num_verts": int(ctx.level_sizes[0]),
        "quantize": quantize,
        "constants_dtype": constants_dtype,
        "nz": cfg.nz,
        "nz_cond": cfg.nz_cond,
        "nz_cond2": cfg.nz_cond2,
        "cond_dim": cfg.cond_dim,
        "cond2_dim": cfg.cond2_dim,
        "compute_dtype": cfg.compute_dtype,
        "platforms": list(platforms),
        "contract": "z-scored displacements, natural template vertex order",
    }
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=2))
        for name in _FNS:
            exp = jexport.export(jax.jit(fns[name]), platforms=list(platforms))(
                *specs[name]
            )
            zf.writestr(f"{name}.shlo", exp.serialize())
    return meta


class ExportedModel:
    """Loader/runner for the artifact. Imports only jax + stdlib — usable
    from a deployment image that does not ship cape_tpu."""

    def __init__(self, meta: dict, calls: dict):
        self.meta = meta
        self._calls = calls

    @classmethod
    def load(cls, path: str) -> "ExportedModel":
        import jax
        from jax import export as jexport

        with zipfile.ZipFile(path) as zf:
            meta = json.loads(zf.read("meta.json"))
            if meta.get("format") != "cape_tpu.export/1":
                raise ValueError(f"not a cape_tpu export artifact: {path}")
            calls = {
                name: jax.jit(jexport.deserialize(zf.read(f"{name}.shlo")).call)
                for name in _FNS
            }
        return cls(meta, calls)

    def _run(self, name, *args):
        import jax

        out = self._calls[name](*[np.asarray(a, np.float32) for a in args])
        out = out if isinstance(out, tuple) else (out,)
        return tuple(np.asarray(x) for x in jax.device_get(out))

    def embed(self, pose, clo):
        return self._run("embed", pose, clo)

    def encode(self, disp, pose, clo):
        return self._run("encode", disp, pose, clo)

    def decode(self, z_total, y, y2):
        (out,) = self._run("decode", z_total, y, y2)
        return out


class ExportedEngine(BatchedCalls):
    """InferenceEngine-compatible facade over an ExportedModel, so the
    model server can serve a `.capex` artifact directly
    (`python -m cape_tpu.apps.server --artifact model.capex`): deployment
    is the artifact plus the server process — no config, no checkpoint,
    no model-building code. Same wire contract as the live engine."""

    def __init__(self, em: ExportedModel):
        from types import SimpleNamespace

        self.em = em
        m = em.meta
        self.batch_size = int(m["batch_size"])
        # duck-typed surface ModelServer reads for /health
        self.model = SimpleNamespace(
            cfg=SimpleNamespace(
                name=m["model"], nz=m["nz"], nz_cond=m["nz_cond"],
                nz_cond2=m["nz_cond2"], cond_dim=m["cond_dim"],
                cond2_dim=m["cond2_dim"], compute_dtype=m["compute_dtype"],
            )
        )
        self.ctx = SimpleNamespace(level_sizes=[m["num_verts"]])

    def encode_only_condition(self, pose, clo):
        return self._batched(
            self.em._calls["embed"], len(pose),
            np.asarray(pose, np.float32), np.asarray(clo, np.float32),
        )

    def encode(self, disp, pose, clo):
        return self._batched(
            self.em._calls["encode"], len(disp),
            np.asarray(disp, np.float32), np.asarray(pose, np.float32),
            np.asarray(clo, np.float32),
        )

    def decode(self, z_total, y, y2):
        z_total = np.asarray(z_total, np.float32)
        n = len(z_total)
        y, y2 = broadcast_conditions(y, y2, n)
        (out,) = self._batched(self.em._calls["decode"], n, z_total, y, y2)
        return out

    def autoencode(self, disp, pose, clo, rng=None, sample: bool = False):
        z_mean, z_logvar, y, y2 = self.encode(disp, pose, clo)
        if sample:
            # host-side reparameterization (the artifact ships no sampler);
            # same clamp as CAPE.sample_z, numpy RNG seeded from the key
            seed = 0
            if rng is not None:
                import jax

                seed = int(np.asarray(jax.device_get(rng)).ravel()[-1])
            eps = np.random.default_rng(seed).standard_normal(z_mean.shape)
            z = z_mean + np.exp(0.5 * np.clip(z_logvar, -30.0, 30.0)) * eps
            z = z.astype(np.float32)
        else:
            z = z_mean
        z_total = np.concatenate([z, y, y2], axis=-1)
        return self.decode(z_total, y, y2)


def main(argv=None):
    """python -m cape_tpu.tools.export_model --config <preset> --name run1
         --out model.capex [--batch_size B] [--fresh-init] [--platform cpu]
    """
    import argparse
    import sys

    import jax

    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--out", required=True)
    ap.add_argument("--fresh-init", action="store_true")
    ap.add_argument("--workdir", default="results")
    ap.add_argument("--platform", default=None,
                    help="jax runtime platform for param restore (e.g. cpu)")
    ap.add_argument("--export-platforms", default="cpu,tpu")
    ap.add_argument("--symbolic-batch", action="store_true",
                    help="lower the batch dim symbolically: one artifact, any batch size")
    ap.add_argument("--quantize", default=None, choices=["int8"],
                    help="weight-only int8 (symmetric per-channel, on-chip dequant)")
    ap.add_argument("--constants-dtype", default=None,
                    help="bake graph constants at this dtype (e.g. bfloat16)")
    own, rest = ap.parse_known_args(argv)
    if own.platform:
        jax.config.update("jax_platforms", own.platform)

    from cape_tpu.apps.main import build_context, restore_params
    from cape_tpu.core.config import parse_cli
    from cape_tpu.models.cape import CAPE

    cfg = parse_cli(rest)
    # exported programs must lower on every target platform: the Pallas
    # kernels are TPU custom calls (unportable to the cpu lowering), and
    # their routing gate is inconclusive under a symbolic batch dim
    cfg = cfg.replace(use_pallas=False)
    if not cfg.name:
        print("error: --name is required", file=sys.stderr)
        sys.exit(2)
    model = CAPE(cfg)
    ctx = build_context(cfg)
    if own.fresh_init:
        params = jax.jit(model.init_params)(jax.random.PRNGKey(cfg.seed), ctx)
    else:
        params = restore_params(cfg, model, ctx, own.workdir)
    params = jax.device_get(params)  # constants come from host memory

    meta = export_model(
        model, ctx, params, cfg.batch_size, own.out,
        platforms=tuple(p for p in own.export_platforms.split(",") if p),
        symbolic_batch=own.symbolic_batch,
        quantize=own.quantize, constants_dtype=own.constants_dtype,
    )
    import os

    print(
        f"exported {meta['model']} (batch {meta['batch_size']}, "
        f"platforms {meta['platforms']}) -> {own.out} "
        f"({os.path.getsize(own.out) / 1e6:.1f} MB)"
    )


if __name__ == "__main__":
    main()
