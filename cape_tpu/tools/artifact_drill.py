"""Artifact-landing drill: the full real-data pipeline, end to end, today.

The reference's production journeys (README.md:14-35, 61-96) are
pack -> train -> evaluate and published-checkpoint -> convert -> demo.
Their final validation is gated on licensed artifacts (real CAPE dataset,
SMPL .pkl, published TF checkpoints; docs/ROADMAP.md). This drill proves
every stage HANDS OFF to the next — running the identical commands with
synthetic stand-ins wherever an artifact is missing — so that on the day
artifacts land, the same invocation with real paths is all that's needed:

  python -m cape_tpu.tools.artifact_drill --workdir /tmp/drill \
      [--raw <cape_release_dir>]   # else: fabricates a tiny raw tree
      [--tf_ckpt <ckpt path>]      # else: fabricates reference-named vars
      [--epochs N] [--threshold_mm X]

Stages (each prints one `DRILL <stage> ok` line; exits nonzero on the
first failure):
  pack    raw release tree -> packed dataset (data.packer.create_dataset)
  train   packed dataset -> Trainer.fit -> checkpoints under workdir
  accept  tools.acceptance against the packed test split + checkpoint
  convert TF variables -> cape_tpu params .npz (tools.tf_ckpt_converter)
  demo    simple demo CLI from the converted .npz (apps.simple_demo)
  deploy  trained checkpoint -> compressed .capex export -> model server
          -> client /sample round trip (tools.export_model, apps.server)

With no --raw/--tf_ckpt this is a CI-mode smoke of the glue (the
acceptance metric is then judged against a pass-anything threshold; the
REAL thresholds are 6.1 mm male / 3.7 mm female, BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def fabricate_raw_cape(
    root: str,
    verts: np.ndarray,
    subj: str = "00032",
    seqs: tuple = ("drill_a", "drill_b"),
    cloths: tuple = ("longlong", "shortlong"),
    n_frames: int = 10,
    seed: int = 0,
) -> None:
    """A minimal raw-release tree in the packer's expected layout
    (sequences/<subj>/<cloth>_<seq>/*.npz + minimal_body_shape), with
    frames on the real template so the SMPL pyramid applies."""
    rng = np.random.default_rng(seed)
    minimal = np.asarray(verts, np.float64)
    os.makedirs(os.path.join(root, "minimal_body_shape", subj), exist_ok=True)
    np.save(
        os.path.join(root, "minimal_body_shape", subj, f"{subj}_minimal.npy"),
        minimal,
    )
    for seq in seqs:
        for cloth in cloths:
            d = os.path.join(root, "sequences", subj, f"{cloth}_{seq}")
            os.makedirs(d, exist_ok=True)
            for i in range(n_frames):
                np.savez(
                    os.path.join(d, f"frame_{i:04d}.npz"),
                    pose=0.3 * rng.standard_normal(72),
                    v_cano=minimal + 0.005 * rng.standard_normal(minimal.shape),
                )


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="CAPE artifact-landing drill")
    p.add_argument("--workdir", required=True)
    p.add_argument("--raw", default=None, help="real CAPE release dir (else fabricate)")
    p.add_argument("--tf_ckpt", default=None, help="published TF checkpoint (else fabricate)")
    p.add_argument("--config", default="configs/CAPE-affineconv_nz64_pose32_clotype32_male.yaml")
    p.add_argument("--gender", default="male")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--threshold_mm", type=float, default=None,
                   help="acceptance gate; default: pass-anything in drill "
                        "mode, the real per-gender threshold with --raw")
    args = p.parse_args(argv)

    import jax

    from cape_tpu.core.config import load_config
    from cape_tpu.data.dataset_configs import dataset_config_dicts
    from cape_tpu.data.loader import BodyData
    from cape_tpu.data.packer import create_dataset
    from cape_tpu.meshops import assets
    from cape_tpu.models.cape import CAPE
    from cape_tpu.apps.main import build_context
    from cape_tpu.train.loop import Trainer

    workdir = os.path.abspath(args.workdir)
    os.makedirs(workdir, exist_ok=True)
    datadir_root = os.path.join(workdir, "datasets")
    drill_mode = args.raw is None
    name = "drill_run"

    cfg = load_config(
        args.config, name=name, gender=args.gender,
        num_epochs=args.epochs, batch_size=args.batch_size,
    )

    # ------------------------------------------------------------- 1. pack
    raw = args.raw
    split = dict(dataset_config_dicts[args.gender])
    if drill_mode:
        raw = os.path.join(workdir, "raw_standin")
        verts, _ = assets.template_mesh()
        fabricate_raw_cape(raw, verts)
        split.update(
            train_subjs=["00032"], test_subjs=["00032"],
            train_seqs=["drill_a"], test_seqs=["drill_b"],
            train_cloth=["longlong", "shortlong"],
            test_cloth=["longlong", "shortlong"],
        )
    n_train = create_dataset("train", split, raw, cfg.dataset, datadir_root)
    n_test = create_dataset("test", split, raw, cfg.dataset, datadir_root)
    assert n_train > 0 and n_test > 0, (n_train, n_test)
    print(f"DRILL pack ok: {n_train} train / {n_test} test frames", flush=True)

    # ------------------------------------------------------------ 2. train
    data = BodyData.from_packed(
        os.path.join(datadir_root, cfg.dataset), pose_type=cfg.pose_type,
        n_val=100 if not drill_mode else 4,
    )
    model = CAPE(cfg)
    ctx = build_context(cfg)
    trainer = Trainer(cfg, model, ctx, data, workdir=workdir)
    val_losses, _ = trainer.fit()
    assert np.all(np.isfinite(val_losses)), val_losses
    print(f"DRILL train ok: val recon {val_losses[-1]:.4f}", flush=True)

    # ----------------------------------------------------------- 3. accept
    from cape_tpu.tools import acceptance

    accept_args = [
        "--config", args.config, "--name", name,
        "--datadir_root", datadir_root, "--workdir", workdir,
        "--gender", args.gender,   # threshold selection must match training
    ]
    if args.threshold_mm is not None:
        accept_args += ["--threshold_mm", str(args.threshold_mm)]
    elif drill_mode:
        accept_args += ["--threshold_mm", "1e9"]  # plumbing smoke only
    try:
        acceptance.main(accept_args)
    except SystemExit as e:
        assert e.code == 0, f"acceptance gate failed (exit {e.code})"
    print("DRILL accept ok", flush=True)

    # ---------------------------------------------------------- 4. convert
    from cape_tpu.tools.tf_ckpt_converter import (
        convert, synthesize_reference_vars, verify_against_template,
    )
    from cape_tpu.train.checkpoint import flatten_tree

    from cape_tpu.tools.tf_ckpt_converter import (
        _permute_flat_vertex_axis, read_tf_checkpoint,
    )

    # perm handling must mirror tf_ckpt_converter.main: only the banded
    # runtime stores per-vertex params in RCM/coarse order; ell-mode
    # configs stay natural and must NOT be permuted.
    perm = ctx.vertex_perm
    coarse_perm = None
    if cfg.op_mode == "banded":
        from cape_tpu.meshops.ordering import pyramid_orderings
        from cape_tpu.meshops.pyramid import load_or_build as _load_pyr

        coarse_perm = pyramid_orderings(_load_pyr(cfg.ds_factors))[-1]

    if args.tf_ckpt is not None:
        tfvars = read_tf_checkpoint(args.tf_ckpt)
    else:
        ref_params = jax.device_get(
            jax.jit(model.init_params)(jax.random.PRNGKey(7), ctx)
        )
        tfvars = synthesize_reference_vars(ref_params, cfg)
        if perm is not None:
            # real checkpoints store every vertex-indexed quantity in
            # NATURAL order: un-permute the out bias and the flattened-
            # coarse-vertex axes of the fc heads so the fabricated
            # checkpoint is exactly what the published archive would hold
            inv = np.empty_like(perm)
            inv[perm] = np.arange(len(perm))
            inv_c = np.empty_like(coarse_perm)
            inv_c[coarse_perm] = np.arange(len(coarse_perm))
            tfvars["generator/decoder/outputs/bias"] = np.asarray(
                ref_params["generator"]["decoder"]["out"]["b"]
            )[inv][None]
            for head in ("fc_mean", "fc_var"):
                k = f"generator/encoder/{head}/dense/kernel"
                tfvars[k] = _permute_flat_vertex_axis(tfvars[k], inv_c, axis=0)
            tfvars["generator/decoder/fc1/dense/kernel"] = _permute_flat_vertex_axis(
                tfvars["generator/decoder/fc1/dense/kernel"], inv_c, axis=1
            )
            tfvars["generator/decoder/fc1/dense/bias"] = _permute_flat_vertex_axis(
                tfvars["generator/decoder/fc1/dense/bias"], inv_c, axis=0
            )
        # write + read back a REAL tf.train.Saver file when TF is available
        # (the exact journey of checkpoint-landing day); else stay in-memory
        try:
            from cape_tpu.tools.tf_ckpt_converter import write_tf_checkpoint

            saved = write_tf_checkpoint(
                tfvars, os.path.join(workdir, "tf_standin", "model"),
                global_step=100, fake_slots=True,
            )
            tfvars = read_tf_checkpoint(saved)
            print(f"DRILL convert: via real TF Saver file {saved}", flush=True)
        except ImportError:
            print("DRILL convert: TF unavailable, in-memory variables", flush=True)
    converted = convert(tfvars, cfg, vertex_perm=perm, coarse_perm=coarse_perm)
    verify_against_template(converted, model, ctx)
    npz_path = os.path.join(workdir, "converted_params.npz")
    np.savez(npz_path, **flatten_tree(converted))
    print(f"DRILL convert ok: {npz_path}", flush=True)

    # ------------------------------------------------------------- 5. demo
    from cape_tpu.apps import simple_demo

    demo_dir = os.path.join(workdir, "demo_results")
    simple_demo.main(
        ["--config", args.config, "--params", npz_path, "--results_dir", demo_dir]
    )
    objs = []
    for root, _, files in os.walk(demo_dir):
        objs += [f for f in files if f.endswith(".obj")]
    assert objs, f"demo produced no meshes under {demo_dir}"
    print(f"DRILL demo ok: {len(objs)} meshes", flush=True)

    # ----------------------------------------------------------- 6. deploy
    # trained checkpoint -> compressed single-file artifact -> served over
    # HTTP -> client round trip: the deployment handoff, end to end
    import threading

    from cape_tpu.apps.client import CapeClient
    from cape_tpu.apps.server import serve
    from cape_tpu.tools import export_model as export_cli
    from cape_tpu.tools.export_model import ExportedEngine, ExportedModel

    capex = os.path.join(workdir, f"{name}.capex")
    # the operator invocation, like the accept/demo stages (the CLI owns
    # the restore glue and the portable-XLA-path pin)
    export_cli.main([
        "--out", capex, "--workdir", workdir,
        "--quantize", "int8", "--constants-dtype", "bfloat16",
        "--config", args.config, "--name", name, "--gender", args.gender,
        "--batch_size", str(args.batch_size),
        "--num_epochs", str(args.epochs),  # cfg must re-derive identically
    ])
    engine = ExportedEngine(ExportedModel.load(capex))
    httpd, ms = serve(engine, "127.0.0.1", 0)
    ms.warmup()
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        client = CapeClient(f"http://127.0.0.1:{httpd.server_address[1]}")
        disp, z = client.sample(
            np.zeros((1, cfg.cond_dim), np.float32),
            np.eye(cfg.cond2_dim, dtype=np.float32)[:1], n=2, seed=0,
        )
        assert disp.shape == (2, int(engine.ctx.level_sizes[0]), 3), disp.shape
        assert np.isfinite(disp).all()
    finally:
        httpd.shutdown()
        httpd.server_close()
        thread.join(timeout=5)
    print(
        f"DRILL deploy ok: {capex} ({os.path.getsize(capex) / 1e6:.1f} MB) "
        "served and sampled", flush=True,
    )

    print(json.dumps({
        "drill": "ok",
        "mode": "standin" if drill_mode else "real",
        "frames": {"train": n_train, "test": n_test},
        "workdir": workdir,
    }))


if __name__ == "__main__":
    main()
