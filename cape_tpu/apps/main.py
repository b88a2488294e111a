"""CLI entry point: train / test / demo, mirroring the reference's main.py.

  python -m cape_tpu.apps.main --config configs/<preset>.yaml --mode train --name run1
  python -m cape_tpu.apps.main --config ... --mode test  --name run1
  python -m cape_tpu.apps.main --config ... --mode demo  --name run1

Differences from the reference flow (main.py:1-109), by design:
  * the mesh pyramid is loaded from the shipped golden matrices when the
    config matches the canonical 8-layer plan (startup in seconds instead
    of re-running QSlim every launch, and exact parity); other plans are
    built with the first-party QSlim;
  * datasets load from packed arrays (data/datasets/<name>) produced by
    cape_tpu.data.packer — or fall back to a synthetic dataset with a
    loud notice, so every mode is runnable without the gated CAPE data.
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from cape_tpu.apps.demos import DemoSuite
from cape_tpu.apps.inference import InferenceEngine
from cape_tpu.core.config import CAPEConfig, parse_cli
from cape_tpu.data.loader import BodyData
from cape_tpu.data.synthetic import synthetic_bodydata
from cape_tpu.meshops import assets
from cape_tpu.meshops.pyramid import load_or_build as load_or_build_pyramid
from cape_tpu.models import summary
from cape_tpu.models.cape import CAPE
from cape_tpu.ops.sparse import build_graph_context
from cape_tpu.train import checkpoint as ckpt
from cape_tpu.train.loop import Trainer
from cape_tpu.train.optim import build_optimizer, create_train_state


def build_context(cfg: CAPEConfig):
    """GraphContext for the configured pyramid plan."""
    verts, faces = assets.template_mesh()
    pyr = load_or_build_pyramid(cfg.ds_factors)
    pyr_d = assets.load_pyramid("ds2")
    loss_mask = (
        assets.loss_mask_binary() if cfg.loss_mask == "binary" else 1.0
    )
    return build_graph_context(
        pyr, pyr_d, assets.smpl_edges(), verts, loss_mask=loss_mask,
        mode=cfg.op_mode, dtype=np.dtype(cfg.compute_dtype),
        padded=cfg.padded_layout and cfg.op_mode == "banded",
        use_pallas=cfg.use_pallas,
        build_fused=cfg.fuse_decoder,
    )


def load_bodydata(cfg: CAPEConfig, datadir_root: str = "data/datasets") -> BodyData:
    data_dir = os.path.join(datadir_root, cfg.dataset)
    if os.path.isdir(data_dir):
        print(f"loading packed dataset from {data_dir}", flush=True)
        return BodyData.from_packed(data_dir, pose_type=cfg.pose_type)
    print(
        f"WARNING: packed dataset {data_dir!r} not found — using a synthetic "
        "stand-in dataset (pack the CAPE release with cape_tpu.data.packer "
        "for real training)",
        flush=True,
    )
    return synthetic_bodydata(
        n_train=512, n_test=64, num_verts=6890, seed=cfg.seed,
        pose_type=cfg.pose_type,
    )


def restore_params(cfg: CAPEConfig, model: CAPE, ctx, workdir: str = "results"):
    ckpt_dir = os.path.join(workdir, cfg.name, "checkpoints")
    if ckpt.latest_checkpoint(ckpt_dir) is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0), ctx)
    tx, _, _ = build_optimizer(cfg, steps_per_epoch=1)
    template = jax.device_get(create_train_state(params, tx))
    state, latest = ckpt.restore_latest(ckpt_dir, template)
    if state is None:
        raise FileNotFoundError(f"no readable checkpoint under {ckpt_dir}")
    print(f"restored {latest} (step {int(state.step)})", flush=True)
    return state.params


def resolve_config(cfg: CAPEConfig) -> CAPEConfig:
    """Derived-config intent fixes applied before model build.

    pose_type='pose' conditions on 14 clothing joints x 3 axis-angle dims
    = 42 (the reference hardcodes cond_dim = 14*9 at main.py:69 even for
    pose_type=pose, which would crash its feed; rebuild the intent)."""
    if cfg.pose_type == "pose" and cfg.cond_dim == 126:
        cfg = cfg.replace(cond_dim=42)
    return cfg


def run(cfg: CAPEConfig, workdir: str = "results") -> None:
    cfg = resolve_config(cfg)
    model = CAPE(cfg)
    ctx = build_context(cfg)
    # architecture table at build time, as the reference prints during
    # graph construction (lib/models.py:495-675)
    print(summary.describe(model, ctx), flush=True)

    if cfg.mode == "train":
        data = load_bodydata(cfg)
        trainer = Trainer(cfg, model, ctx, data, workdir=workdir)
        losses, t_step = trainer.fit()
        print(f"training done: {t_step*1000:.1f} ms/step", flush=True)
        params = jax.device_get(trainer.state).params
        engine = InferenceEngine(model, ctx, params, cfg.batch_size)
        demos = DemoSuite(
            engine, cfg.name, cfg.dataset, cfg.gender, cfg.demo_n_sample,
            cfg.save_obj, cfg.smpl_model_folder, workdir, cfg.seed,
            vis=cfg.vis_demo,
        )
        demos.test_model(data)
        demos.run()
    else:
        params = restore_params(cfg, model, ctx, workdir)
        engine = InferenceEngine(model, ctx, params, cfg.batch_size)
        demos = DemoSuite(
            engine, cfg.name, cfg.dataset, cfg.gender, cfg.demo_n_sample,
            cfg.save_obj, cfg.smpl_model_folder, workdir, cfg.seed,
            vis=cfg.vis_demo,
        )
        if cfg.mode == "test":
            data = load_bodydata(cfg)
            demos.test_model(data)
        else:
            demos.run()


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--platform" in argv:
        # explicit runtime platform (e.g. cpu smoke runs on a box whose
        # sitecustomize pins an accelerator); must land before device use
        i = argv.index("--platform")
        jax.config.update("jax_platforms", argv[i + 1])
        del argv[i : i + 2]
    cfg = parse_cli(argv)
    if not cfg.name:
        print("error: --name is required", file=sys.stderr)
        sys.exit(2)
    run(cfg)


if __name__ == "__main__":
    main()
