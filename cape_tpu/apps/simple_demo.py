"""Standalone CPU generation demo (reference: run_simple_demo.py).

Loads a trained checkpoint (or a converted reference checkpoint via
--params), builds the model from the shipped pyramid matrices (no QSlim at
runtime), and exports 4 clothing types x 3 z-samples as .obj meshes —
the reference's no-psbody smoke-test path.

  python -m cape_tpu.apps.simple_demo --config configs/<preset>.yaml \
      [--name <run>] [--params converted_params.npz]
"""

from __future__ import annotations

import argparse
import sys

import jax
import numpy as np

from cape_tpu.apps.demos import SimpleDemo
from cape_tpu.apps.inference import InferenceEngine
from cape_tpu.apps.main import build_context, restore_params
from cape_tpu.core.config import load_config
from cape_tpu.models.cape import CAPE
from cape_tpu.train.checkpoint import unflatten_tree


def main(argv=None):
    p = argparse.ArgumentParser(description="simple CAPE generation demo")
    p.add_argument("--config", default="configs/CAPE-affineconv_nz64_pose32_clotype32_male.yaml")
    p.add_argument("--name", default=None, help="run name with checkpoints")
    p.add_argument("--params", default=None, help="params .npz (e.g. converted TF ckpt)")
    p.add_argument("--results_dir", default="results/demo_results")
    p.add_argument("--random", action="store_true",
                   help="use randomly initialized params (smoke test only)")
    args = p.parse_args(argv)

    cfg = load_config(args.config, name=args.name)
    model = CAPE(cfg)
    ctx = build_context(cfg)

    if args.params:
        template = jax.device_get(
            jax.jit(model.init_params)(jax.random.PRNGKey(0), ctx)
        )
        with np.load(args.params, allow_pickle=False) as data:
            params = unflatten_tree(dict(data), template)
        print(f"loaded params from {args.params}", flush=True)
    elif args.random:
        params = model.init_params(jax.random.PRNGKey(cfg.seed), ctx)
        print("using randomly initialized params (smoke test)", flush=True)
    else:
        if not cfg.name:
            print("error: provide --name, --params, or --random", file=sys.stderr)
            sys.exit(2)
        params = restore_params(cfg, model, ctx)

    engine = InferenceEngine(model, ctx, params, cfg.batch_size)
    demo = SimpleDemo(engine, results_dir=args.results_dir, seed=cfg.seed)
    out = demo.run()
    print(f"generated {out.shape[0] * out.shape[1]} meshes -> {args.results_dir}", flush=True)


if __name__ == "__main__":
    main()
