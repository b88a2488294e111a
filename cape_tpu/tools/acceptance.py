"""Acceptance runner: per-vertex autoencoding error vs BASELINE thresholds.

The reference's headline metric (README tables; SURVEY §6): mean per-vertex
Euclidean error over the 3627 clothing vertices of the test split, in
meters. Driver targets: <= 6.1 mm male / <= 3.7 mm female.

  python -m cape_tpu.tools.acceptance --config configs/<preset>.yaml \
      --name <run> [--threshold_mm 6.1]

Exits 0 when the threshold is met; prints a JSON result line either way.
Requires the packed real dataset (data/datasets/<dataset>); refuses to
judge against synthetic stand-ins.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from cape_tpu.apps.demos import DemoSuite
from cape_tpu.apps.inference import InferenceEngine
from cape_tpu.apps.main import build_context, restore_params
from cape_tpu.core.config import load_config
from cape_tpu.data.loader import BodyData
from cape_tpu.models.cape import CAPE

DEFAULT_THRESHOLD_MM = {"male": 6.1, "female": 3.7}


def main(argv=None):
    p = argparse.ArgumentParser(description="CAPE acceptance metric")
    p.add_argument("--config", required=True)
    p.add_argument("--name", required=True)
    p.add_argument("--datadir_root", default="data/datasets")
    p.add_argument("--threshold_mm", type=float, default=None)
    p.add_argument("--workdir", default="results",
                   help="run root holding <name>/checkpoints")
    p.add_argument("--gender", default=None,
                   help="override the config's gender (selects the "
                        "per-gender default threshold)")
    args = p.parse_args(argv)

    cfg = load_config(args.config, name=args.name, gender=args.gender)
    data_dir = os.path.join(args.datadir_root, cfg.dataset)
    if not os.path.isdir(data_dir):
        print(
            f"error: packed dataset {data_dir!r} not found — the acceptance "
            "metric is only meaningful on the real CAPE data",
            file=sys.stderr,
        )
        sys.exit(2)
    threshold_mm = (
        args.threshold_mm
        if args.threshold_mm is not None
        else DEFAULT_THRESHOLD_MM.get(cfg.gender, 6.1)
    )

    model = CAPE(cfg)
    ctx = build_context(cfg)
    params = restore_params(cfg, model, ctx, workdir=args.workdir)
    engine = InferenceEngine(model, ctx, params, cfg.batch_size)
    data = BodyData.from_packed(data_dir, pose_type=cfg.pose_type)
    demo = DemoSuite(
        engine, cfg.name, cfg.dataset, cfg.gender,
        n_sample=cfg.demo_n_sample, save_objs=False,
        smpl_model_folder=cfg.smpl_model_folder,
        results_root=args.workdir,
    )
    res = demo.test_model(data)
    err_mm = res["euclidean_mean_m"] * 1000.0
    passed = err_mm <= threshold_mm
    print(
        json.dumps(
            {
                "metric": "per_vertex_autoencoding_error_mm",
                "value": round(err_mm, 4),
                "median_mm": round(res["euclidean_median_m"] * 1000.0, 4),
                "std_mm": round(res["euclidean_std_m"] * 1000.0, 4),
                "n_test": res["n_test"],
                "threshold_mm": threshold_mm,
                "passed": passed,
            }
        )
    )
    sys.exit(0 if passed else 1)


if __name__ == "__main__":
    main()
