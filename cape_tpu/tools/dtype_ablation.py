"""f32-vs-bf16 quality + speed ablation on the synthetic stand-in set.

The real CAPE dataset is license-gated (docs/ROADMAP.md), so this bounds
the bf16 risk the only way currently possible: identical short trainings
of the flagship config under compute_dtype float32 and bfloat16 (same
seed, same data, params in f32 either way — mixed precision), comparing
end validation losses and the demo per-vertex Euclidean metric
(reference demos.py:47-124 — the acceptance metric's form).

  python -m cape_tpu.tools.dtype_ablation --epochs 8

Prints one JSON line per dtype plus a verdict line.
"""

from __future__ import annotations

import argparse
import json
import os


def run_one(dtype: str, epochs: int, seed: int, workdir: str) -> dict:
    import time

    import jax

    from cape_tpu.apps.demos import DemoSuite
    from cape_tpu.apps.inference import InferenceEngine
    from cape_tpu.core.config import CAPEConfig
    from cape_tpu.data.synthetic import synthetic_bodydata
    from cape_tpu.meshops import assets
    from cape_tpu.models.cape import CAPE
    from cape_tpu.ops.sparse import build_graph_context
    from cape_tpu.train.loop import Trainer

    import numpy as np

    cfg = CAPEConfig(
        name=f"dtype_ablation_{dtype}", nz=64, nz_cond=32, nz_cond2=32, nf=64,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=64, lambda_edge=1.0, batch_size=16, num_epochs=epochs,
        compute_dtype=dtype, seed=seed, log_every_steps=0,
    )
    verts, _ = assets.template_mesh()
    ctx = build_graph_context(
        assets.load_pyramid("for_demo"), assets.load_pyramid("ds2"),
        assets.smpl_edges(), verts, mode=cfg.op_mode,
        dtype=np.dtype(cfg.compute_dtype),
        padded=cfg.padded_layout, use_pallas=cfg.use_pallas,
    )
    data = synthetic_bodydata(n_train=512, n_test=64, num_verts=6890, seed=seed)
    model = CAPE(cfg)
    trainer = Trainer(cfg, model, ctx, data, workdir=workdir)
    t0 = time.time()
    val_losses, _ = trainer.fit()

    params = jax.device_get(trainer.state).params
    engine = InferenceEngine(model, ctx, params, cfg.batch_size)
    suite = DemoSuite(
        engine, cfg.name, n_sample=0, save_objs=False,
        smpl_model_folder="/nonexistent", results_root=workdir, seed=seed,
    )
    metric = suite.test_model(data)
    val = trainer.evaluate("val", rng=jax.random.PRNGKey(99))
    return {
        "dtype": dtype,
        "val_recon": round(float(val["recon"]), 5),
        "val_edge": round(float(val["edge"]), 5),
        "euclidean_mean": round(metric["euclidean_mean_m"], 6),
        "euclidean_median": round(metric["euclidean_median_m"], 6),
        "first_val_recon": round(float(val_losses[0]), 5),
        "last_val_recon": round(float(val_losses[-1]), 5),
        "wall_s": round(time.time() - t0, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--seed", type=int, default=2)
    p.add_argument("--workdir", default="results/dtype_ablation")
    args = p.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    results = {}
    for dtype in ("float32", "bfloat16"):
        r = run_one(dtype, args.epochs, args.seed, args.workdir)
        results[dtype] = r
        print(json.dumps(r), flush=True)

    f32, bf16 = results["float32"], results["bfloat16"]
    rel_metric = abs(bf16["euclidean_mean"] - f32["euclidean_mean"]) / max(
        f32["euclidean_mean"], 1e-9
    )
    rel_recon = abs(bf16["val_recon"] - f32["val_recon"]) / max(
        f32["val_recon"], 1e-9
    )
    verdict = {
        "rel_euclidean_gap": round(rel_metric, 4),
        "rel_val_recon_gap": round(rel_recon, 4),
        "bf16_within_2pct": bool(rel_metric < 0.02 and rel_recon < 0.02),
    }
    print(json.dumps(verdict), flush=True)


if __name__ == "__main__":
    main()
