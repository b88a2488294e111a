"""Full-schedule endurance run: the reference's complete training recipe
at reference dataset scale, end to end, on the attached accelerator.

The real CAPE dataset is license-gated (docs/ROADMAP.md), so this drives
the production Trainer with a synthetic dataset of the REAL size and
shapes (male split: 31,036 train frames, README.md:53 of the reference)
through the full 60-epoch schedule — 116k train steps, per-epoch
validation, checkpoint rotation, lr decay — and reports sustained
wall-clock throughput including all overheads. This is the systems
half of the acceptance story: when the real packed dataset lands it
slots into the same path (tools/acceptance.py) with no code changes.

  python -m cape_tpu.tools.endurance              # full 60-epoch run
  python -m cape_tpu.tools.endurance --epochs 2   # quick smoke

Prints one JSON line at the end with the sustained numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--n-train", type=int, default=31036, help="male-split size")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--workdir", default="results")
    p.add_argument(
        "--expect-final", type=float, default=None,
        help="pinned final_val_recon to assert against (6dp); the full "
        "60-epoch flagship schedule has produced bit-identical 0.263863 "
        "across rounds 3-5 (docs/PERF.md Endurance) — pass it to turn "
        "the run into a no-regression gate",
    )
    args = p.parse_args(argv)

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import numpy as np

    from cape_tpu.data.synthetic import synthetic_bodydata
    from cape_tpu.models.cape import CAPE
    from cape_tpu.train.loop import Trainer
    from __graft_entry__ import _flagship_setup

    cfg, model, ctx = _flagship_setup(compute_dtype=args.dtype)
    cfg = cfg.replace(
        name="endurance",
        num_epochs=args.epochs,
        batch_size=args.batch,
        restart=True,
        log_every_steps=0,          # per-epoch logging only
    )
    model = CAPE(cfg)

    print(
        f"# generating synthetic dataset at reference scale "
        f"({args.n_train} train frames)...", flush=True,
    )
    data = synthetic_bodydata(
        n_train=args.n_train, n_test=64, num_verts=6890, seed=0, n_val=100
    )

    trainer = Trainer(cfg, model, ctx, data, workdir=args.workdir)
    n_steps = trainer.num_steps
    print(
        f"# {args.epochs} epochs x {trainer.steps_per_epoch} steps/epoch "
        f"= {n_steps} steps, batch {args.batch}, {args.dtype}", flush=True,
    )
    t0 = time.time()
    val_losses, t_step = trainer.fit()
    wall = time.time() - t0

    ckpts = sorted(os.listdir(trainer.ckpt_dir)) if os.path.isdir(trainer.ckpt_dir) else []
    out = {
        "steps": n_steps,
        "epochs": args.epochs,
        "wall_s": round(wall, 1),
        "sustained_steps_per_sec": round(n_steps / wall, 2),
        "sec_per_step_incl_overheads": round(t_step, 5),
        "final_val_recon": round(float(val_losses[-1]), 6),
        "val_recon_first": round(float(val_losses[0]), 6),
        "checkpoints_kept": len(ckpts),
        "batch": args.batch,
        "dtype": args.dtype,
    }
    assert np.isfinite(out["final_val_recon"]), out
    if args.expect_final is not None:
        got, want = out["final_val_recon"], round(args.expect_final, 6)
        assert got == want, (
            f"final_val_recon {got} != pinned {want} — training math "
            f"changed (docs/PERF.md Endurance: rounds 3-5 were "
            f"bit-identical); investigate before trusting this build"
        )
        out["matches_pinned_final"] = want
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main()
