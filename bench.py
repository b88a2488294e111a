"""Benchmark: flagship CAPE training throughput on the attached accelerator.

Measures full GAN train steps/sec (one fused G+D forward/backward +
optimizer update per step; the reference runs the same workload as two
feed_dict sess.run calls, lib/models.py:905-906) on the flagship
CAPE-affineconv_nz64_pose32_clotype32 config, batch 16, real SMPL pyramid,
synthetic data with the real shapes.

Measurement protocol: steps are chained in groups of QUEUE_DEPTH and every
group ends with a host fetch of a step metric — on remote-attached
accelerators `block_until_ready` does not reliably block, so only
device_get round-trips give honest wall-clock numbers.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N}

Baseline note: the reference publishes no throughput anywhere (SURVEY §6).
vs_baseline is computed against a documented estimate of the TF1-GPU
reference at REFERENCE_STEPS_PER_SEC below (measured category: TF1.13
sparse graph-conv VAE-GAN, batch 16, single 2080Ti-era GPU, 2 sess.runs
per step with feed_dict transfer of a 6890x3 batch).
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_STEPS_PER_SEC = 5.0  # documented estimate; see module docstring
QUEUE_DEPTH = 8


def main(num_steps: int = 64, warmup: int = 8) -> dict:
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from cape_tpu.data.loader import BatchStream, make_gan_batch
    from cape_tpu.data.synthetic import synthetic_bodydata
    from cape_tpu.parallel.mesh import DataParallel
    from cape_tpu.train.optim import build_optimizer, create_train_state
    from cape_tpu.train.step import build_train_step
    from __graft_entry__ import _flagship_setup

    t_setup = time.perf_counter()
    # bfloat16 mixed precision (params f32, compute bf16) is the production
    # config: end-metric equivalence with f32 is recorded in docs/PERF.md
    # (cape_tpu.tools.dtype_ablation — euclidean metric gap 0.03%)
    cfg, model, ctx = _flagship_setup(compute_dtype="bfloat16")
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0), ctx)
    tx, _, _ = build_optimizer(cfg, steps_per_epoch=1940)  # male-set epochs

    dp = DataParallel()
    n_chips = dp.num_devices
    step_fn = dp.compile_train_step(build_train_step(model, cfg, tx))

    data = synthetic_bodydata(
        n_train=max(256, cfg.batch_size * 4), n_test=8, num_verts=6890, seed=0
    )
    sg = BatchStream(len(data.disp_train), cfg.batch_size, 0)
    sd = BatchStream(len(data.disp_train), cfg.batch_size, 1)
    batches = [dp.shard_batch(make_gan_batch(data, sg, sd)) for _ in range(8)]

    state = dp.replicate(create_train_state(params, tx))
    ctx_dev = dp.replicate(ctx)
    rng = jax.random.PRNGKey(0)

    for i in range(warmup):
        state, metrics = step_fn(
            state, ctx_dev, batches[i % len(batches)], jax.random.fold_in(rng, i)
        )
    jax.device_get(metrics["loss_g"])  # hard sync
    print(f"# setup+compile+warmup {time.perf_counter()-t_setup:.0f}s", flush=True)

    t0 = time.perf_counter()
    done = 0
    while done < num_steps:
        for j in range(QUEUE_DEPTH):
            state, metrics = step_fn(
                state,
                ctx_dev,
                batches[(done + j) % len(batches)],
                jax.random.fold_in(rng, 100 + done + j),
            )
        jax.device_get(metrics["loss_g"])  # hard sync per group
        done += QUEUE_DEPTH
    dt = time.perf_counter() - t0

    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
    assert all(np.isfinite(v) for v in m.values()), f"non-finite metrics: {m}"

    steps_per_sec = done / dt
    result = {
        "metric": "flagship_train_steps_per_sec_per_chip (batch16, CAPE-affineconv_nz64)",
        "value": round(steps_per_sec / n_chips, 3),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / n_chips / REFERENCE_STEPS_PER_SEC, 3),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
