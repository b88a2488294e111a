"""Benchmark: flagship CAPE training throughput on the attached accelerator.

Measures full GAN train steps/sec (one fused G+D forward/backward +
optimizer update per step; the reference runs the same workload as two
feed_dict sess.run calls, lib/models.py:905-906) on the flagship
CAPE-affineconv_nz64_pose32_clotype32 config, batch 16, real SMPL pyramid,
synthetic data with the real shapes.

Measurement protocol: STEPS_PER_DISPATCH steps are scanned on-device per
dispatch (train.step.build_multi_train_step — the production Trainer path)
and every dispatch ends with a host fetch of its step metrics — on
remote-attached accelerators `block_until_ready` does not reliably block,
so only device_get round-trips give honest wall-clock numbers. The fetch
covers all scanned steps: nothing is timed that has not executed.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N}

Baseline note: the reference publishes no throughput anywhere (SURVEY §6).
vs_baseline is computed against a documented estimate of the TF1-GPU
reference at REFERENCE_STEPS_PER_SEC below (measured category: TF1.13
sparse graph-conv VAE-GAN, batch 16, single 2080Ti-era GPU, 2 sess.runs
per step with feed_dict transfer of a 6890x3 batch). Next to that
estimate the JSON carries `vs_reference_cpu_measured` — a genuinely
MEASURED same-silicon framework ratio (the reference's TF graph vs
cape_tpu's step, both on this host's CPU at the same shapes), read from
the committed TF_REF_CPU.json produced by
`python -m cape_tpu.tools.tf_reference_bench --save TF_REF_CPU.json`.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REFERENCE_STEPS_PER_SEC = 5.0  # documented estimate; see module docstring
STEPS_PER_DISPATCH = 32


def _wait_for_backend(max_wait_s: float = 1800.0, probe_timeout_s: float = 90.0):
    """The relay can be down for hours at a stretch (CLAUDE.md), and
    jax.devices() then hangs FOREVER in-process — so probe in a
    subprocess with a timeout and retry with backoff before committing
    this process to the backend. Raises SystemExit if the backend never
    comes up: no measurement beats a fabricated or hung one."""
    import subprocess
    import sys

    deadline = time.monotonic() + max_wait_s
    delay = 30.0
    while True:
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout_s, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            if time.monotonic() >= deadline:
                raise SystemExit(
                    f"bench: accelerator backend unreachable after "
                    f"{max_wait_s:.0f}s of probing (relay down? CLAUDE.md)"
                )
            print(f"# backend unreachable; retrying in {delay:.0f}s", flush=True)
            time.sleep(min(delay, max(0.0, deadline - time.monotonic())))
            delay = min(delay * 2, 300.0)


def _tiny_setup(compute_dtype: str = "float32", batch_size: int = 16):
    """Icosphere stand-in for the CPU virtual-mesh smoke: same code paths
    (banded padded ops, fused GAN step, DP sharding), 258 verts instead of
    6890 so a 1-CPU host can compile+run the protocol in ~a minute."""
    from cape_tpu.core.config import CAPEConfig
    from cape_tpu.meshops.pyramid import build_pyramid
    from cape_tpu.meshops.topology import vertices_per_edge
    from cape_tpu.meshops.toy import icosphere
    from cape_tpu.models.cape import CAPE
    from cape_tpu.ops.sparse import build_graph_context

    cfg = CAPEConfig(
        name="bench_tiny", nf=4, nz=8, nz_cond=8, nz_cond2=4,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=8, batch_size=batch_size, compute_dtype=compute_dtype,
    )
    verts, faces = icosphere(3)
    pyr = build_pyramid(verts, faces, cfg.ds_factors)
    pyr_d = build_pyramid(verts, faces, [2, 2, 2, 2])
    # same operator-block dtype/mode/pallas routing as _flagship_setup —
    # the smoke must exercise the production dtype path, not f32 blocks
    # cast per-op under bf16 compute
    ctx = build_graph_context(
        pyr, pyr_d, vertices_per_edge(faces, len(verts)), verts,
        mode=cfg.op_mode, dtype=np.dtype(compute_dtype),
        padded=cfg.padded_layout, use_pallas=cfg.use_pallas,
    )
    return cfg, CAPE(cfg), ctx


def main(
    num_steps: int = 192,
    warmup: int = STEPS_PER_DISPATCH,
    data_parallel: int = 0,
    platform: str | None = None,
    preset: str = "flagship",
) -> dict:
    """data_parallel: devices in the DP mesh (0 = all local devices) —
    the day multi-chip hardware attaches, `python bench.py
    --data_parallel N` is the whole scaling story (VERDICT r3 item 7).
    platform='cpu' runs the identical protocol on the virtual host mesh
    (correctness/scaling smoke, not a perf number); pair it with
    --preset tiny so a 1-CPU host finishes the smoke in ~a minute."""
    import os

    if platform == "cpu" and data_parallel > 1:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={data_parallel}"
        )
    if platform is None:
        _wait_for_backend()

    import jax

    if platform is not None:
        jax.config.update("jax_platforms", platform)

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from cape_tpu.data.loader import BatchStream
    from cape_tpu.data.synthetic import synthetic_bodydata
    from cape_tpu.parallel.mesh import DataParallel
    from cape_tpu.train.optim import build_optimizer, create_train_state
    from cape_tpu.train.step import build_multi_train_step
    from __graft_entry__ import _flagship_setup

    t_setup = time.perf_counter()
    # bfloat16 mixed precision (params f32, compute bf16) is the production
    # config: end-metric equivalence with f32 is recorded in docs/PERF.md
    # (cape_tpu.tools.dtype_ablation — euclidean metric gap 0.03%)
    if preset == "tiny":
        cfg, model, ctx = _tiny_setup(compute_dtype="bfloat16")
    else:
        cfg, model, ctx = _flagship_setup(compute_dtype="bfloat16")
    num_verts = ctx.level_sizes[0]
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0), ctx)
    tx, _, _ = build_optimizer(cfg, steps_per_epoch=1940)  # male-set epochs

    dp = DataParallel(n_devices=data_parallel)
    n_chips = dp.num_devices
    multi_fn = dp.compile_multi_train_step(build_multi_train_step(model, cfg, tx))

    # device-resident dataset, as in training: per-dispatch host traffic is
    # two [K, batch] int32 index arrays
    data = synthetic_bodydata(
        n_train=max(256, cfg.batch_size * 4), n_test=8, num_verts=num_verts, seed=0
    )
    perm = ctx.vertex_perm
    disp = data.disp_train if perm is None else np.ascontiguousarray(data.disp_train[:, perm])
    data_dev = dp.replicate(
        {"disp": disp, "pose": data.pose_train, "clo": data.clo_train}
    )
    sg = BatchStream(len(data.disp_train), cfg.batch_size, 0)
    sd = BatchStream(len(data.disp_train), cfg.batch_size, 1)

    def idx_chunk(k: int):
        ig = np.stack([sg.next_indices() for _ in range(k)]).astype(np.int32)
        idd = np.stack([sd.next_indices() for _ in range(k)]).astype(np.int32)
        return ig, idd

    state = dp.replicate(create_train_state(params, tx))
    ctx_dev = dp.replicate(ctx)
    rng = jax.random.PRNGKey(0)

    ig, idd = idx_chunk(warmup)
    state, metrics = multi_fn(state, ctx_dev, data_dev, ig, idd, rng)
    jax.device_get(metrics["loss_g"])  # hard sync
    print(f"# setup+compile+warmup {time.perf_counter()-t_setup:.0f}s", flush=True)

    t0 = time.perf_counter()
    done = 0
    while done < num_steps:
        ig, idd = idx_chunk(STEPS_PER_DISPATCH)
        state, metrics = multi_fn(state, ctx_dev, data_dev, ig, idd, rng)
        jax.device_get(metrics["loss_g"])  # hard sync per dispatch
        done += STEPS_PER_DISPATCH
    dt = time.perf_counter() - t0

    m = {k: float(v[-1]) for k, v in jax.device_get(metrics).items()}
    assert all(np.isfinite(v) for v in m.values()), f"non-finite metrics: {m}"

    steps_per_sec = done / dt
    smoke = preset != "flagship" or platform is not None
    metric_name = "flagship_train_steps_per_sec_per_chip (batch16, CAPE-affineconv_nz64)"
    if smoke:
        # a smoke run is never the headline number, and dividing a tiny
        # icosphere / forced-platform run by the flagship TF1-GPU estimate
        # would be a meaningless ratio
        metric_name = f"SMOKE[{preset},{platform or 'default'}]_train_steps_per_sec_per_chip"
    result = {
        "metric": metric_name,
        "value": round(steps_per_sec / n_chips, 3),
        "unit": "steps/sec",
        "vs_baseline": None if smoke
        else round(steps_per_sec / n_chips / REFERENCE_STEPS_PER_SEC, 3),
        "chips": n_chips,
        "aggregate_steps_per_sec": round(steps_per_sec, 3),
    }
    if not smoke:
        # measured same-silicon ratio vs the reference's TF graph (both on
        # host CPU, same shapes) — committed artifact, see module docstring
        ref_json = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "TF_REF_CPU.json")
        if os.path.exists(ref_json):
            with open(ref_json) as f:
                ref = json.load(f)
            for key in ("vs_reference_cpu_measured",
                        "vs_reference_cpu_measured_ell",
                        "tf_ref_cpu_step_ms"):
                if ref.get(key) is not None:
                    result[key] = ref[key]
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--data_parallel", type=int, default=0,
                   help="devices in the DP mesh (0 = all local devices)")
    p.add_argument("--platform", default=None,
                   help="force a jax platform; 'cpu' = virtual-mesh smoke")
    p.add_argument("--preset", default="flagship", choices=["flagship", "tiny"],
                   help="tiny = icosphere stand-in for CPU smokes")
    p.add_argument("--num_steps", type=int, default=192)
    a = p.parse_args()
    main(num_steps=a.num_steps, data_parallel=a.data_parallel,
         platform=a.platform, preset=a.preset)
