"""Same-session A/B of XLA compiler options on the flagship train step.

docs/PERF.md (Round 5) attributes the ~4.6 ms non-MXU share of the
10.94 ms device step to XLA-scheduler-owned costs: ~1.06 ms of ~1 us
async staging waits (slice-done/copy-done the latency-hiding scheduler
could not overlap) plus layout/halo fusions that every expressible
formulation pays. Formulation changes are measured CLOSED (conv-local
kernels v1-v7, cross-op resident layout). The one lever never touched is
the compiler's OWN knobs: scoped-VMEM budget, latency-hiding-scheduler
effort, memory slop. These change scheduling, not math.

Protocol: identical to bench.py (the production scanned dispatch,
build_multi_train_step K=32, one device_get sync per dispatch — on the
relay `block_until_ready` does not reliably block), all variants timed
in ONE process back-to-back so the numbers are same-session comparable
(the relay's absolute step time drifts by session; docs/PERF.md). Each
variant is the SAME traced HLO compiled under different
`jax.jit(..., compiler_options=...)` (serialized into CompileOptions
env overrides, so they reach the relay-side compiler; a variant whose
option name the compiler rejects is reported as unsupported, not a
crash). Donated state is re-cloned from a master copy per variant, so
every arm starts from identical params/opt-state.

Usage:
  python -m cape_tpu.tools.xla_opts_ab [--dispatches 8] [--save out.json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

STEPS_PER_DISPATCH = 32

# Option sets under test. Names are XLA DebugOptions / TPU-compiler
# flags; unknown-to-this-compiler names fail that variant gracefully.
VARIANTS: dict[str, dict[str, str]] = {
    "baseline": {},
    # scoped-VMEM budget: more VMEM for fusion scratch lets the scheduler
    # keep more operand windows resident (v5e has 128 MiB VMEM/core; the
    # default scoped budget is a small fraction of it)
    "vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    # latency-hiding scheduler: more reruns = more chances to overlap the
    # ~1 us-each slice-done/copy-done waits PERF.md attributes
    "lhs_rerun3": {"xla_latency_hiding_scheduler_rerun": "3"},
    # scheduler memory slop: let the scheduler use more of HBM headroom
    # for overlap instead of conservatively serializing
    "slop_98": {"xla_tpu_memory_limit_slop_factor": "98"},
    # combined best-guess
    "vmem64m_rerun3": {
        "xla_tpu_scoped_vmem_limit_kib": "65536",
        "xla_latency_hiding_scheduler_rerun": "3",
    },
}


def main(dispatches: int = 8, save: str | None = None) -> dict:
    import os

    import jax
    import jax.numpy as jnp

    # persistent compile cache (same as bench.py) — only the baseline arm
    # can hit it (compiler_options variants bypass/ miss by key), but that
    # is the arm every rerun needs first
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cape_tpu.data.loader import BatchStream
    from cape_tpu.data.synthetic import synthetic_bodydata
    from cape_tpu.train.optim import build_optimizer, create_train_state
    from cape_tpu.train.step import build_multi_train_step
    from __graft_entry__ import _flagship_setup

    cfg, model, ctx = _flagship_setup(compute_dtype="bfloat16")
    num_verts = ctx.level_sizes[0]
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0), ctx)
    tx, _, _ = build_optimizer(cfg, steps_per_epoch=1940)
    multi_fn = build_multi_train_step(model, cfg, tx)

    data = synthetic_bodydata(
        n_train=max(256, cfg.batch_size * 4), n_test=8, num_verts=num_verts, seed=0
    )
    perm = ctx.vertex_perm
    disp = (
        data.disp_train
        if perm is None
        else np.ascontiguousarray(data.disp_train[:, perm])
    )
    data_dev = jax.device_put(
        {"disp": disp, "pose": data.pose_train, "clo": data.clo_train}
    )
    ctx_dev = jax.device_put(ctx)
    sg = BatchStream(len(data.disp_train), cfg.batch_size, 0)
    sd = BatchStream(len(data.disp_train), cfg.batch_size, 1)

    def idx_chunk(k: int):
        ig = np.stack([sg.next_indices() for _ in range(k)]).astype(np.int32)
        idd = np.stack([sd.next_indices() for _ in range(k)]).astype(np.int32)
        return ig, idd

    state0 = jax.device_put(create_train_state(params, tx))
    clone = jax.jit(lambda s: jax.tree_util.tree_map(jnp.copy, s))
    rng = jax.random.PRNGKey(0)

    results: dict[str, dict] = {}
    for name, opts in VARIANTS.items():
        fn = jax.jit(multi_fn, donate_argnums=(0,), compiler_options=opts or None)
        state = clone(state0)
        t_c = time.perf_counter()
        try:
            # warmup dispatch = compile + first run
            ig, idd = idx_chunk(STEPS_PER_DISPATCH)
            state, metrics = fn(state, ctx_dev, data_dev, ig, idd, rng)
            jax.device_get(metrics["loss_g"])
        except Exception as e:  # unsupported option name on this compiler
            results[name] = {"error": str(e).splitlines()[0][:200]}
            print(f"{name:>16}: UNSUPPORTED ({results[name]['error']})", flush=True)
            continue
        compile_s = time.perf_counter() - t_c

        per_dispatch_ms = []
        for _ in range(dispatches):
            ig, idd = idx_chunk(STEPS_PER_DISPATCH)
            t0 = time.perf_counter()
            state, metrics = fn(state, ctx_dev, data_dev, ig, idd, rng)
            jax.device_get(metrics["loss_g"])
            per_dispatch_ms.append((time.perf_counter() - t0) * 1e3)
        m = {k: float(v[-1]) for k, v in jax.device_get(metrics).items()}
        assert all(np.isfinite(v) for v in m.values()), f"{name}: non-finite {m}"
        med = float(np.median(per_dispatch_ms))
        results[name] = {
            "ms_per_step": round(med / STEPS_PER_DISPATCH, 3),
            "median_dispatch_ms": round(med, 2),
            "min_dispatch_ms": round(min(per_dispatch_ms), 2),
            "compile_s": round(compile_s, 1),
            "opts": opts,
        }
        print(
            f"{name:>16}: {results[name]['ms_per_step']:.3f} ms/step "
            f"(median of {dispatches} dispatches x{STEPS_PER_DISPATCH}; "
            f"compile {compile_s:.0f}s)",
            flush=True,
        )

    base = results.get("baseline", {}).get("ms_per_step")
    if base:
        for name, r in results.items():
            if "ms_per_step" in r:
                r["vs_baseline"] = round(r["ms_per_step"] / base, 4)
    print(json.dumps(results))
    if save:
        with open(save, "w") as f:
            json.dump(results, f, indent=1)
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--dispatches", type=int, default=8)
    p.add_argument("--save", default=None)
    a = p.parse_args()
    main(dispatches=a.dispatches, save=a.save)
