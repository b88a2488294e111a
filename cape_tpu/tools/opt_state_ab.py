"""Same-session A/B of optimizer-state precision on the flagship step.

docs/PERF.md (Round 5) attributes ~169 us/step of the non-MXU residue to
the optimizer's multiply_add over the f32 momentum buffers (dominated by
the decoder dense head's [128, 55168] trace) plus a share of the
copy-done staging waits. `cfg.opt_state_dtype = "bfloat16"` halves that
buffer's HBM read+write (train/optim.py); this tool prices it.

Protocol: identical to bench.py (production scanned dispatch,
build_multi_train_step K=32, one device_get per dispatch — on the relay
`block_until_ready` does not reliably block), both arms compiled and
timed in ONE process, interleaved ABBA (f32, bf16, bf16, f32 blocks) so
relay drift cancels to first order. Each arm owns its TrainState (the
state pytrees differ in dtype); both start from the same params.

Usage:
  python -m cape_tpu.tools.opt_state_ab [--dispatches 6] [--save out.json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

STEPS_PER_DISPATCH = 32


def main(dispatches: int = 6, save: str | None = None) -> dict:
    import os

    import jax
    import jax.numpy as jnp

    # persistent compile cache (same as bench.py): remote compiles are
    # 30-300+ s through the relay; repeats become seconds
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

    rng = jax.random.PRNGKey(0)
    # each arm's fn donates its state; params are aliased into it, so give
    # every arm a fresh copy and never donate the master
    clone = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))
    arms: dict[str, dict] = {}
    for name, dt in (("f32_state", "float32"), ("bf16_state", "bfloat16")):
        c = cfg.replace(opt_state_dtype=dt)
        tx, _, _ = build_optimizer(c, steps_per_epoch=1940)
        fn = jax.jit(build_multi_train_step(model, c, tx), donate_argnums=(0,))
        state = jax.device_put(create_train_state(clone(params), tx))
        t_c = time.perf_counter()
        ig, idd = idx_chunk(STEPS_PER_DISPATCH)  # warmup = compile + run
        state, metrics = fn(state, ctx_dev, data_dev, ig, idd, rng)
        jax.device_get(metrics["loss_g"])
        arms[name] = {
            "fn": fn,
            "state": state,
            "compile_s": round(time.perf_counter() - t_c, 1),
            "blocks_ms": [],
        }
        # confirm the state buffers really differ in dtype (guards against
        # a silent no-op arm making the A/B meaningless)
        dts = {
            str(leaf.dtype)
            for leaf in jax.tree_util.tree_leaves(arms[name]["state"].opt_state)
            if getattr(leaf, "ndim", 0) > 0
        }
        assert dts == {dt}, f"{name}: opt-state dtypes {dts}, expected {{{dt}}}"

    def timed_block(arm: dict) -> float:
        per_dispatch = []
        for _ in range(dispatches):
            ig, idd = idx_chunk(STEPS_PER_DISPATCH)
            t0 = time.perf_counter()
            arm["state"], metrics = arm["fn"](
                arm["state"], ctx_dev, data_dev, ig, idd, rng
            )
            jax.device_get(metrics["loss_g"])
            per_dispatch.append((time.perf_counter() - t0) * 1e3)
        m = {k: float(v[-1]) for k, v in jax.device_get(metrics).items()}
        assert all(np.isfinite(v) for v in m.values()), f"non-finite: {m}"
        return float(np.median(per_dispatch))

    # ABBA: drift-cancelling block order
    for name in ("f32_state", "bf16_state", "bf16_state", "f32_state"):
        med = timed_block(arms[name])
        arms[name]["blocks_ms"].append(med)
        print(
            f"{name}: block median {med:.1f} ms/dispatch "
            f"({med / STEPS_PER_DISPATCH:.3f} ms/step)",
            flush=True,
        )

    results = {}
    for name, arm in arms.items():
        med = float(np.median(arm["blocks_ms"]))
        results[name] = {
            "ms_per_step": round(med / STEPS_PER_DISPATCH, 3),
            "block_medians_ms": [round(b, 2) for b in arm["blocks_ms"]],
            "compile_s": arm["compile_s"],
        }
    results["bf16_vs_f32"] = round(
        results["bf16_state"]["ms_per_step"] / results["f32_state"]["ms_per_step"], 4
    )
    print(json.dumps(results))
    if save:
        with open(save, "w") as f:
            json.dump(results, f, indent=1)
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--dispatches", type=int, default=6)
    p.add_argument("--save", default=None)
    a = p.parse_args()
    main(dispatches=a.dispatches, save=a.save)
