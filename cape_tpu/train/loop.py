"""The training loop.

Replaces the reference's feed_dict session loop (lib/models.py:837-929)
with: device-resident graph constants, one fused jitted G+D step, epoch
validation, npz checkpointing with resume, and JSONL metrics. Restart
semantics follow the reference: restart=True wipes the run directory,
restart=False resumes from the latest checkpoint continuing the step
counter (lib/models.py:852-866).
"""

from __future__ import annotations

import os
import shutil
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from cape_tpu.core.config import CAPEConfig
from cape_tpu.data.loader import BatchStream, BodyData
from cape_tpu.models.cape import CAPE
from cape_tpu.ops.sparse import GraphContext
from cape_tpu.parallel.mesh import DataParallel
from cape_tpu.train import checkpoint as ckpt
from cape_tpu.train.metrics import MetricsLogger
from cape_tpu.train.optim import build_optimizer, create_train_state
from cape_tpu.train.step import (
    build_eval_step,
    build_multi_eval_step,
    build_multi_train_step,
)


class Trainer:
    def __init__(
        self,
        cfg: CAPEConfig,
        model: CAPE,
        ctx: GraphContext,
        data: BodyData,
        workdir: str = "results",
        dp: DataParallel | None = None,
    ):
        if not cfg.name:
            raise ValueError("config.name must be set (run/checkpoint identity)")
        self.cfg = cfg
        self.model = model
        self.data = data
        # BodyData stays in natural vertex order (demos/engines consume it
        # directly); permutation happens only where arrays go to device
        self.vertex_perm = ctx.vertex_perm
        if dp is None:
            n_dev = cfg.data_parallel
            if n_dev == 0:
                # auto mode: the batch axis is sharded across the mesh, so
                # use the largest local device count that divides the batch
                # (e.g. batch 4 on an 8-device host -> 4-device mesh)
                n_all = len(jax.devices())
                n_dev = max(d for d in range(1, n_all + 1) if cfg.batch_size % d == 0)
            elif cfg.batch_size % n_dev != 0:
                raise ValueError(
                    f"data_parallel={n_dev} does not divide batch_size="
                    f"{cfg.batch_size}; the batch axis is sharded evenly "
                    "across the mesh"
                )
            dp = DataParallel(n_dev)
        self.dp = dp
        # multi-controller runs (parallel.multihost): every process executes
        # the same compute; only the lead process touches the filesystem
        # (checkpoints, metrics, profiles)
        self.lead = jax.process_index() == 0
        self.workdir = workdir
        self.run_dir = os.path.join(workdir, cfg.name)
        self.ckpt_dir = os.path.join(self.run_dir, "checkpoints")
        self._ckpt_thread: threading.Thread | None = None
        self._ckpt_exc: BaseException | None = None
        self._snap_jit = None

        n_train = len(data.disp_train)
        self.steps_per_epoch = max(n_train // cfg.batch_size, 1)
        self.num_steps = cfg.num_epochs * self.steps_per_epoch

        self.tx, self.sched_g, self.sched_d = build_optimizer(cfg, self.steps_per_epoch)
        # shape-only TrainState template (no device compute): tensor-
        # parallel modes (parallel.mesh2d.MeshParallel) derive per-leaf
        # param shardings from it; DataParallel ignores it. Passing ctx as
        # an eval_shape argument (not a closure) keeps the big banded
        # blocks out of any traced constant.
        state_template = jax.eval_shape(
            lambda r, c: create_train_state(model.init_params(r, c), self.tx),
            jax.random.PRNGKey(0), ctx,
        )
        # K steps scanned per dispatch: each device dispatch + sync fetch
        # covers cfg.steps_per_dispatch full GAN steps (see
        # train.step.build_multi_train_step; ~1.45x wall-clock on the
        # remote-attached chip, docs/PERF.md)
        self.multi_jit = self.dp.compile_multi_train_step(
            build_multi_train_step(model, cfg, self.tx), state_template
        )
        self.eval_jit = self.dp.compile_eval_step(
            build_eval_step(model, cfg), state_template.params
        )
        # all of a split's eval batches scanned in ONE dispatch (one sync
        # round-trip per eval instead of one per batch; see
        # train.step.build_multi_eval_step)
        self.multi_eval_jit = self.dp.compile_multi_eval_step(
            build_multi_eval_step(model, cfg), state_template.params
        )
        self._eval_split_dev: dict[str, tuple] = {}
        self.ctx = self.dp.replicate(ctx)
        # the packed train arrays live in HBM for the whole run; per-step
        # host traffic is just two [batch] int32 index vectors
        self.train_data_dev = self.dp.replicate(
            {
                "disp": self._to_device_order(data.disp_train),
                "pose": data.pose_train,
                "clo": data.clo_train,
            }
        )

    def _to_device_order(self, disp: np.ndarray) -> np.ndarray:
        if self.vertex_perm is None:
            return disp
        return np.ascontiguousarray(disp[:, self.vertex_perm])

    # ------------------------------------------------------------------
    # async checkpointing: the device->host fetch of the ~125 MB state
    # dominated per-epoch overhead through the remote relay (docs/PERF.md
    # endurance). Snapshot the state into FRESH device buffers (one jitted
    # copy — the live state's buffers are donated to the next dispatch, so
    # they cannot be fetched concurrently), then fetch + write on a worker
    # thread while the next epoch trains. Joined before the next save and
    # at the end of fit, so on return every checkpoint is fully on disk.
    def _join_ckpt(self):
        t = self._ckpt_thread
        if t is not None:
            t.join()
            self._ckpt_thread = None
        if self._ckpt_exc is not None:
            exc, self._ckpt_exc = self._ckpt_exc, None
            raise exc

    def _join_ckpt_all_ranks(self):
        """Join the previous async write and propagate its health to every
        process BEFORE the next collective: without this, a write failure
        raises only on the lead (at its next join) while non-lead ranks
        proceed into the next epoch's collective train step and hang.
        Called by ALL ranks at each save point (lead-only writes)."""
        err: BaseException | None = None
        if self.lead:
            try:
                self._join_ckpt()
            except BaseException as e:
                err = e
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            ok = multihost_utils.broadcast_one_to_all(
                np.int32(0 if err is not None else 1)
            )
            if err is None and not bool(int(ok)):
                raise RuntimeError("checkpoint write failed on the lead process")
        if err is not None:
            raise err

    def _save_ckpt_async(self, state, step: int):
        """Lead-only body; every rank must call _join_ckpt_all_ranks first
        (the Trainer.fit epoch-end path does)."""
        if self._snap_jit is None:
            self._snap_jit = jax.jit(
                lambda s: jax.tree_util.tree_map(jnp.copy, s)
            )
        snap = self._snap_jit(state)

        def work():
            try:
                host = jax.device_get(snap)
                ckpt.save_checkpoint(
                    self.ckpt_dir, host, step, keep=self.cfg.checkpoint_keep,
                )
                # the full state is already on host here, so per-weight
                # TensorBoard histograms cost zero extra device traffic
                tb = getattr(getattr(self, "_logger", None), "tb", None)
                if tb is not None:
                    try:
                        tb.add_param_histograms(step, host.params)
                    except Exception:
                        pass  # observability never fails a checkpoint
            except BaseException as e:  # surfaced at the next join
                self._ckpt_exc = e

        self._ckpt_thread = threading.Thread(
            target=work, name="ckpt-writer", daemon=True
        )
        self._ckpt_thread.start()

    # ------------------------------------------------------------------
    def init_or_restore(self, rng: jax.Array):
        params = self.model.init_params(rng, self.ctx)
        state = create_train_state(params, self.tx)
        if self.cfg.restart:
            if self.lead:
                shutil.rmtree(self.run_dir, ignore_errors=True)
                os.makedirs(self.ckpt_dir, exist_ok=True)
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("cape_tpu:restart_fs")
        elif jax.process_count() > 1:
            # checkpoints are written lead-only (possibly to a host-local
            # filesystem), so the restore DECISION and VALUES must come
            # from the lead — otherwise ranks whose latest_checkpoint()
            # differs silently train divergent replicas
            from jax.experimental import multihost_utils

            host_state = jax.device_get(state)
            if self.lead:
                restored, _ = ckpt.restore_latest(self.ckpt_dir, host_state)
                if restored is not None:
                    host_state = restored
            state = multihost_utils.broadcast_one_to_all(host_state)
            if int(jax.device_get(state.step)) > 0:
                print(
                    f"resumed at step {int(jax.device_get(state.step))} "
                    "(broadcast from lead)", flush=True,
                )
        else:
            restored, latest = ckpt.restore_latest(self.ckpt_dir, jax.device_get(state))
            if restored is not None:
                state = restored
                print(f"resumed from {latest} at step {int(state.step)}", flush=True)
        # one placement seam for every mode: replication under DP,
        # tensor-parallel param shardings under MeshParallel
        return self.dp.shard_state(state)

    # ------------------------------------------------------------------
    def fit(self, seed: int | None = None):
        """Train for cfg.num_epochs. Returns (val recon losses, sec/step)."""
        cfg = self.cfg
        seed = cfg.seed if seed is None else seed
        rng = jax.random.PRNGKey(seed)
        state = self.init_or_restore(rng)
        start_step = int(jax.device_get(state.step))

        logger = MetricsLogger(
            self.run_dir, write=self.lead, tensorboard=cfg.tensorboard
        )
        self._logger = logger
        stream_g = BatchStream(len(self.data.disp_train), cfg.batch_size, seed)
        stream_d = BatchStream(len(self.data.disp_train), cfg.batch_size, seed + 1)
        # resume determinism: replay the index streams to the checkpointed
        # step, so interrupted-and-resumed training consumes exactly the
        # batch sequence an uninterrupted run would
        stream_g.skip(start_step)
        stream_d.skip(start_step)

        val_losses = []
        t_start = time.time()
        t_in_steps = 0.0
        steps_done = 0
        profiling = False
        profiled_steps = 0
        # dispatch in chunks of K scanned steps; each chunk ends with one
        # metric fetch, which both syncs the shallow pipeline (unbounded
        # async queues degrade on remote-attached backends, docs/PERF.md)
        # and amortizes the sync round-trip over the whole chunk
        K = max(1, cfg.steps_per_dispatch)
        end_step = start_step + self.num_steps
        step = start_step
        while step < end_step:
            done_in_run = step - start_step
            to_epoch_end = self.steps_per_epoch - done_in_run % self.steps_per_epoch
            k = min(K, end_step - step, to_epoch_end)

            # optional trace capture over dispatch chunks, starting after
            # the first (warm) chunk, until >= cfg.profile_steps steps are
            # covered (SURVEY §5: the profiling story replacing the
            # reference's TensorBoard-only observability); xprof-viewable
            # start after the first (warm) chunk — unless the whole run fits
            # in one chunk, in which case capture that chunk (cold compile
            # and all) rather than silently never starting
            may_start = 0 < done_in_run or self.num_steps <= k
            if self.lead and cfg.profile_steps and not profiling and may_start and profiled_steps < cfg.profile_steps:
                try:
                    jax.profiler.start_trace(os.path.join(self.run_dir, "profile"))
                    profiling = True
                except Exception as e:  # backend may not support tracing
                    print(f"profiler unavailable: {e}", flush=True)
                    profiled_steps = cfg.profile_steps

            t0 = time.perf_counter()
            idx_g = np.stack([stream_g.next_indices() for _ in range(k)]).astype(np.int32)
            idx_d = np.stack([stream_d.next_indices() for _ in range(k)]).astype(np.int32)
            # per-step RNG is derived from state.step inside the scan body,
            # so chunking does not change the random stream (resume safety)
            state, metrics = self.multi_jit(
                state, self.ctx, self.train_data_dev,
                self.dp.shard_index_chunk(idx_g),
                self.dp.shard_index_chunk(idx_d), rng,
            )
            # chunk sync + failure detection: the fetch that closes the
            # dispatch pipeline also screens every scanned step's losses.
            # Fail fast with the exact step — a NaN that keeps training
            # silently poisons all later checkpoints (every rank fetches
            # identical replicated metrics, so multi-controller runs all
            # raise together instead of hanging in a collective).
            lg, ld = jax.device_get((metrics["loss_g"], metrics["loss_d"]))
            bad = ~(np.isfinite(lg) & np.isfinite(ld))
            if bad.any():
                if profiling:
                    # flush the in-flight trace before aborting: it covers
                    # the failing chunk, and leaving the profiler started
                    # would break any later start_trace in this process
                    jax.profiler.stop_trace()
                    profiling = False
                i = int(np.argmax(bad))
                raise FloatingPointError(
                    f"non-finite training loss at step {step + i} "
                    f"(loss_g={lg[i]}, loss_d={ld[i]}); inspect the data/lr; "
                    f"latest good checkpoint: {ckpt.latest_checkpoint(self.ckpt_dir)}"
                )
            t_in_steps += time.perf_counter() - t0
            steps_done += k

            if profiling:
                profiled_steps += k
                if profiled_steps >= cfg.profile_steps:
                    jax.profiler.stop_trace()
                    profiling = False

            if cfg.log_every_steps and self.lead:
                rows = [i for i in range(k) if (step + i) % cfg.log_every_steps == 0]
                if rows:
                    m_all = jax.device_get(metrics)
                    for i in rows:
                        logger.log(step + i, {kk: float(v[i]) for kk, v in m_all.items()})

            step += k
            is_epoch_end = (step - start_step) % self.steps_per_epoch == 0
            if is_epoch_end or step == end_step:
                epoch = (step - start_step) // self.steps_per_epoch
                m = {kk: float(v[-1]) for kk, v in jax.device_get(metrics).items()}
                m["loss_g_ema"] = logger.ema_g.update(m["loss_g"])
                m["loss_d_ema"] = logger.ema_d.update(m["loss_d"])
                val = self.evaluate(
                    "val", state=state, rng=jax.random.fold_in(rng, 1_000_000_000 + epoch)
                )
                val_losses.append(val["recon"])
                m.update({f"val_{k}": v for k, v in val.items()})
                m["epoch"] = epoch
                m["lr_g"] = float(self.sched_g(step - 1))
                m["sec_per_step"] = (time.time() - t_start) / max(step - start_step, 1)
                # pure train-step time, excluding compile/eval/checkpointing
                m["step_ms"] = 1000.0 * t_in_steps / max(steps_done, 1)
                t_in_steps, steps_done = 0.0, 0
                if self.lead:
                    logger.log(step - 1, m, echo=True)
                self._join_ckpt_all_ranks()   # surfaces prior write errors
                if self.lead:
                    self._save_ckpt_async(state, step)

        if profiling:
            jax.profiler.stop_trace()
        self._join_ckpt_all_ranks()     # final checkpoint fully on disk
        logger.close()
        if self.lead:
            # training-curve dashboard next to metrics.jsonl (the
            # reference's TensorBoard-scalars surface; self-contained HTML)
            try:
                from cape_tpu.tools.plot_metrics import plot_metrics

                plot_metrics(self.run_dir)
            except Exception:
                pass  # curves are a convenience; never fail a finished run
        t_step = (time.time() - t_start) / max(self.num_steps, 1)
        self.state = state
        return val_losses, t_step

    # ------------------------------------------------------------------
    def _split_on_device(self, split: str):
        """Device-resident copy of an eval split (RCM device order).
        'val' is the per-epoch hot path and stays resident for the run;
        other splits are uploaded per call and released after."""
        cached = self._eval_split_dev.get(split)
        if cached is not None:
            return cached
        disp, pose, clo = self.data.split(split)
        dev = self.dp.replicate(
            {"disp": self._to_device_order(disp), "pose": pose, "clo": clo}
        )
        if split == "val":
            self._eval_split_dev[split] = (dev, len(disp))
        return dev, len(disp)

    def evaluate(self, split: str = "val", state=None, rng=None) -> dict:
        """Batched eval over a split, scanned in ONE device dispatch
        (train.step.build_multi_eval_step). The partial tail batch is
        padded to the fixed batch size — pad index entries are out of
        range and gather zero rows — and since eval_fn returns per-sample
        loss vectors, only the real rows enter the averages: the pad
        rows' garbage losses are discarded exactly (fixes the reference's
        dropped-tail-batch quirk, lib/models.py:1083-1088, without
        introducing padding bias). Only the tail batch is padded, so the
        real rows are exactly the first n of the flattened [nb*bs]
        metric vectors."""
        cfg = self.cfg
        state = state if state is not None else getattr(self, "state", None)
        params = state.params if state is not None else None
        if params is None:
            raise ValueError("no trained state available")
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        data_dev, n = self._split_on_device(split)
        bs = cfg.batch_size
        nb = max((n + bs - 1) // bs, 1)
        idx = np.full(nb * bs, n, np.int32)  # out-of-range => zero pad rows
        idx[:n] = np.arange(n, dtype=np.int32)
        metrics = self.multi_eval_jit(
            params, self.ctx, data_dev,
            self.dp.shard_index_chunk(idx.reshape(nb, bs)), rng,
        )
        return {
            # f64 accumulation: the vectors are f32, but a long sum should
            # not depend on its grouping
            k: float(np.sum(np.asarray(v, np.float64).reshape(-1)[:n])) / max(n, 1)
            for k, v in jax.device_get(metrics).items()
        }

    # ------------------------------------------------------------------
    def predict(self, disp, pose, clo, state=None, rng=None) -> np.ndarray:
        """Batched full-dataset autoencoding forward (reference predict,
        lib/models.py:1018-1092). Returns normalized-space predictions."""
        cfg = self.cfg
        state = state if state is not None else self.state
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        disp = self._to_device_order(np.asarray(disp))
        inv = None
        if self.vertex_perm is not None:
            inv = np.empty_like(self.vertex_perm)
            inv[self.vertex_perm] = np.arange(len(self.vertex_perm))
        n = len(disp)
        bs = cfg.batch_size
        outs = []
        for begin in range(0, n, bs):
            end = min(begin + bs, n)
            pad = bs - (end - begin)
            batch = {
                "disp": np.concatenate([disp[begin:end], np.zeros((pad,) + disp.shape[1:], disp.dtype)]),
                "pose": np.concatenate([pose[begin:end], np.zeros((pad,) + pose.shape[1:], pose.dtype)]),
                "clo": np.concatenate([clo[begin:end], np.zeros((pad,) + clo.shape[1:], clo.dtype)]),
            }
            batch = self.dp.shard_batch(batch)
            pred, _ = self.eval_jit(state.params, self.ctx, batch, jax.random.fold_in(rng, begin))
            outs.append(np.asarray(jax.device_get(pred))[: end - begin])
        out = np.concatenate(outs, axis=0)
        return out if inv is None else np.ascontiguousarray(out[:, inv])
