"""Multi-host (multi-process) data parallelism.

The reference is single-process single-GPU (SURVEY §2c). parallel.mesh
scales batch DP across the chips of one host; this module is the seam
where multiple hosts attach — a v5e pod slice's hosts, or any set of
processes reachable over TCP. Design is the standard JAX multi-controller
recipe:

  * every process calls :func:`initialize` (jax.distributed under the
    hood) and then sees the GLOBAL device set in ``jax.devices()``;
  * :class:`MultiHostDataParallel` builds the same 1-D data mesh as
    single-host ``DataParallel``, but over the global devices; params
    stay replicated, the batch axis spans all chips of all hosts;
  * the PRODUCTION path ships only [K, B] int32 index chunks per dispatch
    (``shard_index_chunk``) — the packed dataset is device-resident, so no
    host ever materializes a global *data* batch at all;
  * the explicit-batch path (``shard_batch``) requires every process to
    pass the SAME full global host batch (seed-deterministic streams make
    the reconstruction identical; the selftest hash-checks this) and
    device_puts only this process's rows via
    ``jax.make_array_from_process_local_data``;
  * the train step is unchanged: XLA's sharding propagation inserts the
    gradient all-reduce, which rides ICI within a host/slice and the
    host interconnect (gloo over TCP on CPU, DCN on pods) across.

Verified without TPU-pod hardware by the 2-process virtual-CPU selftest
(tests/test_parallel.py::test_multihost_two_process_step): two OS
processes x 4 virtual CPU devices run one global-batch-16 train step and
must agree with each other on the psum'd metrics.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

from cape_tpu.parallel.mesh import DataParallel


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join (or create) the distributed runtime. Idempotent.

    With no arguments, jax auto-detects cluster parameters from the
    environment (TPU pod metadata, or JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID). Single-process runs may skip
    calling this entirely.
    """
    if getattr(initialize, "_done", False):
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        # NOTE: must run before anything initializes the XLA backend
        # (jax.devices(), any computation) — do not query process_count
        # here, that's itself a backend-initializing call.
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise
    initialize._done = True


class MultiHostDataParallel(DataParallel):
    """DataParallel over the global (all-process) device set.

    Same sharding rules as the single-host class — batch split on the
    leading axis, everything else replicated — but ``shard_batch`` takes
    each process's LOCAL slice of the batch and assembles the global
    sharded array in place.
    """

    def __init__(self):
        super().__init__(devices=jax.devices())   # global, process-ordered

    @property
    def process_count(self) -> int:
        return jax.process_count()

    def local_rows(self, global_batch_size: int) -> tuple[int, int]:
        """[start, stop) rows of the global batch this process feeds."""
        n, p = jax.process_count(), jax.process_index()
        assert global_batch_size % n == 0, (
            f"global batch {global_batch_size} must divide over {n} processes"
        )
        per = global_batch_size // n
        return p * per, (p + 1) * per

    def shard_batch(self, global_batch: Any) -> Any:
        """Assemble the global sharded batch.

        Every process passes the SAME global batch (the framework's index
        streams are seed-deterministic, so each controller reconstructs it
        identically — the standard multi-controller recipe); only this
        process's rows are device_put, the rest are dropped host-side.
        """
        if jax.process_count() == 1:
            return super().shard_batch(global_batch)

        def put(x):
            x = np.asarray(x)
            lo, hi = self.local_rows(len(x))
            return jax.make_array_from_process_local_data(
                self.batch_sharding, np.ascontiguousarray(x[lo:hi])
            )

        return jax.tree_util.tree_map(put, global_batch)

    def shard_index_chunk(self, idx: Any) -> Any:
        """[K, B] scanned index chunk: shard the batch axis (axis 1)."""
        if jax.process_count() == 1:
            return super().shard_index_chunk(idx)
        idx = np.asarray(idx)
        lo, hi = self.local_rows(idx.shape[1])
        from jax.sharding import NamedSharding, PartitionSpec as P

        from cape_tpu.parallel.mesh import DATA_AXIS

        return jax.make_array_from_process_local_data(
            NamedSharding(self.mesh, P(None, DATA_AXIS)),
            np.ascontiguousarray(idx[:, lo:hi]),
        )

    def compile_eval_step(self, eval_fn, params_template=None):
        """Multi-host eval: outputs replicated (the single-host version
        leaves them batch-sharded, which a per-controller device_get
        could not read across processes)."""
        return jax.jit(
            eval_fn,
            in_shardings=(
                self.replicated,
                self.replicated,
                self.batch_sharding,
                self.replicated,
            ),
            out_shardings=(self.replicated, self.replicated),
        )

    def compile_multi_eval_step(self, multi_eval_fn, params_template=None):
        """Scanned one-dispatch eval over the global mesh: index chunks
        arrive via shard_index_chunk ([nb, B], batch axis sharded across
        processes), metrics come back REPLICATED so every controller's
        device_get can read them (same reason as compile_eval_step)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from cape_tpu.parallel.mesh import DATA_AXIS

        idx_sharding = NamedSharding(self.mesh, P(None, DATA_AXIS))
        return jax.jit(
            multi_eval_fn,
            in_shardings=(
                self.replicated,
                self.replicated,
                self.replicated,
                idx_sharding,
                self.replicated,
            ),
            out_shardings=self.replicated,
        )


# ----------------------------------------------------------------- selftest
def _selftest(rank: int, nprocs: int, port: int) -> None:
    """One global train step on a tiny model; prints one JSON metrics line.

    Run by tests/test_parallel.py in N OS processes against a virtual
    CPU device set; every process must print identical psum'd metrics.
    """
    initialize(f"localhost:{port}", nprocs, rank)

    from cape_tpu.core.config import CAPEConfig
    from cape_tpu.data.loader import BatchStream, make_gan_batch
    from cape_tpu.data.synthetic import synthetic_bodydata
    from cape_tpu.meshops.pyramid import build_pyramid
    from cape_tpu.meshops.topology import vertices_per_edge
    from cape_tpu.meshops.toy import icosphere
    from cape_tpu.models.cape import CAPE
    from cape_tpu.ops.sparse import build_graph_context
    from cape_tpu.train.optim import build_optimizer, create_train_state
    from cape_tpu.train.step import build_train_step

    verts, faces = icosphere(3)
    nv = len(verts)
    n_dev = len(jax.devices())
    cfg = CAPEConfig(
        name="multihost_selftest", nf=4, nz=8, nz_cond=8, nz_cond2=4,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=8, batch_size=2 * n_dev, data_parallel=n_dev,
    )
    pyr = build_pyramid(verts, faces, cfg.ds_factors)
    pyr_d = build_pyramid(verts, faces, [2, 2, 2, 2])
    ctx = build_graph_context(
        pyr, pyr_d, vertices_per_edge(faces, nv), verts,
        padded=cfg.padded_layout,   # production layout
    )

    model = CAPE(cfg)
    # host-resident copies: multi-process device_put to a GLOBAL sharding
    # must start from process-local host values (identical on every rank —
    # init is deterministic from the shared seed)
    params = jax.device_get(model.init_params(jax.random.PRNGKey(0), ctx))
    ctx = jax.device_get(ctx)
    tx, _, _ = build_optimizer(cfg, steps_per_epoch=10)

    mh = MultiHostDataParallel()
    assert mh.num_devices == n_dev

    # every process reconstructs the same global batch deterministically;
    # shard_batch keeps only this process's rows
    data = synthetic_bodydata(n_train=64, n_test=8, num_verts=nv, seed=0, n_val=8)
    sg = BatchStream(len(data.disp_train), cfg.batch_size, 0)
    sd = BatchStream(len(data.disp_train), cfg.batch_size, 1)
    host_batch = make_gan_batch(data, sg, sd)
    # the explicit-batch contract: every rank passes the SAME global batch
    # (module docstring). Verify it really is identical across ranks.
    import hashlib

    digest = hashlib.sha256(
        b"".join(np.ascontiguousarray(v).tobytes() for v in
                 (host_batch[k] for k in sorted(host_batch)))
    ).hexdigest()
    from jax.experimental import multihost_utils

    digests = multihost_utils.process_allgather(
        np.frombuffer(bytes.fromhex(digest)[:8], dtype=np.int64)
    )
    assert np.all(digests == digests[0]), "global batch differs across ranks"
    batch = mh.shard_batch(host_batch)

    step_fn = mh.compile_train_step(build_train_step(model, cfg, tx))
    state = mh.replicate(create_train_state(params, tx))
    new_state, metrics = step_fn(
        state, mh.replicate(ctx), batch, jax.random.PRNGKey(2)
    )
    jax.block_until_ready(new_state)
    m = {k: round(float(v), 6) for k, v in jax.device_get(metrics).items()}
    assert all(np.isfinite(v) for v in m.values()), m
    print("SELFTEST " + json.dumps({"rank": rank, "metrics": m}), flush=True)


def _selftest_trainer(rank: int, nprocs: int, port: int) -> None:
    """Short multi-controller Trainer.fit on the tiny model; prints one
    JSON line with the per-epoch validation recon losses. Exercises the
    full production path — resident dataset, scanned dispatch with
    sharded index chunks, per-epoch padded eval, lead-only checkpoint
    writes — across processes."""
    import tempfile

    initialize(f"localhost:{port}", nprocs, rank)

    from cape_tpu.core.config import CAPEConfig
    from cape_tpu.data.synthetic import synthetic_bodydata
    from cape_tpu.meshops.pyramid import build_pyramid
    from cape_tpu.meshops.topology import vertices_per_edge
    from cape_tpu.meshops.toy import icosphere
    from cape_tpu.models.cape import CAPE
    from cape_tpu.ops.sparse import build_graph_context
    from cape_tpu.train.loop import Trainer

    verts, faces = icosphere(3)
    nv = len(verts)
    n_dev = len(jax.devices())
    cfg = CAPEConfig(
        name="multihost_trainer", nf=4, nz=8, nz_cond=8, nz_cond2=4,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=8, batch_size=2 * n_dev, data_parallel=n_dev,
        num_epochs=2, steps_per_dispatch=3, log_every_steps=0,
    )
    pyr = build_pyramid(verts, faces, cfg.ds_factors)
    pyr_d = build_pyramid(verts, faces, [2, 2, 2, 2])
    ctx = build_graph_context(
        pyr, pyr_d, vertices_per_edge(faces, nv), verts,
        padded=cfg.padded_layout,   # production layout
    )
    # 64 - 16 val = 48 train rows -> 3 steps/epoch at global batch 16
    data = synthetic_bodydata(n_train=64, n_test=8, num_verts=nv, seed=0, n_val=16)

    workdir = os.path.join(tempfile.gettempdir(), f"cape_mh_{port}")
    mh = MultiHostDataParallel()
    trainer = Trainer(cfg, CAPE(cfg), ctx, data, workdir=workdir, dp=mh)
    val_losses, _ = trainer.fit()
    out = {"rank": rank, "val_recon": [round(float(v), 6) for v in val_losses]}
    assert all(np.isfinite(v) for v in out["val_recon"]), out

    # resume phase with DIVERGENT host filesystems: only the lead's
    # workdir holds the checkpoint (non-lead points at an empty dir);
    # init_or_restore must broadcast the lead's restored state so every
    # rank continues from the same step
    wd2 = workdir if rank == 0 else workdir + "_empty"
    cfg2 = cfg.replace(restart=False, num_epochs=1)
    trainer2 = Trainer(cfg2, CAPE(cfg2), ctx, data, workdir=wd2, dp=mh)
    trainer2.fit()
    out["resume_end_step"] = int(jax.device_get(trainer2.state.step))
    print("SELFTEST " + json.dumps(out), flush=True)


if __name__ == "__main__":  # python -m cape_tpu.parallel.multihost RANK N PORT
    import sys

    # selftest harness runs on the virtual CPU platform (the spawning test
    # sets XLA_FLAGS --xla_force_host_platform_device_count); override any
    # sitecustomize-forced platform before the backend initializes
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    fn = _selftest_trainer if "trainer" in sys.argv[4:] else _selftest
    fn(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
