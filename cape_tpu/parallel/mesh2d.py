"""2-D device mesh: data x model (tensor) parallelism.

The 1-D `parallel.mesh.DataParallel` seam generalizes here to a
("data", "model") mesh: the batch axis shards over "data" exactly as
before, and network weight matrices additionally shard a channel axis
over "model". Nothing is hand-communicated — XLA's GSPMD partitioner
propagates activation shardings from the annotated parameters and
inserts the collectives (all-gather / reduce-scatter / psum) over ICI.
That is the standard TPU recipe: pick a mesh, annotate shardings, let
the compiler place communication. Partitioning is semantics-preserving,
so the rules below can only affect performance, never results
(single-device equivalence is tested on the virtual 8-device mesh,
tests/test_parallel.py).

Scope note: CAPE at reference scale fits comfortably on one chip, so
tensor parallelism here is headroom for wider channel plans / bigger
meshes rather than a measured win — no multi-chip TPU hardware is
attachable from this environment (same caveat as DataParallel;
docs/PERF.md). The rules shard a conv weight [K, fin, fout] on fout
(column-parallel) when divisible, else fin (row-parallel, XLA inserts
the partial-sum reduction), else replicate; dense and bias leaves
follow the same pattern.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh_2d(dp: int, tp: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = dp * tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices for a {dp}x{tp} mesh, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


class MeshParallel:
    """Owns a ("data", "model") mesh and the sharding rules for CAPE.

    batch tensors   -> leading axis over DATA_AXIS
    weight matrices -> one channel axis over MODEL_AXIS (see _leaf_spec)
    graph constants, rng, scalars -> replicated
    """

    def __init__(self, dp: int, tp: int, devices=None):
        self.dp = dp
        self.tp = tp
        self.mesh = make_mesh_2d(dp, tp, devices)
        self.batch_sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        self.replicated = NamedSharding(self.mesh, P())

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    # ------------------------------------------------------------- sharding
    def _leaf_spec(self, x) -> P:
        """Partition rule by leaf shape. Conv weights are [K, fin, fout],
        dense are [in, out], biases [fout] (cape_tpu.core.params); prefer
        column-parallel (shard fout), fall back to row-parallel (shard
        fin), else replicate. Divisibility by tp is required for an axis
        to shard."""
        shape = getattr(x, "shape", ())
        tp = self.tp
        if len(shape) == 3:
            if shape[2] % tp == 0 and shape[2] >= tp:
                return P(None, None, MODEL_AXIS)
            if shape[1] % tp == 0 and shape[1] >= tp:
                return P(None, MODEL_AXIS, None)
        elif len(shape) == 2:
            if shape[1] % tp == 0 and shape[1] >= tp:
                return P(None, MODEL_AXIS)
            if shape[0] % tp == 0 and shape[0] >= tp:
                return P(MODEL_AXIS, None)
        elif len(shape) == 1:
            if shape[0] % tp == 0 and shape[0] >= tp:
                return P(MODEL_AXIS)
        return P()

    def state_shardings(self, state: Any):
        """NamedSharding pytree for a TrainState (params + optimizer state;
        adam moments share the param shapes, scalars replicate)."""
        return jax.tree_util.tree_map(
            lambda x: NamedSharding(self.mesh, self._leaf_spec(x)), state
        )

    # ------------------------------------------------------------ placement
    def shard_batch(self, batch: Any) -> Any:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self.batch_sharding), batch
        )

    def replicate(self, tree: Any) -> Any:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self.replicated), tree
        )

    def shard_state(self, state: Any) -> Any:
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), state, self.state_shardings(state)
        )

    def shard_index_chunk(self, idx):
        """[K, B] scanned index chunk; jit's in_shardings places it
        (single-host, same as DataParallel)."""
        return idx

    def pad_batch_size(self, global_batch: int) -> int:
        """The batch axis shards over the data dimension only."""
        return ((global_batch + self.dp - 1) // self.dp) * self.dp

    # -------------------------------------------------------------- compile
    def compile_train_step(self, step_fn, state_template: Any):
        """jit the (state, ctx, batch, rng) train step with DP+TP shardings.
        `state_template` provides the leaf shapes for the param rules."""
        ss = self.state_shardings(state_template)
        return jax.jit(
            step_fn,
            in_shardings=(ss, self.replicated, self.batch_sharding, self.replicated),
            out_shardings=(ss, self.replicated),
            donate_argnums=(0,),
        )

    def compile_multi_train_step(self, multi_fn, state_template: Any):
        """Scanned K-steps-per-dispatch over the resident dataset; index
        arrays [K, B] shard the batch axis (axis 1) over DATA_AXIS."""
        ss = self.state_shardings(state_template)
        idx_sharding = NamedSharding(self.mesh, P(None, DATA_AXIS))
        return jax.jit(
            multi_fn,
            in_shardings=(
                ss, self.replicated, self.replicated,
                idx_sharding, idx_sharding, self.replicated,
            ),
            out_shardings=(ss, self.replicated),
            donate_argnums=(0,),
        )

    def compile_eval_step(self, eval_fn, params_template: Any):
        """(params, ctx, batch, rng) eval step with tensor-parallel param
        shardings; outputs keep the batch axis sharded over DATA_AXIS (the
        Trainer's per-controller device_get reads them — single-host)."""
        ps = jax.tree_util.tree_map(
            lambda x: NamedSharding(self.mesh, self._leaf_spec(x)), params_template
        )
        return jax.jit(
            eval_fn,
            in_shardings=(ps, self.replicated, self.batch_sharding, self.replicated),
            out_shardings=(self.batch_sharding, self.batch_sharding),
        )

    def compile_multi_eval_step(self, multi_eval_fn, params_template: Any):
        """Scanned one-dispatch eval (train.step.build_multi_eval_step)
        with tensor-parallel param shardings; the [nb, B] index array and
        stacked metrics shard the batch axis over DATA_AXIS."""
        ps = jax.tree_util.tree_map(
            lambda x: NamedSharding(self.mesh, self._leaf_spec(x)), params_template
        )
        idx_sharding = NamedSharding(self.mesh, P(None, DATA_AXIS))
        return jax.jit(
            multi_eval_fn,
            in_shardings=(
                ps, self.replicated, self.replicated, idx_sharding, self.replicated,
            ),
            out_shardings=idx_sharding,
        )
