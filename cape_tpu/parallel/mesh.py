"""Device mesh and data-parallel sharding — the framework's single
communication seam.

The reference is single-process single-GPU with no distributed backend
(SURVEY §2c); parallelism here is by design: batch data parallelism over a
1-D `jax.sharding.Mesh`, with parameters/optimizer state replicated and
the batch axis sharded. Gradient all-reduce is *not* hand-written: the
per-device partial sums flow through XLA's sharding propagation, which
inserts the psum over ICI. The 2-D (data x model) tensor-parallel mesh
lives in parallel.mesh2d, and multi-host (multi-process) scaling in
parallel.multihost; both follow the same philosophy.

Multi-chip behavior is testable without hardware via
XLA_FLAGS=--xla_force_host_platform_device_count=N (see tests/conftest.py
and __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n (default: all) local devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices and n_devices > 0:
        if n_devices > len(devices):
            # slicing would silently run an N-way request on fewer devices
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


class DataParallel:
    """Owns the mesh and the sharding rules for CAPE training.

    batch tensors  -> sharded on leading axis over DATA_AXIS
    everything else (params, opt state, graph constants, rng) -> replicated
    """

    def __init__(self, n_devices: int = 0, devices=None):
        self.mesh = make_mesh(n_devices, devices)
        self.batch_sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        self.replicated = NamedSharding(self.mesh, P())

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    def shard_batch(self, batch: Any) -> Any:
        """Device_put a host batch with the leading axis split across the mesh."""
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self.batch_sharding), batch
        )

    def replicate(self, tree: Any) -> Any:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self.replicated), tree
        )

    def shard_state(self, state: Any) -> Any:
        """Place a TrainState for this parallelism mode. DP replicates;
        MeshParallel overrides with its tensor-parallel param shardings —
        the Trainer calls this one seam for both."""
        return self.replicate(state)

    def compile_train_step(self, step_fn):
        """jit the train step with DP shardings pinned on the batch argument."""
        return jax.jit(
            step_fn,
            in_shardings=(
                self.replicated,            # state
                self.replicated,            # graph context
                self.batch_sharding,        # batch
                self.replicated,            # rng
            ),
            out_shardings=(self.replicated, self.replicated),
            donate_argnums=(0,),
        )

    def shard_index_chunk(self, idx):
        """Placement hook for a [K, B] scanned index chunk (axis 1 =
        batch). Single-host: jit's in_shardings handles plain numpy;
        multi-host overrides this (parallel.multihost)."""
        return idx

    def compile_resident_train_step(self, step_fn):
        """Device-resident-dataset step: data replicated, index vectors
        sharded on the batch axis (each device gathers its own shard of
        the batch from its local dataset copy)."""
        return jax.jit(
            step_fn,
            in_shardings=(
                self.replicated,            # state
                self.replicated,            # graph context
                self.replicated,            # resident dataset
                self.batch_sharding,        # idx_g
                self.batch_sharding,        # idx_d
                self.replicated,            # rng
            ),
            out_shardings=(self.replicated, self.replicated),
            donate_argnums=(0,),
        )

    def compile_multi_train_step(self, multi_fn, state_template: Any = None):
        """Scanned K-steps-per-dispatch variant of the resident step:
        index arrays are [K, B] with the batch axis (axis 1) sharded.
        `state_template` (leaf shapes for param sharding rules) is unused
        here — params replicate under DP — but part of the shared seam so
        the Trainer can drive DataParallel and MeshParallel identically."""
        idx_sharding = NamedSharding(self.mesh, P(None, DATA_AXIS))
        return jax.jit(
            multi_fn,
            in_shardings=(
                self.replicated,            # state
                self.replicated,            # graph context
                self.replicated,            # resident dataset
                idx_sharding,               # idx_g [K, B]
                idx_sharding,               # idx_d [K, B]
                self.replicated,            # rng
            ),
            out_shardings=(self.replicated, self.replicated),
            donate_argnums=(0,),
        )

    def compile_eval_step(self, eval_fn, params_template: Any = None):
        # both outputs carry the batch axis (pred [B,V,3], per-sample
        # metric vectors [B]) and stay sharded over it; params_template is
        # part of the shared parallelism seam (used by MeshParallel)
        return jax.jit(
            eval_fn,
            in_shardings=(
                self.replicated,
                self.replicated,
                self.batch_sharding,
                self.replicated,
            ),
            out_shardings=(self.batch_sharding, self.batch_sharding),
        )

    def compile_multi_eval_step(self, multi_eval_fn, params_template: Any = None):
        """Scanned eval: every batch of a device-resident split in one
        dispatch (train.step.build_multi_eval_step). The [nb, B] index
        array and the stacked [nb, B] per-sample metrics both shard the
        batch axis; params_template is part of the shared parallelism
        seam (used by MeshParallel)."""
        idx_sharding = NamedSharding(self.mesh, P(None, DATA_AXIS))
        return jax.jit(
            multi_eval_fn,
            in_shardings=(
                self.replicated,            # params
                self.replicated,            # graph context
                self.replicated,            # resident split
                idx_sharding,               # idx [nb, B]
                self.replicated,            # rng
            ),
            out_shardings=idx_sharding,
        )

    def pad_batch_size(self, global_batch: int) -> int:
        """Round a global batch up to a multiple of the mesh size."""
        n = self.num_devices
        return ((global_batch + n - 1) // n) * n
