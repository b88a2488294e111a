"""Batched inference engine: encode / decode / condition-embedding helpers.

Replaces the reference's session-restoring batched loops
(lib/models.py:931-1174: encode, encode_only_condition, predict, decode)
with jitted fixed-batch functions plus host-side padding loops. Same
contracts, including decode's one-condition-many-z broadcast
(lib/models.py:1155-1158).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cape_tpu.models.cape import CAPE
from cape_tpu.ops.sparse import GraphContext


def _sample_z_rows(seed, offsets, z_mean, z_logvar):
    """Row-keyed reparameterization (same clamp as CAPE.sample_z): row i
    draws its eps from fold_in(key(seed), offsets[i]), so results are
    independent of how the host loop chunks/pads the batch. The key is
    built from the integer seed INSIDE the jit (traced, no eager
    dispatch) — eager ops are pathological on remote-attached backends."""
    rng = jax.random.PRNGKey(seed)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(rng, offsets)
    eps = jax.vmap(
        lambda k: jax.random.normal(k, z_mean.shape[1:], z_mean.dtype)
    )(keys)
    sigma = jnp.exp(0.5 * jnp.clip(z_logvar, -30.0, 30.0))
    return z_mean + sigma * eps


def broadcast_conditions(y, y2, n: int):
    """1-row y/y2 embeddings broadcast over n rows (reference decode
    semantics, lib/models.py:1155-1158); shared by the live and exported
    engines' decode."""
    y = np.asarray(y, np.float32)
    y2 = np.asarray(y2, np.float32)
    if y.shape[0] == 1:
        y = np.repeat(y, n, axis=0)
    if y2.shape[0] == 1:
        y2 = np.repeat(y2, n, axis=0)
    return y, y2


def _pad_to(arr: np.ndarray, n: int) -> np.ndarray:
    pad = n - arr.shape[0]
    if pad <= 0:
        return arr[:n]
    return np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])


class BatchedCalls:
    """Host-side fixed-batch loop shared by the live engine and the
    exported-artifact engine (tools/export_model.ExportedEngine): pad each
    chunk to `batch_size` so every call hits one compiled executable."""

    batch_size: int

    def _place(self, arrays):
        """Device placement hook for the padded chunk (identity by
        default; the mesh-parallel engine shards the batch axis here)."""
        return arrays

    def _batched(self, fn, n: int, *arrays):
        if n <= 0:
            raise ValueError(
                "empty batch: callers must guard n == 0 (nothing to infer)"
            )
        outs = None
        bs = self.batch_size
        for begin in range(0, n, bs):
            end = min(begin + bs, n)
            padded = self._place([_pad_to(a[begin:end], bs) for a in arrays])
            res = fn(*padded)
            res = res if isinstance(res, tuple) else (res,)
            res = [np.asarray(jax.device_get(r))[: end - begin] for r in res]
            if outs is None:
                outs = [[] for _ in res]
            for o, r in zip(outs, res):
                o.append(r)
        return tuple(np.concatenate(o, axis=0) for o in outs)


class InferenceEngine(BatchedCalls):
    """Public contract is in natural (template) vertex order; when the
    context uses the banded reordered formulation, inputs are permuted and
    outputs un-permuted at this host boundary."""

    def __init__(
        self, model: CAPE, ctx: GraphContext, params: dict,
        batch_size: int = 16, dp=None,
    ):
        """`dp` (an optional parallel.mesh.DataParallel) scales bulk
        inference over the device mesh: each compiled call processes
        `batch_size` rows PER DEVICE — params/ctx are replicated, the
        batch axis is sharded, and GSPMD partitions the executables. The
        public contract (host numpy in/out, natural vertex order) is
        unchanged; per-sample math is independent along the batch axis,
        so outputs match the single-device engine."""
        self.model = model
        self.dp = dp
        if dp is not None:
            ctx = dp.replicate(ctx)
            params = dp.replicate(params)
            batch_size = batch_size * dp.num_devices
        self.ctx = ctx
        self.params = params
        self.batch_size = batch_size
        self.vertex_perm = ctx.vertex_perm
        self._inv_perm = None
        if self.vertex_perm is not None:
            self._inv_perm = np.empty_like(self.vertex_perm)
            self._inv_perm[self.vertex_perm] = np.arange(len(self.vertex_perm))

        # ctx is an explicit jit argument, never a closure: closed-over
        # GraphContext constants get inlined into the HLO and the remote
        # compile upload fails (HTTP 413) — see CLAUDE.md and the
        # tests/test_apps.py jit-closure lint
        self._embed = jax.jit(model.embed_conditions)
        self._encode = jax.jit(model.encode)
        self._decode = jax.jit(model.decode)
        self._discriminate = jax.jit(model.discriminate)
        self._sample_rows = jax.jit(_sample_z_rows)

    def _place(self, arrays):
        if self.dp is None:
            return arrays
        return [jax.device_put(a, self.dp.batch_sharding) for a in arrays]

    # ------------------------------------------------------------------
    def encode_only_condition(self, pose: np.ndarray, clo: np.ndarray):
        """(pose [N,126], clo [N,4]) -> (y [N,nz_cond], y2 [N,nz_cond2])."""
        pose = np.asarray(pose, np.float32)
        clo = np.asarray(clo, np.float32)
        return self._batched(
            lambda p, c: self._embed(self.params, p, c), len(pose), pose, clo
        )

    def _to_device_order(self, disp: np.ndarray) -> np.ndarray:
        if self.vertex_perm is None:
            return disp
        return np.ascontiguousarray(disp[:, self.vertex_perm])

    def _to_natural_order(self, disp: np.ndarray) -> np.ndarray:
        if self._inv_perm is None:
            return disp
        return np.ascontiguousarray(disp[:, self._inv_perm])

    def encode(self, disp: np.ndarray, pose: np.ndarray, clo: np.ndarray):
        """Returns (z_mean, z_logvar, y, y2)."""
        disp = self._to_device_order(np.asarray(disp, np.float32))
        pose = np.asarray(pose, np.float32)
        clo = np.asarray(clo, np.float32)

        def fn(d, p, c):
            y, y2 = self._embed(self.params, p, c)
            zm, zl = self._encode(self.params, self.ctx, d, y, y2)
            return zm, zl, y, y2

        return self._batched(fn, len(disp), disp, pose, clo)

    def decode(self, z_total: np.ndarray, y: np.ndarray, y2: np.ndarray):
        """z_total [N, nz+nz_cond+nz_cond2] -> disp [N, V, 3]. y / y2 may
        have one row (broadcast over all z, reference decode semantics)."""
        z_total = np.asarray(z_total, np.float32)
        n = len(z_total)
        y, y2 = broadcast_conditions(y, y2, n)
        (out,) = self._batched(
            lambda z, a, b: self._decode(self.params, self.ctx, z, a, b), n, z_total, y, y2
        )
        return self._to_natural_order(out)

    def autoencode(self, disp, pose, clo, rng=None, sample: bool = False):
        """Full reconstruction. sample=False uses the posterior mean (the
        deterministic eval path); sample=True draws z like training.
        `rng` is an integer seed (preferred: stays host-side until the
        jitted sampler) or a PRNGKey (accepted for back-compat; its last
        word is fetched as the seed)."""
        z_mean, z_logvar, y, y2 = self.encode(disp, pose, clo)
        if sample:
            if rng is None:
                seed = 0
            elif isinstance(rng, (int, np.integer)):
                seed = int(rng)
            else:
                seed = int(np.asarray(jax.device_get(rng)).ravel()[-1])
            seed = np.uint32(seed)
            offsets = np.arange(len(z_mean), dtype=np.int32)
            (z,) = self._batched(
                lambda o, zm, zl: self._sample_rows(seed, o, zm, zl),
                len(z_mean), offsets, z_mean, z_logvar,
            )
        else:
            z = z_mean
        z_total = np.concatenate([z, y, y2], axis=-1)
        return self.decode(z_total, y, y2)
