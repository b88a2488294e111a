"""Device-side sparse operators over fixed mesh topology.

Converts host scipy matrices (cape_tpu.meshops) into jit-friendly pytrees.
Three operator flavors, all with the same apply contract
`op(x: [..., n_cols, C]) -> [..., n_rows, C]`:

  IdentityOp — factor-1 pyramid levels ship identity D/U; skip them.
  EllOp      — fixed-width row gather: y[r] = sum_w val[r,w] * x[idx[r,w]].
               Memory-bound, tiny; the default for all pyramid matrices
               (max row width 11 for Laplacians, 3 for upsamples, 1 for
               downsample selections, which reduce to a pure gather).
  DenseOp    — materialized dense matmul on the MXU; ~25x slower than the
               gather form for these sizes (kept for A/B benchmarking).

Every EllOp carries its *transpose* in ELL form and applies through a
custom VJP: the backward pass is then another fixed-width gather. Without
this, XLA's autodiff transpose of gather+einsum materializes a
[batch, rows, width, chan] temporary and a scatter-add — measured 400x
slower at batch 64 and OOM at batch 256 on v5e (see bench history).

`GraphContext` bundles the per-level operators plus the geometry constants
(template verts, edge table, loss mask) that the model and losses need,
as one pytree passed into jitted functions.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from flax import struct

from cape_tpu.meshops.pyramid import MeshPyramid


def _gather_apply(x: jnp.ndarray, idx: jnp.ndarray, val: jnp.ndarray) -> jnp.ndarray:
    """y[..., r, c] = sum_w val[r, w] * x[..., idx[r, w], c].

    Accumulated as `width` separate [.., rows, C] gathers: a single
    [.., rows, width, C] gather+einsum tempts XLA into materializing the
    width-times-larger temporary at batch >= 64 (measured 400x slowdown /
    OOM on v5e); the accumulation form stays fused and flat in memory.
    """
    val = val.astype(x.dtype)
    width = idx.shape[1]
    y = val[:, 0, None] * jnp.take(x, idx[:, 0], axis=-2)
    for w in range(1, width):
        y = y + val[:, w, None] * jnp.take(x, idx[:, w], axis=-2)
    return y


def _select_apply(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(x, idx[:, 0], axis=-2)


def _ell_primal(select, x, idx, val, t_idx, t_val):
    return _select_apply(x, idx) if select else _gather_apply(x, idx, val)


ell_matvec = jax.custom_vjp(_ell_primal, nondiff_argnums=(0,))


def _ell_fwd(select, x, idx, val, t_idx, t_val):
    return _ell_primal(select, x, idx, val, t_idx, t_val), (val, t_idx, t_val)


def _ell_bwd(select, res, g):
    val, t_idx, t_val = res
    dx = _gather_apply(g, t_idx, t_val)
    zero_val = None if val is None else jnp.zeros_like(val)
    return (dx, None, zero_val, None, jnp.zeros_like(t_val))


ell_matvec.defvjp(_ell_fwd, _ell_bwd)


@struct.dataclass
class IdentityOp:
    n_rows: int = struct.field(pytree_node=False)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x

    @property
    def shape(self):
        return (self.n_rows, self.n_rows)


@struct.dataclass
class EllOp:
    """Fixed-width (ELL) sparse matrix with its transpose, custom-VJP apply."""

    idx: jnp.ndarray                                  # [rows, width] int32
    val: jnp.ndarray | None                           # [rows, width]; None for selection
    t_idx: jnp.ndarray                                # [cols, t_width] int32
    t_val: jnp.ndarray                                # [cols, t_width]
    n_cols: int = struct.field(pytree_node=False)
    select: bool = struct.field(pytree_node=False, default=False)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return ell_matvec(self.select, x, self.idx, self.val, self.t_idx, self.t_val)

    @property
    def shape(self):
        return (self.idx.shape[0], self.n_cols)


@struct.dataclass
class DenseOp:
    """Materialized dense matrix apply (MXU path)."""

    mat: jnp.ndarray                                  # [rows, cols]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum(
            "rc,...cf->...rf", self.mat.astype(x.dtype), x,
            preferred_element_type=x.dtype,
        )

    @property
    def shape(self):
        return self.mat.shape


def _is_identity(m: sp.spmatrix) -> bool:
    m = sp.csr_matrix(m)
    if m.shape[0] != m.shape[1] or m.nnz != m.shape[0]:
        return False
    coo = m.tocoo()
    return bool(np.all(coo.row == coo.col) and np.allclose(coo.data, 1.0))


def _pack_ell(csr: sp.csr_matrix) -> tuple[np.ndarray, np.ndarray]:
    """CSR -> padded (idx, val). Padded slots point at row 0 with weight 0."""
    rows = csr.shape[0]
    row_nnz = np.diff(csr.indptr)
    width = int(max(1, row_nnz.max() if rows else 1))
    idx = np.zeros((rows, width), dtype=np.int32)
    val = np.zeros((rows, width), dtype=np.float32)
    for r in range(rows):
        lo, hi = csr.indptr[r], csr.indptr[r + 1]
        idx[r, : hi - lo] = csr.indices[lo:hi]
        val[r, : hi - lo] = csr.data[lo:hi]
    return idx, val


def ell_from_scipy(m: sp.spmatrix, dtype=jnp.float32) -> EllOp:
    """Pack a scipy sparse matrix (and its transpose) into gather form."""
    csr = sp.csr_matrix(m)
    rows, cols = csr.shape
    idx, val = _pack_ell(csr)
    t_idx, t_val = _pack_ell(sp.csr_matrix(m.T))

    row_nnz = np.diff(csr.indptr)
    select = bool(idx.shape[1] == 1 and np.all(row_nnz == 1) and np.allclose(csr.data, 1.0))
    return EllOp(
        idx=jnp.asarray(idx),
        val=None if select else jnp.asarray(val, dtype=dtype),
        t_idx=jnp.asarray(t_idx),
        t_val=jnp.asarray(t_val, dtype=dtype),
        n_cols=cols,
        select=select,
    )


def dense_from_scipy(m: sp.spmatrix, dtype=jnp.float32) -> DenseOp:
    return DenseOp(mat=jnp.asarray(sp.csr_matrix(m).toarray(), dtype=dtype))


def make_op(
    m: sp.spmatrix, mode: str = "auto", dtype=jnp.float32,
    padded: bool = False, allow_pallas: bool = True,
):
    """Pick the device representation for a host sparse matrix.

    mode: 'auto' | 'banded' | 'ell' | 'dense'. Identities are always
    elided. 'banded' (requires a pre-permuted banded matrix, see
    meshops.ordering) is the production path — static-slice block matmuls,
    no gathers; 'ell' is the gather fallback for arbitrary sparsity;
    'dense' is ~25x slower than ELL at these sizes (kept for A/B).
    padded (banded only) builds the op in the persistent-padded layout.
    """
    if mode in ("auto", "banded", "ell") and _is_identity(m):
        return IdentityOp(n_rows=m.shape[0])
    if mode == "banded":
        from cape_tpu.ops.banded import banded_from_scipy

        return banded_from_scipy(
            m, dtype=dtype, padded=padded, allow_pallas=allow_pallas
        )
    if mode == "dense":
        return dense_from_scipy(m, dtype)
    return ell_from_scipy(m, dtype)


@struct.dataclass
class GraphContext:
    """All mesh constants a CAPE forward/backward needs, as one pytree.

    lap / down / up: per-level operators of the VAE pyramid.
    lap_d / down_d: operators of the discriminator (ds2) pyramid.
    edges: [E, 2] int32 template edge table (edge loss).
    template_verts: [V, 3] template vertex positions.
    loss_mask: [V] or scalar 1.0 per-vertex loss weights.
    level_sizes: static per-level vertex counts.
    """

    lap: tuple
    down: tuple
    up: tuple
    lap_d: tuple
    down_d: tuple
    edges: jnp.ndarray
    edge_op: Any
    template_verts: jnp.ndarray
    loss_mask: jnp.ndarray
    level_sizes: tuple = struct.field(pytree_node=False)
    level_sizes_d: tuple = struct.field(pytree_node=False)
    # lap_up[i] = scaled_lap[i] @ up[i]: the decoder's unpool composed into
    # the conv's operator (host-side sparse product, still banded with
    # bandwidth <= b_L + b_U). The fused decoder path (ops.cheb
    # cheb_conv_up) applies T_1(L~)U in ONE banded apply so the unpooled
    # intermediate never materializes; for factor-1 levels up[i] is the
    # identity and lap_up[i] IS lap[i] (same op object, no extra storage).
    lap_up: tuple = ()
    # persistent-padded vertex layout: pyramid ops consume/produce
    # activations padded to 128-row multiples (banded mode only); the model
    # pads once at its input boundary and slices once at its output.
    # edge_op / template_verts / loss_mask stay in the natural layout.
    padded: bool = struct.field(pytree_node=False, default=False)
    # level-0 vertex permutation when the banded (reordered) formulation is
    # active: device tensors live in permuted order, hosts permute at I/O.
    # None => natural order. Stored as a leaf for host-side use only.
    perm0: jnp.ndarray | None = None

    @property
    def vertex_perm(self) -> np.ndarray | None:
        return None if self.perm0 is None else np.asarray(jax.device_get(self.perm0))


def _edge_incidence(edges: np.ndarray, n_verts: int, sort_for_band: bool) -> sp.csr_matrix:
    """[E, V] edge-difference operator: row e = +1 at edges[e,0], -1 at
    edges[e,1]. Rows optionally sorted by endpoint position so the matrix
    is banded under a bandwidth-minimizing vertex order."""
    edges = np.asarray(edges)
    if sort_for_band:
        edges = edges[np.argsort(edges.min(axis=1), kind="stable")]
    E = len(edges)
    rows = np.repeat(np.arange(E), 2)
    cols = edges.reshape(-1)
    vals = np.tile([1.0, -1.0], E)
    return sp.csr_matrix((vals, (rows, cols)), shape=(E, n_verts))


def build_graph_context(
    pyramid: MeshPyramid,
    disc_pyramid: MeshPyramid,
    edges: np.ndarray,
    template_verts: np.ndarray,
    loss_mask: np.ndarray | float = 1.0,
    mode: str = "banded",
    dtype: Any = jnp.float32,
    padded: bool = False,
    use_pallas: bool = True,
    build_fused: bool = False,
) -> GraphContext:
    """Device context. mode='banded' (default, production) reorders both
    pyramids by RCM/induced orderings (meshops.ordering) so every apply is
    gather-free; the level-0 permutation is recorded in ctx.perm0 and all
    vertex-indexed constants here are stored permuted. Hosts must permute
    per-vertex data in and un-permute predictions out (the loaders and the
    inference engine do this automatically).

    padded=True (banded only): pyramid operators use the persistent-padded
    vertex layout — activations stay at 128-row multiples through the whole
    network, removing the per-apply output slices (docs/PERF.md). The model
    handles the pad/slice boundaries; edge_op and the loss constants stay
    natural. use_pallas=False pins every conv to the XLA banded path
    (cfg.use_pallas; the CAPE_TPU_PALLAS env var overrides either way).
    build_fused=True additionally composes the L~@U decoder operators
    (GraphContext.lap_up) — required by cfg.fuse_decoder, wasted otherwise."""
    template_verts = np.asarray(template_verts)
    edges = np.asarray(edges)
    perm0 = None
    if mode == "banded":
        from cape_tpu.meshops.ordering import (
            permute_edges,
            permute_pyramid,
            pyramid_orderings,
        )

        perms = pyramid_orderings(pyramid)
        perms_d = pyramid_orderings(disc_pyramid, base_perm=perms[0])
        pyramid = permute_pyramid(pyramid, perms)
        disc_pyramid = permute_pyramid(disc_pyramid, perms_d)
        edges = permute_edges(edges, perms[0])
        template_verts = template_verts[perms[0]]
        if isinstance(loss_mask, np.ndarray) and loss_mask.ndim > 0:
            loss_mask = loss_mask[perms[0]]
        perm0 = perms[0]

    if padded and mode != "banded":
        raise ValueError("padded layout requires mode='banded'")
    kw = dict(padded=padded, allow_pallas=use_pallas)
    scaled = pyramid.scaled_laplacians()
    laps = [make_op(L, mode, dtype, **kw) for L in scaled]
    downs = [make_op(D, mode, dtype, **kw) for D in pyramid.downsamples]
    ups = [make_op(U, mode, dtype, **kw) for U in pyramid.upsamples]
    # composite L~@U per decoder level (see GraphContext.lap_up); identity
    # upsamples reuse the plain Laplacian op. Only composed on request:
    # the wider-band composite blocks carry ~40% more data than U per
    # level (docs/PERF.md), and the default fuse_decoder=False path would
    # otherwise build, upload and hold operators it never applies.
    lap_ups = []
    if build_fused:
        lap_ups = [
            laps[i] if _is_identity(U)
            else make_op(sp.csr_matrix(scaled[i] @ U), mode, dtype, **kw)
            for i, U in enumerate(pyramid.upsamples)
        ]
    laps_d = [make_op(L, mode, dtype, **kw) for L in disc_pyramid.scaled_laplacians()]
    downs_d = [make_op(D, mode, dtype, **kw) for D in disc_pyramid.downsamples]
    # losses consume natural-layout predictions; edge_op stays natural
    edge_op = make_op(
        _edge_incidence(edges, len(template_verts), sort_for_band=(mode == "banded")),
        mode,
        dtype,
        allow_pallas=use_pallas,
    )
    mask = jnp.asarray(loss_mask, dtype=jnp.float32)
    return GraphContext(
        lap=tuple(laps),
        down=tuple(downs),
        up=tuple(ups),
        lap_d=tuple(laps_d),
        down_d=tuple(downs_d),
        edges=jnp.asarray(edges, dtype=jnp.int32),
        edge_op=edge_op,
        template_verts=jnp.asarray(template_verts, dtype=jnp.float32),
        loss_mask=mask,
        level_sizes=tuple(pyramid.level_sizes),
        level_sizes_d=tuple(disc_pyramid.level_sizes),
        lap_up=tuple(lap_ups),
        padded=padded,
        perm0=None if perm0 is None else jnp.asarray(perm0, jnp.int32),
    )
