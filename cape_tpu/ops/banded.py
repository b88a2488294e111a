"""Block-banded sparse apply: gather-free TPU formulation.

After RCM/induced reordering (cape_tpu.meshops.ordering) every pyramid
matrix is banded: the nonzeros of row tile t (128 rows) fall in a fixed
column window around t * col_stride. The apply is then

    y_tiles = sum_k  blocks[k] @ shifted_view_k(x_padded)

where each shifted view is a *static* slice + reshape and each term is a
batched [128, cb] x [cb, C] MXU matmul — no gathers, no scatters. The
apply goes through a custom VJP with the *transpose packed in the same
banded form*: XLA's autodiff transpose of the shifted einsum otherwise
materializes [B, T, cb, C] layout-transposed copies (432 MB each at
batch 256 — the main OOM driver before this).

Storage is S (number of shifts) dense block-diagonals for the matrix and
its transpose; for the SMPL pyramid S is 3-12 and the total block storage
is ~tens of MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from flax import struct


def _apply_blocks(x, blocks, pad_left, pad_right, n_rows, padded=False):
    """y = M x for banded M packed as shifted blocks.

    padded=False (natural layout): x has n_cols rows, y is sliced to n_rows.
    padded=True (persistent-padded layout): x has ceil(n_cols/rb)*rb rows
    whose tail rows may hold ARBITRARY values — every window position past
    column n_cols is structurally zero in `blocks` (no nnz maps there at
    pack time), so tail garbage is annihilated — and y is returned at the
    full T*rb rows with the tail rows exactly zero (zero block rows past
    n_rows). Keeping activations at the padded length removes the per-apply
    output slice (and its transpose pad in the VJP) that showed up as
    ~1.7 ms/step of pure data formatting in the round-2 trace
    (docs/PERF.md: device-time attribution).
    """
    S, T, rb, cb = blocks.shape
    if padded:
        # halo only: x is already row-tile padded; extend to the window.
        pad_right = max((T + S - 1) * cb - pad_left - x.shape[-2], 0)
    pad = [(0, 0)] * (x.ndim - 2) + [(pad_left, pad_right), (0, 0)]
    xp = jnp.pad(x, pad)
    blocks = blocks.astype(x.dtype)
    y = None
    for k in range(S):
        view = xp[..., k * cb : k * cb + T * cb, :]
        view = view.reshape(x.shape[:-2] + (T, cb) + x.shape[-1:])
        term = jnp.einsum(
            "tij,...tjc->...tic", blocks[k], view,
            preferred_element_type=x.dtype,
        )
        y = term if y is None else y + term
    y = y.reshape(x.shape[:-2] + (T * rb,) + x.shape[-1:])
    return y if padded else y[..., :n_rows, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def banded_matvec(meta, x, blocks, t_blocks):
    pad_left, pad_right, n_rows, _, _, _, padded = meta
    return _apply_blocks(x, blocks, pad_left, pad_right, n_rows, padded)


def _banded_fwd(meta, x, blocks, t_blocks):
    return banded_matvec(meta, x, blocks, t_blocks), (blocks, t_blocks)


def _banded_bwd(meta, res, g):
    # In padded mode the cotangent g arrives at the padded row count; its
    # tail rows are structurally zero whenever the op's output feeds a
    # banded op or a slice-to-natural boundary downstream (both have
    # zero-tail VJPs), so dW/db accumulations elsewhere stay exact.
    _, _, _, t_pad_left, t_pad_right, n_cols, padded = meta
    blocks, t_blocks = res
    dx = _apply_blocks(g, t_blocks, t_pad_left, t_pad_right, n_cols, padded)
    return dx, jnp.zeros_like(blocks), jnp.zeros_like(t_blocks)


banded_matvec.defvjp(_banded_fwd, _banded_bwd)


def padded_size(n: int, block: int = 128) -> int:
    """Row count of the persistent-padded layout for a natural size n."""
    return -(-n // block) * block


@struct.dataclass
class BandedOp:
    """y[..., i, c] = sum_j M[i, j] x[..., j, c] for banded M.

    padded=False: x [.., n_cols, C] -> y [.., n_rows, C] (natural layout).
    padded=True:  x [.., p_cols, C] -> y [.., p_rows, C] (persistent-padded
    layout; tail input rows are ignored, tail output rows are zero).
    """

    blocks: jnp.ndarray                                # [S, T, rb, cb]
    t_blocks: jnp.ndarray                              # transpose packing
    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)
    row_block: int = struct.field(pytree_node=False)
    col_block: int = struct.field(pytree_node=False)   # == col stride per row tile
    pad_left: int = struct.field(pytree_node=False)
    pad_right: int = struct.field(pytree_node=False)
    t_pad_left: int = struct.field(pytree_node=False)
    t_pad_right: int = struct.field(pytree_node=False)
    padded: bool = struct.field(pytree_node=False, default=False)
    allow_pallas: bool = struct.field(pytree_node=False, default=True)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        meta = (
            self.pad_left, self.pad_right, self.n_rows,
            self.t_pad_left, self.t_pad_right, self.n_cols,
            self.padded,
        )
        if self.padded:
            assert x.shape[-2] == self.p_cols, (
                f"padded BandedOp expects {self.p_cols} input rows, "
                f"got {x.shape[-2]} (natural {self.n_cols})"
            )
        return banded_matvec(meta, x, self.blocks, self.t_blocks)

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def p_rows(self) -> int:
        return self.blocks.shape[1] * self.row_block

    @property
    def p_cols(self) -> int:
        return self.t_blocks.shape[1] * self.row_block

    @property
    def pallas_eligible(self) -> bool:
        """The fused Pallas cheb kernel handles square symmetric levels
        with 128x128 blocks (all rescaled Laplacians qualify)."""
        return (
            self.n_rows == self.n_cols
            and self.row_block == 128
            and self.col_block == 128
        )


def _pack_blocks(csr: sp.csr_matrix, row_block: int):
    """Pack a banded CSR into (blocks, col_block, pad_left, pad_right)."""
    R, C = csr.shape
    rb = row_block
    T = -(-R // rb)
    cs_num = C * rb
    if cs_num % R != 0:
        cs = max(1, int(round(C * rb / R)))
    else:
        cs = cs_num // R
    cb = cs

    coo = csr.tocoo()
    t = coo.row // rb
    rel = coo.col - t * cs
    lo = int(rel.min()) if coo.nnz else 0
    hi = int(rel.max()) if coo.nnz else 0
    pad_left = ((max(0, -lo) + cb - 1) // cb) * cb
    S = (pad_left + hi) // cb + 1
    window = S * cb
    pad_right = max((T - 1) * cs + window - pad_left - C, 0)

    blocks = np.zeros((S, T, rb, cb), dtype=np.float32)
    r_in = coo.row - t * rb
    shifted = rel + pad_left
    k = shifted // cb
    c_in = shifted - k * cb
    np.add.at(blocks, (k, t, r_in, c_in), coo.data)
    return blocks, cb, int(pad_left), int(pad_right)


def banded_from_scipy(
    m: sp.spmatrix, row_block: int = 128, dtype=jnp.float32,
    padded: bool = False, allow_pallas: bool = True,
) -> BandedOp:
    """Pack a (pre-permuted) banded sparse matrix and its transpose into
    shifted block form. padded=True builds the op in the persistent-padded
    layout (see BandedOp)."""
    csr = sp.csr_matrix(m)
    R, C = csr.shape
    blocks, cb, pad_left, pad_right = _pack_blocks(csr, row_block)
    t_blocks, _, t_pad_left, t_pad_right = _pack_blocks(
        sp.csr_matrix(m.T), row_block
    )
    return BandedOp(
        blocks=jnp.asarray(blocks, dtype=dtype),
        t_blocks=jnp.asarray(t_blocks, dtype=dtype),
        n_rows=R,
        n_cols=C,
        row_block=row_block,
        col_block=cb,
        pad_left=pad_left,
        pad_right=pad_right,
        t_pad_left=t_pad_left,
        t_pad_right=t_pad_right,
        padded=padded,
        allow_pallas=allow_pallas,
    )


def banded_cost(op: BandedOp) -> int:
    """MACs per channel column — used by auto mode selection."""
    S, T, rb, cb = op.blocks.shape
    return S * T * rb * cb
