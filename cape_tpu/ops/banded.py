"""Block-banded sparse apply: gather-free TPU formulation.

After RCM/induced reordering (cape_tpu.meshops.ordering) every pyramid
matrix is banded: the nonzeros of row tile t (128 rows) fall in a fixed
column window around t * col_stride. The apply is then

    y_tiles = sum_k  blocks[k] @ shifted_view_k(x_padded)

where each shifted view is a *static* slice + reshape and each term is a
batched [128, cb] x [cb, C] MXU matmul — no gathers, no scatters, in the
backward pass either (pads/slices/batched matmuls are all natively
transposable). This is the production path for the Chebyshev Laplacians,
pool/unpool transforms and the edge-difference operator.

Storage is S (number of shifts) dense block-diagonals; for the SMPL
pyramid S is 3-6 and the total block storage is ~tens of MB.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from flax import struct


@struct.dataclass
class BandedOp:
    """y[..., i, c] = sum_j M[i, j] x[..., j, c] for banded M."""

    blocks: jnp.ndarray                                # [S, T, rb, cb]
    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)
    row_block: int = struct.field(pytree_node=False)
    col_block: int = struct.field(pytree_node=False)   # == col stride per row tile
    pad_left: int = struct.field(pytree_node=False)
    pad_right: int = struct.field(pytree_node=False)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        S, T, rb, cb = self.blocks.shape
        pad = [(0, 0)] * (x.ndim - 2) + [(self.pad_left, self.pad_right), (0, 0)]
        xp = jnp.pad(x, pad)
        blocks = self.blocks.astype(x.dtype)
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
        return y[..., : self.n_rows, :]

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def pallas_eligible(self) -> bool:
        """The fused Pallas cheb kernel handles square symmetric levels
        with 128x128 blocks (all rescaled Laplacians qualify)."""
        return (
            self.n_rows == self.n_cols
            and self.row_block == 128
            and self.col_block == 128
        )


def banded_from_scipy(
    m: sp.spmatrix, row_block: int = 128, dtype=jnp.float32
) -> BandedOp:
    """Pack a (pre-permuted) banded sparse matrix into shifted block form.

    Requires n_cols * row_block to be divisible by n_rows' tiling ratio so
    the column stride per row tile is integral (true for the pyramid's
    1:1, 2:1 and 1:2 level-size ratios).
    """
    csr = sp.csr_matrix(m)
    R, C = csr.shape
    rb = row_block
    T = -(-R // rb)
    # column stride per row tile, from the size ratio
    cs_num = C * rb
    if cs_num % R != 0:
        # fall back to a ratio rounded to a divisor-friendly stride
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
    # padded length must cover the last tile's window
    pad_right = (T - 1) * cs + window - pad_left - C
    pad_right = max(pad_right, 0)

    blocks = np.zeros((S, T, rb, cb), dtype=np.float32)
    r_in = coo.row - t * rb
    shifted = rel + pad_left
    k = shifted // cb
    c_in = shifted - k * cb
    np.add.at(blocks, (k, t, r_in, c_in), coo.data)
    return BandedOp(
        blocks=jnp.asarray(blocks, dtype=dtype),
        n_rows=R,
        n_cols=C,
        row_block=rb,
        col_block=cb,
        pad_left=int(pad_left),
        pad_right=int(pad_right),
    )


def banded_cost(op: BandedOp) -> int:
    """MACs per channel column — used by auto mode selection."""
    S, T, rb, cb = op.blocks.shape
    return S * T * rb * cb
