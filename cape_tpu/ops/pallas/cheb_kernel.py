"""Fused banded Chebyshev-conv Pallas kernel (K=2, square levels).

Computes  y = x @ W0 + (A~ x) @ W1  in a single kernel over the banded
Laplacian: for each 128-row tile t the band contribution is accumulated in
VMEM scratch across the S shifted blocks, and both weight projections run
tile-resident — the [B, V, C] intermediate A~x never round-trips HBM.

Grid (B, T, S) with the shift index minor; BlockSpecs map the shifted
x window of tile t at shift k to padded row-block (t + k), so all feeds
are plain block tilings (no gathers, no manual DMA, pipeline handled by
pallas).

Backward: custom VJP in plain XLA banded ops — the rescaled Laplacian is
symmetric up to packing, so dx = da @ W0^T + A~^T(da @ W1^T) using the
pre-packed transpose blocks; dW from one recomputed A~x.

Runs in interpret mode off-TPU so the same code path is unit-tested on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 128  # row block == col block for square banded Laplacians


def _make_kernel(kc: int):
    def kernel(xw_ref, xc_ref, blk_ref, w0_ref, w1_ref, out_ref, lx_ref):
        k = pl.program_id(2)
        S = pl.num_programs(2)
        contrib = jnp.dot(
            blk_ref[0, 0], xw_ref[0], preferred_element_type=jnp.float32
        )

        @pl.when(k == 0)
        def _():
            lx_ref[...] = contrib

        @pl.when(k > 0)
        def _():
            lx_ref[...] = lx_ref[...] + contrib

        @pl.when(k == S - 1)
        def _():
            lx = lx_ref[...].astype(xw_ref.dtype)
            out_ref[0] = (
                jnp.dot(xc_ref[0], w0_ref[...], preferred_element_type=jnp.float32)
                + jnp.dot(lx, w1_ref[...], preferred_element_type=jnp.float32)
            ).astype(out_ref.dtype)

    return kernel


def _pallas_cheb2_impl(x, blocks, pad_left, pad_right, n_rows, w0, w1):
    """x: [B, V, C]; blocks: [S, T, RB, RB]; w0/w1: [C, F] -> [B, V, F]."""
    B, V, C = x.shape
    S, T, rb, cb = blocks.shape
    assert rb == RB and cb == RB, "square banded kernel expects 128x128 blocks"
    F = w0.shape[1]
    kc = pad_left // RB

    xp = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)))
    out = pl.pallas_call(
        _make_kernel(kc),
        grid=(B, T, S),
        in_specs=[
            pl.BlockSpec((1, RB, C), lambda b, t, k: (b, t + k, 0)),
            pl.BlockSpec((1, RB, C), lambda b, t, k, kc=kc: (b, t + kc, 0)),
            pl.BlockSpec((1, 1, RB, RB), lambda b, t, k: (k, t, 0, 0)),
            pl.BlockSpec((C, F), lambda b, t, k: (0, 0)),
            pl.BlockSpec((C, F), lambda b, t, k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, RB, F), lambda b, t, k: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T * RB, F), x.dtype),
        scratch_shapes=[pltpu.VMEM((RB, C), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(xp, xp, blocks, w0, w1)
    return out[:, :n_rows, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pallas_cheb2(meta, x, blocks, w0, w1):
    pad_left, pad_right, n_rows = meta
    return _pallas_cheb2_impl(x, blocks, pad_left, pad_right, n_rows, w0, w1)


def _fwd(meta, x, blocks, w0, w1):
    return _pallas_cheb2(meta, x, blocks, w0, w1), (x, blocks, w0, w1)


def _banded_apply_xla(x, blocks, pad_left, pad_right, n_rows):
    """Plain XLA shifted-block apply (mirrors ops.banded.BandedOp)."""
    S, T, rb, cb = blocks.shape
    xp = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)))
    y = None
    for k in range(S):
        view = xp[:, k * cb : k * cb + T * cb, :].reshape(
            x.shape[0], T, cb, x.shape[-1]
        )
        term = jnp.einsum("tij,btjc->btic", blocks[k].astype(x.dtype), view)
        y = term if y is None else y + term
    return y.reshape(x.shape[0], T * rb, -1)[:, :n_rows, :]


def _bwd(meta, res, g):
    # A~ is symmetric (normalized adjacency stays symmetric under the
    # symmetric permutation), so the transpose apply reuses `blocks`.
    pad_left, pad_right, n_rows = meta
    x, blocks, w0, w1 = res
    lx = _banded_apply_xla(x, blocks, pad_left, pad_right, n_rows)
    dw0 = jnp.einsum("bvc,bvf->cf", x, g)
    dw1 = jnp.einsum("bvc,bvf->cf", lx, g)
    gw1 = jnp.einsum("bvf,cf->bvc", g, w1)
    dx = jnp.einsum("bvf,cf->bvc", g, w0) + _banded_apply_xla(
        gw1, blocks, pad_left, pad_right, n_rows
    )
    return dx, jnp.zeros_like(blocks), dw0, dw1


_pallas_cheb2.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------- kernel v2
# Vertex-major variant: activations enter as [Vp, B*C] so each grid step
# is a [128,128] @ [128, B*C] matmul with full lane utilization (v1 ran
# one sample per grid step and measured slower than the XLA path). The
# batch-major <-> vertex-major transposes around the kernel are cheap
# (measured ~free at these shapes).


def _kernel_v2(xw_ref, blk_ref, out_ref, lx_ref):
    k = pl.program_id(1)
    S = pl.num_programs(1)
    contrib = jnp.dot(
        blk_ref[0, 0], xw_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(k == 0)
    def _():
        lx_ref[...] = contrib

    @pl.when(k > 0)
    def _():
        lx_ref[...] = lx_ref[...] + contrib

    @pl.when(k == S - 1)
    def _():
        out_ref[...] = lx_ref[...].astype(out_ref.dtype)


def _pallas_band_apply_v2(x_padded_vm, blocks):
    """Banded apply in vertex-major form: x_padded_vm [Vp, M] -> [T*rb, M]."""
    S, T, rb, cb = blocks.shape
    M = x_padded_vm.shape[-1]
    return pl.pallas_call(
        _kernel_v2,
        grid=(T, S),
        in_specs=[
            pl.BlockSpec((cb, M), lambda t, k: (t + k, 0)),
            pl.BlockSpec((1, 1, rb, cb), lambda t, k: (k, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, M), lambda t, k: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((T * rb, M), x_padded_vm.dtype),
        scratch_shapes=[pltpu.VMEM((rb, M), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(x_padded_vm, blocks)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pallas_cheb2_v2(meta, x, blocks, w0, w1):
    pad_left, pad_right, n_rows = meta
    B, V, C = x.shape
    xv = x.transpose(1, 0, 2).reshape(V, B * C)
    xp = jnp.pad(xv, ((pad_left, pad_right), (0, 0)))
    lx = _pallas_band_apply_v2(xp, blocks)[:n_rows]
    lx = lx.reshape(V, B, C).transpose(1, 0, 2)
    return (
        jnp.einsum("bvc,cf->bvf", x, w0, preferred_element_type=x.dtype)
        + jnp.einsum("bvc,cf->bvf", lx, w1, preferred_element_type=x.dtype)
    )


def _fwd_v2(meta, x, blocks, w0, w1):
    return _pallas_cheb2_v2(meta, x, blocks, w0, w1), (x, blocks, w0, w1)


_pallas_cheb2_v2.defvjp(_fwd_v2, _bwd)


def cheb2_banded_pallas_v2(x, band_op, weight):
    """v2 entry: vertex-major banded apply with merged batch*channel
    columns; W projections in XLA."""
    meta = (band_op.pad_left, band_op.pad_right, band_op.n_rows)
    w = weight.astype(x.dtype)
    return _pallas_cheb2_v2(meta, x, band_op.blocks.astype(x.dtype), w[0], w[1])


def cheb2_banded_pallas(x, band_op, weight):
    """Fused K=2 Chebyshev conv on a square BandedOp with 128x128 blocks.

    x: [B, V, C]; weight: [2, C, F]. The operator must be symmetric (true
    for the rescaled Laplacians): the backward pass reuses its blocks as
    the transpose.
    """
    meta = (band_op.pad_left, band_op.pad_right, band_op.n_rows)
    w = weight.astype(x.dtype)
    return _pallas_cheb2(
        meta, x, band_op.blocks.astype(x.dtype), w[0], w[1]
    )
