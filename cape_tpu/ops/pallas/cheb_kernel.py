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
    k = pl.program_id(2)
    S = pl.num_programs(2)
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


def _col_tile(M: int, target: int = 4096) -> int:
    """Largest 128-multiple divisor of M that is <= target (VMEM cap: the
    per-step working set is a few [128, tile] buffers plus an f32 scratch;
    an untiled M = B*C of 16384 at bf16 blows the 16 MB scoped VMEM).
    Callers guarantee M % 128 == 0 (pad first), so mt=128 always divides
    and this never falls back past the cap."""
    for mt in range(min(M, target), 0, -128):
        if M % mt == 0 and mt % 128 == 0:
            return mt
    raise AssertionError(f"column count {M} not a 128-multiple — pad first")


def _pallas_band_apply_v2(x_padded_vm, blocks):
    """Banded apply in vertex-major form: x_padded_vm [Vp, M] -> [T*rb, M].

    Grid (T, M/MT, S) with the shift index minor: the f32 scratch tile
    accumulates the S band contributions for one (row-tile, col-tile) and
    is flushed once, so each output tile is written exactly once. Merged
    column counts that are not 128-multiples (e.g. B*C = 16*41) are padded
    up so the VMEM tile cap always holds (ADVICE round 2: the old
    fallback ran the full untiled M)."""
    S, T, rb, cb = blocks.shape
    M0 = x_padded_vm.shape[-1]
    M = -(-M0 // 128) * 128
    if M != M0:
        x_padded_vm = jnp.pad(x_padded_vm, ((0, 0), (0, M - M0)))
    MT = _col_tile(M)
    out = pl.pallas_call(
        _kernel_v2,
        grid=(T, M // MT, S),
        in_specs=[
            pl.BlockSpec((cb, MT), lambda t, j, k: (t + k, j)),
            pl.BlockSpec((1, 1, rb, cb), lambda t, j, k: (k, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, MT), lambda t, j, k: (t, j)),
        out_shape=jax.ShapeDtypeStruct((T * rb, M), x_padded_vm.dtype),
        scratch_shapes=[pltpu.VMEM((rb, MT), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(x_padded_vm, blocks)
    return out[:, :M0] if M != M0 else out


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


# ---------------------------------------------------------------- kernel v3
# Large-batch path: batch-major [B, V, C] at the boundary, vertex-major
# merged columns inside, Pallas band applies in BOTH directions of a full
# custom VJP. Motivation (measured, docs/PERF.md): the batch-major banded
# einsum re-reads the band blocks once per sample, which turns superlinear
# when the batch no longer amortizes block traffic — at B=64, C=64 the
# per-conv fwd+bwd is 4.37 ms batch-major vs 2.21 ms on this path (bf16).
# At B=16 batch-major wins; ops.cheb auto-selects by B*C.


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pallas_cheb2_v3(meta, x, blocks, w0, w1):
    y, _ = _v3_fwd_parts(meta, x, blocks, w0, w1)
    return y


def _v3_band_vm(xv, blocks, pad_left, pad_right, n_rows):
    """Vertex-major banded apply: [V, M] -> [V, M] (square symmetric op)."""
    xp = jnp.pad(xv, ((pad_left, pad_right), (0, 0)))
    return _pallas_band_apply_v2(xp, blocks)[:n_rows]


def _v3_fwd_parts(meta, x, blocks, w0, w1):
    pad_left, pad_right, n_rows = meta
    B, V, C = x.shape
    xv = x.transpose(1, 0, 2).reshape(V, B * C)
    lxv = _v3_band_vm(xv, blocks, pad_left, pad_right, n_rows)
    x3 = xv.reshape(V, B, C)
    l3 = lxv.reshape(V, B, C)
    y = jnp.einsum(
        "vbc,cf->vbf", x3, w0, preferred_element_type=x.dtype
    ) + jnp.einsum("vbc,cf->vbf", l3, w1, preferred_element_type=x.dtype)
    return y.transpose(1, 0, 2), (x3, l3)


def _v3_fwd(meta, x, blocks, w0, w1):
    y, (x3, l3) = _v3_fwd_parts(meta, x, blocks, w0, w1)
    return y, (x3, l3, blocks, w0, w1)


def _v3_bwd(meta, res, g):
    # A~ is symmetric: the transpose apply reuses the forward blocks.
    pad_left, pad_right, n_rows = meta
    x3, l3, blocks, w0, w1 = res
    V, B, C = x3.shape
    gv = g.transpose(1, 0, 2)                                   # [V, B, F]
    dw0 = jnp.einsum("vbc,vbf->cf", x3, gv)
    dw1 = jnp.einsum("vbc,vbf->cf", l3, gv)
    gw1 = jnp.einsum("vbf,cf->vbc", gv, w1).reshape(V, B * C)
    dxv = jnp.einsum("vbf,cf->vbc", gv, w0).reshape(V, B * C) + _v3_band_vm(
        gw1, blocks, pad_left, pad_right, n_rows
    )
    dx = dxv.reshape(V, B, C).transpose(1, 0, 2)
    return dx, jnp.zeros_like(blocks), dw0, dw1


_pallas_cheb2_v3.defvjp(_v3_fwd, _v3_bwd)


# ---------------------------------------------------------------- kernel v4
# Batch-major band apply: grid (T,), one BlockSpec window per shift on the
# SAME padded array (no per-shift slice copies — the XLA banded apply
# materializes S async slice DMAs of the whole activation per apply), and a
# static in-kernel loop over the batch. No vertex-major transposes.


def _make_kernel_bm(S: int, B: int):
    def kernel(*refs):
        xs, blk_ref, out_ref = refs[:S], refs[S], refs[S + 1]
        for b in range(B):
            acc = None
            for k in range(S):
                c = jnp.dot(
                    blk_ref[k, 0], xs[k][b], preferred_element_type=jnp.float32
                )
                acc = c if acc is None else acc + c
            out_ref[b] = acc.astype(out_ref.dtype)

    return kernel


def banded_apply_bm(x, blocks, pad_left, pad_right, n_rows):
    """y = M x for banded M, batch-major x [B, V, C] -> [B, n_rows, C].

    The grid runs over row tiles; each step DMAs the S shifted x windows
    (block (B, cb, C) views of one padded buffer) plus the S band blocks,
    and writes one output tile. VMEM per step ~ 2*(S+1)*B*cb*C elements
    (double-buffered)."""
    S, T, rb, cb = blocks.shape
    B, V, C = x.shape
    xp = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)))
    out = pl.pallas_call(
        _make_kernel_bm(S, B),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((B, cb, C), (lambda t, k=k: (0, t + k, 0)))
            for k in range(S)
        ]
        + [pl.BlockSpec((S, 1, rb, cb), lambda t: (0, t, 0, 0))],
        out_specs=pl.BlockSpec((B, rb, C), lambda t: (0, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T * rb, C), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(*([xp] * S + [blocks.astype(x.dtype)]))
    return out[:, :n_rows, :]


# ---------------------------------------------------------------- kernel v5
# Small-batch whole-conv kernel (ROADMAP lever #1): batch-major at the
# boundary, G=4 samples merged into the lane dimension inside
# ([B/G, V, G*C]), so (a) every window DMA moves 512-byte contiguous rows
# (v4's loss at C=64 was 128-byte rows starving the DMA engines) and
# (b) BOTH weight projections run in-kernel against a block-diagonal
# [G*C, G*F] weight — one [128, G*C] @ [G*C, G*F] MXU matmul per sample
# group that cannot mix samples — so the A~x intermediate never exists in
# HBM. FLOP overhead of the block-diagonal form is G x on the projections;
# the op is bandwidth-bound (PERF.md roofline), so that trade is free.


def _make_kernel_v5(S: int, BG: int, kc: int):
    def kernel(*refs):
        xs, blk_ref, w0_ref, w1_ref, out_ref = (
            refs[:S], refs[S], refs[S + 1], refs[S + 2], refs[S + 3]
        )
        for b in range(BG):
            lx = None
            for k in range(S):
                c = jnp.dot(
                    blk_ref[k, 0], xs[k][b], preferred_element_type=jnp.float32
                )
                lx = c if lx is None else lx + c
            out_ref[b] = (
                jnp.dot(
                    xs[kc][b], w0_ref[...], preferred_element_type=jnp.float32
                )
                + jnp.dot(
                    lx.astype(xs[0].dtype), w1_ref[...],
                    preferred_element_type=jnp.float32,
                )
            ).astype(out_ref.dtype)

    return kernel


def _pallas_cheb2_v5_impl(x, blocks, pad_left, pad_right, n_rows, w0, w1, group):
    """x: [B, V, C] with B % group == 0; blocks [S, T, 128, 128];
    w0/w1: [C, F]. Returns [B, n_rows, F]."""
    B, V, C = x.shape
    S, T, rb, cb = blocks.shape
    G = group
    F = w0.shape[1]
    kc = pad_left // cb

    # merge G samples into lanes: [B/G, V, G*C], sample-major lane order so
    # the block-diagonal weight keeps samples independent
    xm = x.reshape(B // G, G, V, C).transpose(0, 2, 1, 3).reshape(B // G, V, G * C)
    xm = jnp.pad(xm, ((0, 0), (pad_left, pad_right), (0, 0)))
    eye = jnp.eye(G, dtype=x.dtype)
    w0g = jnp.kron(eye, w0.astype(x.dtype))                    # [G*C, G*F]
    w1g = jnp.kron(eye, w1.astype(x.dtype))

    out = pl.pallas_call(
        _make_kernel_v5(S, B // G, kc),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((B // G, cb, G * C), (lambda t, k=k: (0, t + k, 0)))
            for k in range(S)
        ]
        + [
            pl.BlockSpec((S, 1, rb, cb), lambda t: (0, t, 0, 0)),
            pl.BlockSpec((G * C, G * F), lambda t: (0, 0)),
            pl.BlockSpec((G * C, G * F), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B // G, rb, G * F), lambda t: (0, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B // G, T * rb, G * F), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(*([xm] * S + [blocks.astype(x.dtype), w0g, w1g]))

    out = out[:, :n_rows, :]
    return (
        out.reshape(B // G, n_rows, G, F).transpose(0, 2, 1, 3).reshape(B, n_rows, F)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pallas_cheb2_v5(meta, x, blocks, w0, w1):
    pad_left, pad_right, n_rows, group = meta
    return _pallas_cheb2_v5_impl(
        x, blocks, pad_left, pad_right, n_rows, w0, w1, group
    )


def _fwd_v5(meta, x, blocks, w0, w1):
    return _pallas_cheb2_v5(meta, x, blocks, w0, w1), (x, blocks, w0, w1)


def _bwd_v5(meta, res, g):
    return _bwd(meta[:3], res, g)


_pallas_cheb2_v5.defvjp(_fwd_v5, _bwd_v5)


def _band_meta(band_op, x):
    """(pad_left, pad_right, n_rows) for a fused-kernel apply of x
    [B, V, C]. Persistent-padded ops hand x in at the tile-padded row
    count P = T*rb and keep all P output rows; their stored pad_right is
    the layout pad, so the right halo the shifted-window read needs is
    recomputed here. One definition for the v3/v5/v6/v7 wrappers — the
    halo formula must not drift between kernels."""
    if band_op.padded:
        S, T, rb, cb = band_op.blocks.shape
        P = T * rb
        assert x.shape[1] == P, (x.shape, P)
        halo_right = max((T + S - 1) * cb - band_op.pad_left - P, 0)
        return band_op.pad_left, halo_right, P
    return band_op.pad_left, band_op.pad_right, band_op.n_rows


def cheb2_banded_pallas_v5(x, band_op, weight, group: int = 4):
    """Small-batch fused K=2 Chebyshev conv (kernel v5). x: [B, V, C],
    weight: [2, C, F], B % group == 0; symmetric square BandedOp."""
    B = x.shape[0]
    G = group
    while B % G:
        G //= 2
    meta = _band_meta(band_op, x) + (G,)
    w = weight.astype(x.dtype)
    return _pallas_cheb2_v5(meta, x, band_op.blocks.astype(x.dtype), w[0], w[1])


# ---------------------------------------------------------------- kernel v6
# Rolling-window whole-conv kernel: the TPU grid is sequential, so a
# circular VMEM buffer of the last S input tiles turns the S-fold window
# re-read of v4/v5 into exactly ONE DMA of each padded x tile. Grid
# (T + S - 1,): step i DMAs padded tile i into slot i % S; once the buffer
# is warm (i >= S-1) it emits output tile t = i-(S-1) from the S resident
# tiles plus both in-kernel W projections — x is read once, y written
# once, A~x never exists in HBM.


def _make_kernel_v6(S: int, B: int, kc: int):
    def kernel(xin_ref, blk_ref, w0_ref, w1_ref, out_ref, xbuf):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, S)
        xbuf[slot] = xin_ref[...]

        @pl.when(i >= S - 1)
        def _():
            # output tile t = i-(S-1); window k lives in slot (i+1+k) % S
            for b in range(B):
                lx = None
                for k in range(S):
                    sk = jax.lax.rem(i + 1 + k, S)
                    c = jnp.dot(
                        blk_ref[k, 0], xbuf[sk, b],
                        preferred_element_type=jnp.float32,
                    )
                    lx = c if lx is None else lx + c
                sc = jax.lax.rem(i + 1 + kc, S)
                out_ref[b] = (
                    jnp.dot(
                        xbuf[sc, b], w0_ref[...],
                        preferred_element_type=jnp.float32,
                    )
                    + jnp.dot(
                        lx.astype(xin_ref.dtype), w1_ref[...],
                        preferred_element_type=jnp.float32,
                    )
                ).astype(out_ref.dtype)

    return kernel


def _pallas_cheb2_v6_impl(x, blocks, pad_left, pad_right, n_rows, w0, w1):
    """x: [B, V, C]; blocks [S, T, 128, 128]; w0/w1 [C, F] -> [B, n_rows, F]."""
    B, V, C = x.shape
    S, T, rb, cb = blocks.shape
    F = w0.shape[1]
    kc = pad_left // cb

    xp = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)))
    assert xp.shape[1] == (T + S - 1) * cb, (xp.shape, T, S, cb)
    t_of = lambda i: jnp.maximum(i - (S - 1), 0)
    out = pl.pallas_call(
        _make_kernel_v6(S, B, kc),
        grid=(T + S - 1,),
        in_specs=[
            pl.BlockSpec((B, cb, C), lambda i: (0, i, 0)),
            pl.BlockSpec((S, 1, rb, cb), lambda i: (0, t_of(i), 0, 0)),
            pl.BlockSpec((C, F), lambda i: (0, 0)),
            pl.BlockSpec((C, F), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B, rb, F), lambda i: (0, t_of(i), 0)),
        out_shape=jax.ShapeDtypeStruct((B, T * rb, F), x.dtype),
        scratch_shapes=[pltpu.VMEM((S, B, cb, C), x.dtype)],
        interpret=jax.default_backend() != "tpu",
    )(xp, blocks.astype(x.dtype), w0.astype(x.dtype), w1.astype(x.dtype))
    return out[:, :n_rows, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pallas_cheb2_v6(meta, x, blocks, w0, w1):
    pad_left, pad_right, n_rows = meta
    return _pallas_cheb2_v6_impl(x, blocks, pad_left, pad_right, n_rows, w0, w1)


def _fwd_v6(meta, x, blocks, w0, w1):
    return _pallas_cheb2_v6(meta, x, blocks, w0, w1), (x, blocks, w0, w1)


_pallas_cheb2_v6.defvjp(_fwd_v6, _bwd)


# ---------------------------------------------------------------- kernel v7
# v6 with R row tiles per grid step ("supertiles"): the sequential grid
# shrinks from T+S-1 steps to ceil(T/R)+1, amortizing the fixed per-step
# cost (DMA issue + semaphores + revisits) that v6's loss suggested is the
# real floor at these shapes. Requires R >= S-1 so one previous supertile
# suffices (2-slot rolling buffer).


def _make_kernel_v7(S: int, B: int, R: int, NS: int, kc: int, cb: int):
    W = NS - 1  # warmup steps

    def kernel(xin_ref, blk_ref, w0_ref, w1_ref, out_ref, xbuf):
        i = pl.program_id(0)
        xbuf[jax.lax.rem(i, NS)] = xin_ref[...]

        @pl.when(i >= W)
        def _():
            t = i - W                       # output supertile
            for b in range(B):
                for r in range(R):
                    lx = None
                    xc = None
                    for k in range(S):
                        g_off, m = divmod(r + k, R)   # static
                        slot = jax.lax.rem(t + g_off, NS)
                        xtile = xbuf[slot, b, m * cb:(m + 1) * cb, :]
                        if k == kc:
                            xc = xtile
                        c = jnp.dot(
                            blk_ref[0, k, r], xtile,
                            preferred_element_type=jnp.float32,
                        )
                        lx = c if lx is None else lx + c
                    out_ref[b, r * cb:(r + 1) * cb, :] = (
                        jnp.dot(
                            xc, w0_ref[...], preferred_element_type=jnp.float32
                        )
                        + jnp.dot(
                            lx.astype(xin_ref.dtype), w1_ref[...],
                            preferred_element_type=jnp.float32,
                        )
                    ).astype(out_ref.dtype)

    return kernel


def _pallas_cheb2_v7_impl(x, blocks, pad_left, pad_right, n_rows, w0, w1, R=2):
    B, V, C = x.shape
    S, T, rb, cb = blocks.shape
    F = w0.shape[1]
    kc = pad_left // cb
    NS = -(-(R - 1 + S) // R)             # supertiles spanned by one window
    WU = NS - 1                           # warmup steps

    TS = -(-T // R)                       # output supertiles
    xp = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)))
    # pad the window to (TS+WU) full supertiles and blocks to TS*R tiles
    want_rows = (TS + WU) * R * cb
    if xp.shape[1] < want_rows:
        xp = jnp.pad(xp, ((0, 0), (0, want_rows - xp.shape[1]), (0, 0)))
    if T < TS * R:
        blocks = jnp.pad(blocks, ((0, 0), (0, TS * R - T), (0, 0), (0, 0)))
    blk_r = blocks.reshape(S, TS, R, rb, cb).transpose(1, 0, 2, 3, 4)  # [TS,S,R,rb,cb]

    t_of = lambda i: jnp.maximum(i - WU, 0)
    out = pl.pallas_call(
        _make_kernel_v7(S, B, R, NS, kc, cb),
        grid=(TS + WU,),
        in_specs=[
            pl.BlockSpec((B, R * cb, C), lambda i: (0, i, 0)),
            pl.BlockSpec((1, S, R, rb, cb), lambda i: (t_of(i), 0, 0, 0, 0)),
            pl.BlockSpec((C, F), lambda i: (0, 0)),
            pl.BlockSpec((C, F), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B, R * rb, F), lambda i: (0, t_of(i), 0)),
        out_shape=jax.ShapeDtypeStruct((B, TS * R * rb, F), x.dtype),
        scratch_shapes=[pltpu.VMEM((NS, B, R * cb, C), x.dtype)],
        interpret=jax.default_backend() != "tpu",
    )(xp, blk_r.astype(x.dtype), w0.astype(x.dtype), w1.astype(x.dtype))
    return out[:, :n_rows, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pallas_cheb2_v7(meta, x, blocks, w0, w1):
    pad_left, pad_right, n_rows = meta
    return _pallas_cheb2_v7_impl(x, blocks, pad_left, pad_right, n_rows, w0, w1)


def _fwd_v7(meta, x, blocks, w0, w1):
    return _pallas_cheb2_v7(meta, x, blocks, w0, w1), (x, blocks, w0, w1)


_pallas_cheb2_v7.defvjp(_fwd_v7, _bwd)


def cheb2_banded_pallas_v7(x, band_op, weight):
    """Supertile rolling-buffer fused K=2 conv (kernel v7)."""
    meta = _band_meta(band_op, x)
    w = weight.astype(x.dtype)
    return _pallas_cheb2_v7(meta, x, band_op.blocks.astype(x.dtype), w[0], w[1])


def cheb2_banded_pallas_v6(x, band_op, weight):
    """Rolling-buffer fused K=2 Chebyshev conv (kernel v6). x: [B, V, C],
    weight: [2, C, F]; symmetric square BandedOp, natural or padded."""
    meta = _band_meta(band_op, x)
    w = weight.astype(x.dtype)
    return _pallas_cheb2_v6(meta, x, band_op.blocks.astype(x.dtype), w[0], w[1])


def cheb2_banded_pallas_v3(x, band_op, weight):
    """Large-batch fused K=2 Chebyshev conv: vertex-major Pallas band
    applies (fwd and bwd) behind a batch-major [B, V, C] interface.

    Persistent-padded ops (band_op.padded) hand x in at the tile-padded
    row count P = T*128; the kernel's window is then reached with a pure
    halo pad and the output keeps all P rows (the [:n_rows] slice becomes
    the identity), matching the padded BandedOp contract."""
    meta = _band_meta(band_op, x)
    w = weight.astype(x.dtype)
    return _pallas_cheb2_v3(meta, x, band_op.blocks.astype(x.dtype), w[0], w[1])


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
