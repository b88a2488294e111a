"""Chebyshev spectral graph convolution, TPU formulation.

Reference semantics (lib/models.py:69-103): transform x into the K-term
Chebyshev basis over the rescaled Laplacian L~ (recurrence
x_k = 2 L~ x_{k-1} - x_{k-2}), then one dense [Fin*K, Fout] filter matmul.

TPU design: the recurrence is unrolled at trace time (K is static, K=2 for
the VAE and 3 for the discriminator), each L~-apply is a fixed-width
neighbor gather (ops.sparse.EllOp — L~ with lmax=2 is the negated
normalized adjacency, max degree 11), and instead of concatenating the
basis we accumulate y += x_k @ W[k], which XLA fuses into K MXU matmuls
with no [B*V, Fin*K] materialization.

Weight layout: W is [K, Fin, Fout]. The reference's flat [Fin*K, Fout]
matrix (row index = fin*K + k) maps to ours via
W_ref.reshape(Fin, K, Fout).transpose(1, 0, 2) — see tools/tf_ckpt_converter.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

# Batch-major banded einsums re-read the band blocks once per sample:
# per apply, batch-major traffic scales ~ B*S*V*(128 + C) vs vertex-major
# ~ S*V*B*C, so the vertex-major Pallas path wins by up to (128+C)/C once
# the batch amortizes its transposes and per-call overhead. Measured
# (docs/PERF.md): 2x per conv at B=64/C=64 level 0, full-step 111->95.6 ms
# at batch 64; a net LOSS at batch 16 (12.0->13.7 ms — per-call overhead
# beats the saving at every eligible shape). Both thresholds must pass;
# a channel cap was tried and measured worse at batch >= 32 (the wide
# decoder levels benefit too: step 95.6 vs 101.9 ms at batch 64).
VM_MIN_COLS = int(os.environ.get("CAPE_TPU_VM_MIN_COLS", "2048"))
VM_MIN_BATCH = int(os.environ.get("CAPE_TPU_VM_MIN_BATCH", "32"))
# Minimum Fin for the project-first (Clenshaw) routing; see
# _cheb_conv_projfirst. 10000 disables it.
PF_MIN_FIN = int(os.environ.get("CAPE_TPU_PF_MIN_FIN", "0"))


def cheb_basis(x: jnp.ndarray, lap, K: int) -> list[jnp.ndarray]:
    """The K Chebyshev basis tensors [x, L~x, 2L~(L~x)-x, ...]."""
    xs = [x]
    if K > 1:
        xs.append(lap(x))
    for _ in range(2, K):
        xs.append(2.0 * lap(xs[-1]) - xs[-2])
    return xs


def _project(x, w):
    return jnp.einsum(
        "...vi,io->...vo", x, w.astype(x.dtype), preferred_element_type=x.dtype
    )


def _cheb_conv_projfirst(x: jnp.ndarray, lap, weight: jnp.ndarray) -> jnp.ndarray:
    """Project-first (Clenshaw) ordering of the Chebyshev filter:

        u_k = x @ W[k];  b_k = u_k + 2 L~ b_{k+1} - b_{k+2}  (b_{K}=b_{K+1}=0)
        y   = u_0 + L~ b_1 - b_2

    Exact reordering of sum_k T_k(L~) x W[k] — the K-1 operator applies
    run on Fout channels instead of Fin. The banded apply is bandwidth-
    bound, so this wins whenever Fout < Fin (every decoder conv: measured
    3.4x fwd+bwd at level-1 C=128->F=64, docs/PERF.md). cheb_conv routes
    here on Fout < Fin."""
    K = weight.shape[0]
    u = [_project(x, weight[k]) for k in range(K)]
    bk1 = bk2 = None                                   # b_{k+1}, b_{k+2}
    for k in range(K - 1, 0, -1):
        b = u[k]
        if bk1 is not None:
            b = b + 2.0 * lap(bk1)
        if bk2 is not None:
            b = b - bk2
        bk1, bk2 = b, bk1
    y = u[0]
    if bk1 is not None:
        y = y + lap(bk1)
    if bk2 is not None:
        y = y - bk2
    return y


def cheb_conv(x: jnp.ndarray, lap, weight: jnp.ndarray) -> jnp.ndarray:
    """y = sum_k T_k(L~) x @ W[k].

    x: [..., V, Fin]; weight: [K, Fin, Fout]; lap: a level operator from
    ops.sparse. Returns [..., V, Fout].
    """
    K = weight.shape[0]
    if K == 2 and x.ndim == 3:
        from cape_tpu.ops import pallas as pallas_cfg
        from cape_tpu.ops.banded import BandedOp

        # cfg.use_pallas (per-op allow_pallas) decides; CAPE_TPU_PALLAS
        # overrides in BOTH directions (0 = kill switch, 1 = force on)
        if isinstance(lap, BandedOp) and lap.pallas_eligible:
            env = pallas_cfg.override()
            allow = lap.allow_pallas if env is None else env
        else:
            allow = False
        if allow:
            # large-batch auto path: on by default past the measured
            # thresholds (the v2 experiment below stays opt-in)
            if (
                x.shape[0] >= VM_MIN_BATCH
                and x.shape[0] * x.shape[2] >= VM_MIN_COLS
            ):
                from cape_tpu.ops.pallas.cheb_kernel import cheb2_banded_pallas_v3

                return cheb2_banded_pallas_v3(x, lap, weight)
            if pallas_cfg.enabled() and not lap.padded:
                from cape_tpu.ops.pallas.cheb_kernel import cheb2_banded_pallas_v2

                return cheb2_banded_pallas_v2(x, lap, weight)
    if (
        K > 1
        and weight.shape[2] < weight.shape[1]
        and weight.shape[1] >= PF_MIN_FIN
    ):
        # decoder-shaped convs (Fout < Fin): Clenshaw ordering applies the
        # operator to the projected (narrower) tensor
        return _cheb_conv_projfirst(x, lap, weight)
    # per-order accumulation. The concat-then-matmul alternative (the
    # reference's formulation) measures 23-29% faster for the isolated
    # forward (fatter K*Fin contraction) but 19% slower for the full
    # fwd+bwd step — the materialized [B, V, K*Fin] concat costs more in
    # backward than the fatter matmul saves. Measured on v5e; see
    # docs/PERF.md.
    acc = None
    for k, xk in enumerate(cheb_basis(x, lap, K)):
        term = jnp.einsum(
            "...vi,io->...vo", xk, weight[k].astype(x.dtype),
            preferred_element_type=x.dtype,
        )
        acc = term if acc is None else acc + term
    return acc


def cheb_conv_up(x: jnp.ndarray, up, lap_up, weight: jnp.ndarray) -> jnp.ndarray:
    """K<=2 Chebyshev conv with the decoder's unpool COMPOSED INTO the
    operator:  y = sum_k T_k(L~_fine) (U x) W[k]  evaluated as

        y = U (x W[0]) + (L~ U) (x W[1])

    using the precomposed banded product lap_up = L~ @ U
    (GraphContext.lap_up). Exact reordering (linearity); vs `up` followed
    by `cheb_conv`, the weight projections run at the COARSE vertex count
    and the unpooled [B, V_fine, Fin] intermediate never exists — the
    apply traffic drops from (U at Fin) + (L~ at Fout reading fine rows)
    to (U at Fout) + (L~U at Fout reading coarse rows). For factor-1
    levels up is the identity and this is exactly the project-first
    (Clenshaw) K=2 form."""
    K = weight.shape[0]
    w = weight.astype(x.dtype)
    y = up(_project(x, w[0]))
    if K == 1:
        return y
    assert K == 2, "cheb_conv_up supports K<=2 (VAE convs); use cheb_conv"
    return y + lap_up(_project(x, w[1]))


def cheb_conv_up_folded(
    x: jnp.ndarray,
    conds: list[jnp.ndarray],
    up,
    lap_up,
    weight: jnp.ndarray,
) -> jnp.ndarray:
    """cheb_conv_up over concat([x, c (x) 1, ...]) with the condition
    channels algebraically folded (see cheb_conv_folded): the concat
    happened BEFORE the unpool, so each condition term is
    (T_k(L~) U 1) (x) (c W_c[k]) — the seed bases are one [V_c, 1] apply
    of `up` / `lap_up` each."""
    K, fin_total, _ = weight.shape
    fx = x.shape[-1]
    w = weight.astype(x.dtype)
    y = cheb_conv_up(x, up, lap_up, w[:, :fx, :])

    ones = jnp.ones((x.shape[-2], 1), dtype=x.dtype)
    seed_basis = [up(ones)]
    if K == 2:
        seed_basis.append(lap_up(ones))
    V = y.shape[-2]
    off = fx
    for c in conds:
        dim = c.shape[-1]
        c = c.astype(x.dtype)
        for k in range(K):
            proj = c @ w[k, off : off + dim, :]                  # [B, Fout]
            basis = seed_basis[k].reshape((1,) * (y.ndim - 2) + (V, 1))
            y = y + basis * proj[..., None, :]
        off += dim
    assert off == fin_total, (off, fin_total)
    return y


def cheb_conv_folded(
    x: jnp.ndarray,
    conds: list[jnp.ndarray],
    lap,
    weight: jnp.ndarray,
    cond_seed: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Chebyshev conv over concat([x, c_1 (x) 1, c_2 (x) 1, ...]) without
    materializing the per-vertex condition broadcast.

    The reference tiles each condition vector across all vertices and
    concatenates it onto the channel axis before every conv
    (lib/models.py:532-536, 591-609, 663-666). Since the conv is linear and
    the condition channels are vertex-constant,

        T_k(A~)(c (x) u) @ W_c[k]  ==  (T_k(A~) u) (x) (c @ W_c[k])

    — K tiny [V,1] operator applies plus rank-1 broadcasts, instead of
    convolving (and storing) nz_cond extra channels at every vertex. Exact
    to fp rounding, parameter layout unchanged (W rows beyond x's channels
    are the condition rows, in concat order).

    cond_seed: the per-vertex coefficient of the broadcast condition
    ([V, 1]); `None` means ones (fresh concat). When the concat passed
    through an upsampling first, pass u = U @ 1 to commute exactly.
    """
    K, fin_total, fout = weight.shape
    fx = x.shape[-1]
    w = weight.astype(x.dtype)
    y = cheb_conv(x, lap, w[:, :fx, :])

    V = y.shape[-2]
    seed = (
        jnp.ones((V, 1), dtype=x.dtype)
        if cond_seed is None
        else cond_seed.astype(x.dtype)
    )
    # Per-(cond, k) rank-1 updates. A batched two-einsum form ("kdf" proj +
    # "kv,kbf->bvf" broadcast) was measured round 3 and is NOT faster
    # (same-session A/B 11.05 vs 11.34 ms mean at batch 16): these rank-1
    # adds fuse into the surrounding elementwise work, while the stacked
    # einsum materializes. Keep the loop.
    seed_basis = cheb_basis(seed, lap, K)        # K x [V, 1]
    off = fx
    for c in conds:
        dim = c.shape[-1]
        c = c.astype(x.dtype)
        for k in range(K):
            proj = c @ w[k, off : off + dim, :]                  # [B, Fout]
            basis = seed_basis[k].reshape((1,) * (y.ndim - 2) + (V, 1))
            y = y + basis * proj[..., None, :]
        off += dim
    assert off == fin_total, (off, fin_total)
    return y
