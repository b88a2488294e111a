"""Normalization layers.

Group norm matching the reference's GraphCMR-style implementation
(lib/models.py:681-712): groups over the channel axis with G = min(32, C),
statistics over (channels-in-group, vertices), per-channel gamma/beta.
Used by the CMR decoder residual blocks.

Persistent-padded layout support: when the vertex axis is padded to a
128-multiple (ops.banded), `n_valid` gives the natural vertex count and
the statistics are computed over the valid rows only (masked two-pass
mean/var with a static divisor — exact, not approximate). Output pad rows
are garbage, which the padded-op contract tolerates (they are annihilated
by the next banded apply or the output slice; their cotangents are
structurally zero, so parameter gradients are unaffected).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
    n_valid: int | None = None,
) -> jnp.ndarray:
    """x: [B, V, C]; gamma/beta: [C]. Returns [B, V, C]. n_valid: natural
    vertex count when V is the padded length (None = all rows valid)."""
    B, V, C = x.shape
    G = min(num_groups, C)
    if C % G:
        # same constraint as the reference (lib/models.py:698 reshape):
        # every group-normed channel count must divide by min(32, C). The
        # CMR decoder sees fout + nz_cond + nz_cond2 channels, so tiny
        # custom configs can violate this — fail with the actual numbers
        # instead of a reshape error deep inside jnp
        raise ValueError(
            f"group_norm: {C} channels do not divide into {G} groups "
            "(min(32, C) must divide C; adjust nf / nz_cond / nz_cond2)"
        )
    xg = jnp.transpose(x, (0, 2, 1)).reshape(B, G, C // G, V)
    if n_valid is None or n_valid == V:
        mean = jnp.mean(xg, axis=(2, 3), keepdims=True)
        var = jnp.var(xg, axis=(2, 3), keepdims=True)
    else:
        # jnp.where, not multiply-by-mask: tail rows may hold ARBITRARY
        # values incl. inf/NaN (padded-op contract), and inf*0 = NaN would
        # poison the statistics of the valid rows
        mask = jnp.arange(V) < n_valid
        n = n_valid * (C // G)
        xm = jnp.where(mask, xg, 0)
        mean = jnp.sum(xm, axis=(2, 3), keepdims=True) / n
        var = jnp.sum(
            jnp.where(mask, jnp.square(xg - mean), 0), axis=(2, 3), keepdims=True
        ) / n
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(B, C, V) * gamma.astype(x.dtype)[None, :, None] + beta.astype(x.dtype)[None, :, None]
    return jnp.transpose(out, (0, 2, 1))


def batch_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    eps: float = 1e-5,
    n_valid: int | None = None,
) -> jnp.ndarray:
    """Batch-statistics normalization over (batch, vertices) per channel —
    the reference's norm_type='batch' option (lib/models.py:688-691).
    Training-mode statistics only: no reference config uses batch norm, so
    running-average state is intentionally not threaded through params."""
    B, V, _ = x.shape
    if n_valid is None or n_valid == V:
        mean = jnp.mean(x, axis=(0, 1), keepdims=True)
        var = jnp.var(x, axis=(0, 1), keepdims=True)
    else:
        mask = (jnp.arange(V) < n_valid)[None, :, None]
        n = B * n_valid
        xm = jnp.where(mask, x, 0)
        mean = jnp.sum(xm, axis=(0, 1), keepdims=True) / n
        var = jnp.sum(
            jnp.where(mask, jnp.square(x - mean), 0), axis=(0, 1), keepdims=True
        ) / n
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    return xn * gamma.astype(x.dtype) + beta.astype(x.dtype)


def normalize(
    x, gamma, beta, kind: str = "group", num_groups: int = 32, eps: float = 1e-5,
    n_valid: int | None = None,
):
    """Dispatcher mirroring the reference's gn() norm_type switch."""
    if kind == "none":
        return x
    if kind == "batch":
        return batch_norm(x, gamma, beta, eps, n_valid=n_valid)
    if kind == "group":
        return group_norm(x, gamma, beta, num_groups, eps, n_valid=n_valid)
    raise NotImplementedError(kind)
