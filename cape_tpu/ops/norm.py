"""Normalization layers.

Group norm matching the reference's GraphCMR-style implementation
(lib/models.py:681-712): groups over the channel axis with G = min(32, C),
statistics over (channels-in-group, vertices), per-channel gamma/beta.
Used by the CMR decoder residual blocks.
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
) -> jnp.ndarray:
    """x: [B, V, C]; gamma/beta: [C]. Returns [B, V, C]."""
    B, V, C = x.shape
    G = min(num_groups, C)
    xg = jnp.transpose(x, (0, 2, 1)).reshape(B, G, C // G, V)
    mean = jnp.mean(xg, axis=(2, 3), keepdims=True)
    var = jnp.var(xg, axis=(2, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(B, C, V) * gamma.astype(x.dtype)[None, :, None] + beta.astype(x.dtype)[None, :, None]
    return jnp.transpose(out, (0, 2, 1))


def batch_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Batch-statistics normalization over (batch, vertices) per channel —
    the reference's norm_type='batch' option (lib/models.py:688-691).
    Training-mode statistics only: no reference config uses batch norm, so
    running-average state is intentionally not threaded through params."""
    mean = jnp.mean(x, axis=(0, 1), keepdims=True)
    var = jnp.var(x, axis=(0, 1), keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    return xn * gamma.astype(x.dtype) + beta.astype(x.dtype)


def normalize(x, gamma, beta, kind: str = "group", num_groups: int = 32, eps: float = 1e-5):
    """Dispatcher mirroring the reference's gn() norm_type switch."""
    if kind == "none":
        return x
    if kind == "batch":
        return batch_norm(x, gamma, beta, eps)
    if kind == "group":
        return group_norm(x, gamma, beta, num_groups, eps)
    raise NotImplementedError(kind)
