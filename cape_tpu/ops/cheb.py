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

import jax.numpy as jnp


def cheb_basis(x: jnp.ndarray, lap, K: int) -> list[jnp.ndarray]:
    """The K Chebyshev basis tensors [x, L~x, 2L~(L~x)-x, ...]."""
    xs = [x]
    if K > 1:
        xs.append(lap(x))
    for _ in range(2, K):
        xs.append(2.0 * lap(xs[-1]) - xs[-2])
    return xs


def cheb_conv(x: jnp.ndarray, lap, weight: jnp.ndarray) -> jnp.ndarray:
    """y = sum_k T_k(L~) x @ W[k].

    x: [..., V, Fin]; weight: [K, Fin, Fout]; lap: a level operator from
    ops.sparse. Returns [..., V, Fout].
    """
    K = weight.shape[0]
    acc = None
    for k, xk in enumerate(cheb_basis(x, lap, K)):
        term = jnp.einsum(
            "...vi,io->...vo", xk, weight[k].astype(x.dtype),
            preferred_element_type=x.dtype,
        )
        acc = term if acc is None else acc + term
    return acc
