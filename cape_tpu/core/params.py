"""Parameter initialization and small functional-layer helpers.

cape_tpu uses explicit nested-dict param pytrees (no module framework):
every layer is an (init, apply) function pair. Initializer distributions
match the reference so training dynamics are comparable:
  * graph-conv weights / biases: truncated_normal(0, 0.1) and const 0.1
    (reference: lib/models.py:217-227),
  * dense (fc) layers: glorot-uniform kernel, zero bias
    (TF tf.layers.dense defaults, reference: lib/models.py:496 etc).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# TF's tf.nn.leaky_relu default slope, used throughout the reference.
LEAKY_SLOPE = 0.2


def trunc_normal(key, shape, stddev: float = 0.1, dtype=jnp.float32):
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def glorot_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def conv_weight(key, K: int, fin: int, fout: int):
    """Chebyshev filterbank [K, Fin, Fout] (reference init: trunc normal 0.1)."""
    return trunc_normal(key, (K, fin, fout))


def conv_bias(fout: int):
    """Per-filter bias, const 0.1 (reference: lib/models.py:223-227)."""
    return jnp.full((fout,), 0.1, dtype=jnp.float32)


def dense_init(key, fin: int, fout: int) -> dict:
    return {
        "kernel": glorot_uniform(key, (fin, fout)),
        "bias": jnp.zeros((fout,), dtype=jnp.float32),
    }


def dense_apply(p: dict, x: jnp.ndarray, activation=None) -> jnp.ndarray:
    y = (
        jnp.einsum(
            "...i,io->...o", x, p["kernel"].astype(x.dtype),
            preferred_element_type=x.dtype,
        )
        + p["bias"].astype(x.dtype)
    )
    if activation is not None:
        y = activation(y)
    return y


def leaky_relu(x):
    return jax.nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


ACTIVATIONS = {
    # reference names (config_parser.py:22): bias-then-nonlinearity variants
    "b1leakyrelu": leaky_relu,
    "b1relu": jax.nn.relu,
    "b1tanh": jnp.tanh,
}


def vertex_bias(num_verts: int, fout: int):
    """Per-vertex-per-filter bias, const 0.1 — the reference's b2relu bias
    variant (lib/models.py:123-127; used by the decoder output layer)."""
    return jnp.full((num_verts, fout), 0.1, dtype=jnp.float32)


def b2relu(x: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """Bias (per vertex per filter) + ReLU (lib/models.py:123-127)."""
    return jax.nn.relu(x + bias.astype(x.dtype))


def split_tree(key, template: dict) -> dict:
    """Split one PRNG key into a matching pytree of keys."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(treedef, list(keys))
