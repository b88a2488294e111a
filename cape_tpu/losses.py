"""Loss functions for CAPE training.

Semantic parity with the reference loss assembly (lib/models.py:354-416 and
lib/losses.py:9-25): masked L1/huber/L2 reconstruction, KL latent loss,
edge-length loss over the SMPL edge table, label-smoothed sigmoid-CE GAN
losses, and the FC-kernel L2 regularization.

Notes on faithfully-kept reference quirks:
  * The regularizer is applied twice in the reference — once inside
    `l2_regularizer(scale=reg)` (which computes reg * sum(w^2)/2) and once
    when assembling the total (`reg * get_regularization_loss`), so the
    effective coefficient is reg^2/2. Additionally only dense kernels
    *inside the generator scope* are collected (encoder fc_mean/fc_var and
    decoder fc1); the condition nets sit outside both scopes and the
    discriminator has no dense layers, so reg_d == 0. We reproduce exactly
    that so loss magnitudes and training dynamics match.
  * The edge loss adds the template vertices to both pred and gt before
    differencing edges (lib/models.py:375); since edge vectors are
    differences, the template cancels — we compute the cancelled form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reconstruction_loss_per_sample(pred, gt, mask=None, kind: str = "l1",
                                   huber_delta: float = 0.1):
    """Per-sample weighted-mean reconstruction loss, shape [B].

    mask: None or per-vertex weights [V]; TF's Reduction.MEAN semantics
    (sum(w * l) / sum(w)) are used when a mask is given. The weights are
    identical per sample, so the batch mean of this equals the reference's
    whole-batch weighted mean.
    """
    diff = pred - gt
    if kind == "l1":
        el = jnp.abs(diff)
    elif kind == "huber":
        a = jnp.abs(diff)
        el = jnp.where(a <= huber_delta, 0.5 * a * a, huber_delta * (a - 0.5 * huber_delta))
    else:  # l2
        el = diff * diff
    non_batch = tuple(range(1, el.ndim))
    if mask is None:
        return jnp.mean(el, axis=non_batch)
    w = jnp.broadcast_to(mask.astype(el.dtype)[None, :, None], el.shape)
    return jnp.sum(w * el, axis=non_batch) / jnp.maximum(
        jnp.sum(w, axis=non_batch), 1e-12
    )


def reconstruction_loss(pred, gt, mask=None, kind: str = "l1", huber_delta: float = 0.1):
    """Batch-mean reconstruction loss (reference whole-batch reduction)."""
    return jnp.mean(reconstruction_loss_per_sample(pred, gt, mask, kind, huber_delta))


def kl_loss_per_sample(z_mean, z_logvar):
    """Per-sample KL(q(z|x) || N(0, I)), shape [B] (lib/models.py:370-372).

    The exp is clamped (see CAPE.sample_z): the linear logvar term keeps
    its gradient, so an over-large init logvar is still pulled down
    instead of producing inf/NaN losses.
    """
    return -0.5 * jnp.sum(
        1.0
        + z_logvar
        - jnp.square(z_mean)
        - jnp.exp(jnp.clip(z_logvar, -30.0, 30.0)),
        axis=-1,
    )


def kl_loss(z_mean, z_logvar):
    """Mean over batch of the per-sample KL."""
    return jnp.mean(kl_loss_per_sample(z_mean, z_logvar))


def edge_loss_per_sample(pred, gt, edge_op):
    """Per-sample mean edge-difference length, shape [B] (lib/losses.py:9-25).

    edge_op is the [E, V] edge-difference operator from the GraphContext
    (banded/gather-free on TPU); mean over edges is order-invariant, so
    the operator's band-sorted edge order is immaterial.
    """
    edge_diff = edge_op(pred - gt)
    # eps inside the sqrt: the norm's gradient at exactly-zero difference
    # is NaN and would poison training (value shift is ~1e-6, negligible
    # against typical normalized edge diffs ~ O(1))
    return jnp.mean(jnp.sqrt(jnp.sum(jnp.square(edge_diff), axis=-1) + 1e-12), axis=-1)


def edge_loss(pred, gt, edge_op):
    """Batch-and-edge mean of edge-difference lengths."""
    return jnp.mean(edge_loss_per_sample(pred, gt, edge_op))


def edge_loss_indexed(pred, gt, edges):
    """Index-table variant (host/tests): edges [E, 2] int32."""
    d = pred - gt
    edge_diff = jnp.take(d, edges[:, 0], axis=-2) - jnp.take(d, edges[:, 1], axis=-2)
    return jnp.mean(jnp.linalg.norm(edge_diff, axis=-1))


def face_normal_loss(pred, gt, faces):
    """Cosine dissimilarity 1 - |cos| between pred and gt face normals,
    averaged over non-degenerate gt faces (lib/losses.py:27-47)."""
    from cape_tpu.meshops.normals import face_normals

    n_pred = face_normals(pred, faces)
    n_gt = face_normals(gt, faces)
    cos_abs = jnp.abs(jnp.sum(n_pred * n_gt, axis=-1))
    valid = (jnp.sum(jnp.square(n_gt), axis=-1) > 1e-14).astype(cos_abs.dtype)
    return jnp.sum((1.0 - cos_abs) * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def vertex_normal_loss(pred, gt, faces, ftov_op=None):
    """Cosine dissimilarity between estimated vertex normals."""
    from cape_tpu.meshops.normals import vertex_normals

    n_pred = vertex_normals(pred, faces, ftov_op)
    n_gt = vertex_normals(gt, faces, ftov_op)
    cos_abs = jnp.abs(jnp.sum(n_pred * n_gt, axis=-1))
    valid = (jnp.sum(jnp.square(n_gt), axis=-1) > 1e-14).astype(cos_abs.dtype)
    return jnp.sum((1.0 - cos_abs) * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def _sigmoid_ce(logits, labels):
    # numerically stable sigmoid cross-entropy with soft labels
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def gan_generator_loss(d_logits_fake, smooth: float = 0.1):
    """G wants D(fake) -> 'real' with label smoothing (lib/models.py:385-387)."""
    return _sigmoid_ce(d_logits_fake, (1.0 - smooth) * jnp.ones_like(d_logits_fake))


def gan_discriminator_loss(d_logits_real, d_logits_fake, smooth: float = 0.1):
    """Soft labels 0.9 / 0.1 (lib/models.py:383-390)."""
    real = _sigmoid_ce(d_logits_real, (1.0 - smooth) * jnp.ones_like(d_logits_real))
    fake = _sigmoid_ce(d_logits_fake, smooth * jnp.ones_like(d_logits_fake))
    return real + fake


def generator_fc_l2(params: dict) -> jnp.ndarray:
    """Sum of squared FC kernels the reference actually regularizes:
    encoder fc_mean / fc_var and decoder fc1 (see module docstring)."""
    gen = params["generator"]
    terms = [
        gen["encoder"]["fc_mean"]["kernel"],
        gen["encoder"]["fc_var"]["kernel"],
        gen["decoder"]["fc1"]["kernel"],
    ]
    return sum(jnp.sum(jnp.square(w)) for w in terms)


def regularization_scale(regularization: float) -> float:
    """Effective coefficient reproducing the reference's double application:
    reg * (reg * sum(w^2) / 2)."""
    return 0.5 * regularization * regularization
