"""Jitted train / eval steps.

One fused XLA program per step: generator forward, two discriminator
applications (real / fake), both losses, both gradient sets, both
optimizer updates. This replaces the reference's two feed_dict-driven
`sess.run` calls per step (lib/models.py:905-906) and resolves its
double-update quirk to the intent: exactly one G and one D update per
step, one global-step increment (SURVEY quirk #2).

GAN alternation semantics: both gradient sets are evaluated at the current
params (simultaneous update). The shared forward computation between
loss_g and loss_d is CSE'd by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cape_tpu import losses
from cape_tpu.core.config import CAPEConfig
from cape_tpu.models.cape import CAPE
from cape_tpu.ops.sparse import GraphContext
from cape_tpu.train.optim import TrainState


def _forward_losses(model: CAPE, cfg: CAPEConfig, params, ctx: GraphContext, batch, rng):
    """Shared forward pass producing every loss term.

    Not on the production step path (that's _gan_losses, the
    stop_gradient-blocked single-backward form); kept as the plain
    two-player reference implementation that the gradient-equivalence
    test checks _gan_losses against (tests/test_train.py)."""
    y_g, y2_g = model.embed_conditions(params, batch["pose_g"], batch["clo_g"])
    y_d, y2_d = model.embed_conditions(params, batch["pose_d"], batch["clo_d"])

    x_hat, z_mean, z_logvar, _ = model.generate(
        params, ctx, batch["disp_g"], y_g, y2_g, rng
    )
    d_real = model.discriminate(params, ctx, batch["disp_d"], y_d, y2_d)
    d_fake = model.discriminate(params, ctx, x_hat, y_g, y2_g)

    gt = batch["disp_g"].astype(x_hat.dtype)
    mask = ctx.loss_mask if ctx.loss_mask.ndim > 0 else None
    recon = losses.reconstruction_loss(x_hat, gt, mask=mask, kind=cfg.loss)
    kl = losses.kl_loss(z_mean, z_logvar)
    edge = losses.edge_loss(x_hat, gt, ctx.edge_op)
    gan_g = losses.gan_generator_loss(d_fake)
    gan_d = losses.gan_discriminator_loss(d_real, d_fake)
    reg_g = losses.regularization_scale(cfg.regularization) * losses.generator_fc_l2(params)

    loss_g = (
        cfg.lambda_gan * gan_g
        + cfg.lambda_recon * recon
        + cfg.lambda_edge * edge
        + cfg.lambda_latent * kl
        + reg_g
    )
    loss_d = cfg.lambda_gan * gan_d  # reg_d == 0 in the reference (see losses.py)

    metrics = {
        "loss_g": loss_g,
        "loss_d": loss_d,
        "recon": recon,
        "kl": kl,
        "edge": edge,
        "gan_g": gan_g,
        "gan_d": gan_d,
        "reg_g": reg_g,
    }
    return loss_g, loss_d, metrics


def _gan_losses(model: CAPE, cfg: CAPEConfig, params, ctx: GraphContext, batch, rng):
    """Both players' losses with per-player gradient blocking, so ONE
    backward pass yields exactly the stitched two-player gradients:

      * the G loss sees the discriminator through stop_gradient'd D params
        (its D cotangents are zero by construction);
      * the D loss sees stop_gradient'd generator outputs and condition
        embeddings (the reference computes-then-discards dLoss_d/dG,
        lib/models.py:464-467 — here the wasted full generator backward is
        never built).

    Gradients of (loss_g + loss_d) match jax.grad(loss_g) on the G/cond
    subtrees and jax.grad(loss_d) on the D subtree (tested)."""
    sg = jax.lax.stop_gradient

    y_g, y2_g = model.embed_conditions(params, batch["pose_g"], batch["clo_g"])
    y_d, y2_d = model.embed_conditions(params, batch["pose_d"], batch["clo_d"])
    x_hat, z_mean, z_logvar, _ = model.generate(
        params, ctx, batch["disp_g"], y_g, y2_g, rng
    )

    params_d_frozen = dict(params)
    params_d_frozen["discriminator"] = sg(params["discriminator"])
    d_fake_for_g = model.discriminate(params_d_frozen, ctx, x_hat, y_g, y2_g)

    # NOTE measured, rejected (round 3): batching real+fake into ONE
    # [2B] discriminate call here is semantically exact (no cross-row
    # coupling in the D blocks) but LOSES ~10% wall (12.13 vs 10.99
    # ms/step, same-session ABBA): the forward HLO of d_fake_for_d is
    # byte-identical to d_fake_for_g's (stop_gradient vanishes in the
    # forward), so XLA CSEs the two fake forwards in THIS form — the
    # concat form breaks that CSE and pays a third B-wide D forward,
    # plus 2B=32 crosses the Pallas-v3 routing threshold tuned for the
    # generator. Keep the two-call form.
    d_real = model.discriminate(params, ctx, batch["disp_d"], sg(y_d), sg(y2_d))
    d_fake_for_d = model.discriminate(params, ctx, sg(x_hat), sg(y_g), sg(y2_g))

    gt = batch["disp_g"].astype(x_hat.dtype)
    mask = ctx.loss_mask if ctx.loss_mask.ndim > 0 else None
    recon = losses.reconstruction_loss(x_hat, gt, mask=mask, kind=cfg.loss)
    kl = losses.kl_loss(z_mean, z_logvar)
    edge = losses.edge_loss(x_hat, gt, ctx.edge_op)
    gan_g = losses.gan_generator_loss(d_fake_for_g)
    gan_d = losses.gan_discriminator_loss(d_real, d_fake_for_d)
    reg_g = losses.regularization_scale(cfg.regularization) * losses.generator_fc_l2(params)

    loss_g = (
        cfg.lambda_gan * gan_g
        + cfg.lambda_recon * recon
        + cfg.lambda_edge * edge
        + cfg.lambda_latent * kl
        + reg_g
    )
    loss_d = cfg.lambda_gan * gan_d
    metrics = {
        "loss_g": loss_g,
        "loss_d": loss_d,
        "recon": recon,
        "kl": kl,
        "edge": edge,
        "gan_g": gan_g,
        "gan_d": gan_d,
        "reg_g": reg_g,
    }
    return loss_g + loss_d, metrics


def build_train_step(model: CAPE, cfg: CAPEConfig, tx):
    """Returns step_fn(state, ctx, batch, rng) -> (state, metrics)."""

    def total_loss_fn(params, ctx, batch, rng):
        return _gan_losses(model, cfg, params, ctx, batch, rng)

    def step_fn(state: TrainState, ctx: GraphContext, batch: dict, rng: jax.Array):
        (_, metrics), grads = jax.value_and_grad(total_loss_fn, has_aux=True)(
            state.params, ctx, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), state.params, updates
        )
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        return new_state, metrics

    return step_fn


def build_resident_train_step(model: CAPE, cfg: CAPEConfig, tx):
    """Train step over a device-resident dataset.

    The reference feeds every minibatch through feed_dict (host->device
    per step, lib/models.py:892-906); over a remote-attached link that
    upload dominates the step. Here the packed train arrays live in HBM
    (a few GB at most — the male set is 2.5 GB) and the per-step host
    traffic is two [batch] int32 index vectors; the batch gather happens
    on device inside the jitted step.

    Returns step_fn(state, ctx, data, idx_g, idx_d, rng) where data is
    {'disp','pose','clo'} full train arrays.
    """
    base_step = build_train_step(model, cfg, tx)

    def step_fn(state, ctx, data, idx_g, idx_d, rng):
        batch = {
            "disp_g": jnp.take(data["disp"], idx_g, axis=0),
            "pose_g": jnp.take(data["pose"], idx_g, axis=0),
            "clo_g": jnp.take(data["clo"], idx_g, axis=0),
            "disp_d": jnp.take(data["disp"], idx_d, axis=0),
            "pose_d": jnp.take(data["pose"], idx_d, axis=0),
            "clo_d": jnp.take(data["clo"], idx_d, axis=0),
        }
        return base_step(state, ctx, batch, rng)

    return step_fn


def build_multi_train_step(model: CAPE, cfg: CAPEConfig, tx):
    """K train steps per dispatch, scanned on device.

    One host dispatch + one sync round-trip then covers K full GAN steps:
    on the remote-attached link each step otherwise pays ~4 ms dispatch
    and a share of the ~29 ms sync fetch on top of ~12 ms device time
    (profiled; docs/PERF.md). `lax.scan` chains the steps on device —
    the same fused step program runs back-to-back with zero host
    involvement. Harmless on locally attached hardware, where it merely
    shrinks the Python-dispatch share.

    Per-step RNG is folded from `state.step` inside the scan body, so a
    run chunked as [8, 8] consumes bit-identical randomness to 16
    single-step dispatches (resume determinism; tested).

    Returns multi_fn(state, ctx, data, idx_g [K,B], idx_d [K,B], rng)
    -> (state, metrics stacked [K]).
    """
    base_step = build_resident_train_step(model, cfg, tx)

    def multi_fn(state, ctx, data, idx_g, idx_d, rng):
        def body(state, idx):
            ig, idd = idx
            step_rng = jax.random.fold_in(rng, state.step)
            return base_step(state, ctx, data, ig, idd, step_rng)

        return jax.lax.scan(body, state, (idx_g, idx_d))

    return multi_fn


def build_multi_eval_step(model: CAPE, cfg: CAPEConfig):
    """Every eval batch of a split scanned in ONE dispatch.

    The per-batch eval loop pays one host->device batch upload, one
    dispatch and one ~29 ms sync fetch PER BATCH through the remote
    relay — ~4 s/epoch for the 100-sample val split (docs/PERF.md
    endurance attribution). Here the split is device-resident (like the
    train set) and `lax.scan` runs all padded batches back-to-back on
    device; the host ships one [nb, B] int32 index array and fetches one
    stacked metrics pytree.

    Bit-equivalence with the one-batch-at-a-time path: pad entries of
    `idx` are OUT OF RANGE (== split length) and gather exact zero rows
    via `mode='fill'` — the same zero padding the host loop concatenated
    — and the per-batch rng is folded from the batch's row offset, the
    same fold the host loop used. The existing padded-tail oracle test
    therefore pins this path too (tests/test_train.py).

    Returns multi_eval_fn(params, ctx, data, idx [nb, B], rng)
    -> per-sample metrics, each [nb, B].
    """
    eval_fn = build_eval_step(model, cfg)

    def multi_eval_fn(params, ctx: GraphContext, data: dict, idx, rng: jax.Array):
        bs = idx.shape[1]

        def body(carry, scan_in):
            ib, begin = scan_in
            batch = {
                k: jnp.take(data[k], ib, axis=0, mode="fill", fill_value=0)
                for k in ("disp", "pose", "clo")
            }
            _, metrics = eval_fn(params, ctx, batch, jax.random.fold_in(rng, begin))
            return carry, metrics

        begins = jnp.arange(idx.shape[0], dtype=jnp.int32) * bs
        _, metrics = jax.lax.scan(body, 0, (idx, begins))
        return metrics

    return multi_eval_fn


def build_eval_step(model: CAPE, cfg: CAPEConfig):
    """Returns eval_fn(params, ctx, batch, rng) -> (pred, per_sample_metrics).

    Mirrors the reference's `predict` losses (lib/models.py:1018-1092):
    reconstruction through the sampled-z path, KL, edge.

    Metrics are PER-SAMPLE vectors [B], not batch means: eval batches may
    be padded to the fixed batch size, and a batch-mean would average the
    pad rows' garbage losses into the result (the reference instead drops
    the tail batch entirely, lib/models.py:1083-1088 — also wrong). The
    host caller reduces over real rows only (Trainer.evaluate).
    """

    def eval_fn(params, ctx: GraphContext, batch: dict, rng: jax.Array):
        y, y2 = model.embed_conditions(params, batch["pose"], batch["clo"])
        x_hat, z_mean, z_logvar, _ = model.generate(
            params, ctx, batch["disp"], y, y2, rng
        )
        gt = batch["disp"].astype(x_hat.dtype)
        mask = ctx.loss_mask if ctx.loss_mask.ndim > 0 else None
        metrics = {
            "recon": losses.reconstruction_loss_per_sample(
                x_hat, gt, mask=mask, kind=cfg.loss
            ),
            "kl": losses.kl_loss_per_sample(z_mean, z_logvar),
            "edge": losses.edge_loss_per_sample(x_hat, gt, ctx.edge_op),
        }
        # per-sample metrics leave the step as f32: under bf16 compute the
        # host-side reduction would otherwise run in numpy bfloat16 and a
        # 100-element np.sum loses ~1-2% (measured — the scan-vs-loop eval
        # "disagreement" was exactly this aggregation error, not the paths)
        metrics = {k: v.astype(jnp.float32) for k, v in metrics.items()}
        return x_hat.astype(jnp.float32), metrics

    return eval_fn
