"""The CAPE model: conditional mesh VAE generator + mesh-patch discriminator.

Architecture parity with the reference (lib/models.py:230-832):
  * condition nets: pose 126 -> nz_cond (2-layer FC with the reference's
    hidden-width heuristic, :479-511), clothing-type 4 -> nz_cond2
    (n_layer_cond layers, default linear);
  * encoder: N Chebyshev conv blocks (plain or residual) over the mesh
    pyramid, optional per-vertex condition concat, optional 1x1 channel
    reduction, then FC heads for z_mean / z_logvar (:514-561);
  * decoder: FC from [z | y | y2], 1x1 channel expansion, condition
    re-concat before every layer, N deconv blocks (plain / CMR-GN /
    affine), final conv to 3 channels + per-vertex bias (:564-617);
  * discriminator: pix2pix-style per-vertex real/fake map on the
    4-level ds2 pyramid with its own Chebyshev order Kd (:648-678).

Everything is a pure function over (params, GraphContext, inputs); the
model object only carries the config and the derived channel plan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cape_tpu.core.config import CAPEConfig
from cape_tpu.core.params import (
    ACTIVATIONS,
    conv_weight,
    dense_apply,
    dense_init,
    leaky_relu,
)
from cape_tpu.models import blocks
from cape_tpu.ops.banded import padded_size
from cape_tpu.ops.cheb import cheb_conv, cheb_conv_folded
from cape_tpu.ops.sparse import GraphContext


def _pad_vertex_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Pad the vertex axis of [..., V, C] up to the next 128-multiple
    (persistent-padded layout entry boundary; ops.banded)."""
    P = padded_size(x.shape[-2])
    if P == x.shape[-2]:
        return x
    pad = [(0, 0)] * (x.ndim - 2) + [(0, P - x.shape[-2]), (0, 0)]
    return jnp.pad(x, pad)


def _cond_hidden_width(y_dim: int, nz_cond: int) -> int:
    """Hidden width heuristic of the 2-layer condition net (lib/models.py:498-503)."""
    if nz_cond < y_dim // 2:
        return y_dim // 2
    if nz_cond < y_dim * 2:
        return y_dim
    return nz_cond // 2


class CAPE:
    def __init__(self, config: CAPEConfig):
        self.cfg = config
        self.act = ACTIVATIONS[config.activation]
        self.dtype = jnp.dtype(config.compute_dtype)

    def _block(self, fn):
        """Optionally rematerialize a block under autodiff: with cfg.remat
        the backward pass recomputes block activations instead of storing
        them — at batch >= 64 the stored-activation set otherwise exceeds
        HBM headroom and XLA falls back to slow compressed copies."""
        return jax.checkpoint(fn) if self.cfg.remat else fn

    # ------------------------------------------------------------- channels
    def _encoder_channels(self) -> list[int]:
        cfg = self.cfg
        c = cfg.nn_input_channel
        if cfg.cond_encoder:
            c += cfg.nz_cond + cfg.nz_cond2
        chans = [c]
        for f in cfg.channels:
            chans.append(f)
        return chans  # chans[i] = input channels of encoder layer i

    def _decoder_plan(self) -> list[tuple[int, int]]:
        """[(fin, fout_block)] per decoder block, after cond concat."""
        cfg = self.cfg
        ncond = cfg.nz_cond + cfg.nz_cond2
        F = cfg.channels
        c = F[-1] + ncond
        plan = []
        for i in range(cfg.num_conv_layers):
            fout = F[-(i + 1)]
            plan.append((c, fout))
            block_out = fout // 2 if (cfg.use_res_block_dec and cfg.affine) else fout
            c = block_out + ncond
        return plan

    # ------------------------------------------------------------------ init
    def init_params(self, rng: jax.Array, ctx: GraphContext) -> dict:
        cfg = self.cfg
        keys = iter(jax.random.split(rng, 64))
        nxt = lambda: next(keys)

        # condition nets (shared between G and D applications)
        pose_hidden = _cond_hidden_width(cfg.cond_dim, cfg.nz_cond)
        cond_pose = {
            "fc1": dense_init(nxt(), cfg.cond_dim, pose_hidden),
            "fc2": dense_init(nxt(), pose_hidden, cfg.nz_cond),
        }
        if cfg.n_layer_cond == 1:
            cond_clo = {"fc1": dense_init(nxt(), cfg.cond2_dim, cfg.nz_cond2)}
        else:
            clo_hidden = _cond_hidden_width(cfg.cond2_dim, cfg.nz_cond2)
            cond_clo = {
                "fc1": dense_init(nxt(), cfg.cond2_dim, clo_hidden),
                "fc2": dense_init(nxt(), clo_hidden, cfg.nz_cond2),
            }

        # encoder
        enc_chans = self._encoder_channels()
        F, K = cfg.channels, cfg.K
        encoder: dict = {}
        for i in range(cfg.num_conv_layers):
            fin, fout = enc_chans[i], F[i]
            if cfg.use_res_block:
                encoder[f"layer{i}"] = blocks.res_block_init(nxt(), K, fin, fout)
            else:
                encoder[f"layer{i}"] = blocks.conv_block_init(nxt(), K, fin, fout)
        p_last = ctx.level_sizes[-1]
        enc_out_c = F[-1]
        if cfg.reduce_dim > 0:
            enc_out_c = F[-1] // cfg.reduce_rate
            encoder["reduce"] = blocks.conv1x1_init(nxt(), F[-1], enc_out_c)
        flat = p_last * enc_out_c
        encoder["fc_mean"] = dense_init(nxt(), flat, cfg.nz)
        encoder["fc_var"] = dense_init(nxt(), flat, cfg.nz)

        # decoder
        decoder: dict = {}
        fc1_out_c = F[-1] // cfg.reduce_rate
        decoder["fc1"] = dense_init(nxt(), cfg.z_total_dim, p_last * fc1_out_c)
        if cfg.reduce_dim > 0:
            decoder["expand"] = blocks.conv1x1_init(nxt(), fc1_out_c, F[-1])
        plan = self._decoder_plan()
        for i, (fin, fout) in enumerate(plan):
            if cfg.use_res_block_dec:
                if cfg.affine:
                    decoder[f"layer{i}"] = blocks.affine_block_init(nxt(), K, fin, fout)
                else:
                    decoder[f"layer{i}"] = blocks.cmr_block_init(nxt(), K, fin, fout)
            else:
                decoder[f"layer{i}"] = blocks.conv_block_init(nxt(), K, fin, fout)
        ncond = cfg.nz_cond + cfg.nz_cond2
        last_block_out = (
            plan[-1][1] // 2 if (cfg.use_res_block_dec and cfg.affine) else plan[-1][1]
        )
        out_fin = last_block_out + ncond
        decoder["out"] = {
            "w": conv_weight(nxt(), K, out_fin, cfg.nn_input_channel),
            # one bias per vertex per channel (lib/models.py:615)
            "b": jnp.full((ctx.level_sizes[0], cfg.nn_input_channel), 0.1, jnp.float32),
        }

        # discriminator (ds2 pyramid, Kd order)
        disc: dict = {}
        c = cfg.nn_input_channel + ncond
        n_d = len(ctx.down_d)
        for i in range(n_d):
            disc[f"layer{i}"] = blocks.conv_block_init(nxt(), cfg.Kd, c, F[i])
            c = F[i]
        # final pred conv uses the VAE poly order (lib/models.py:676 quirk kept)
        disc["pred"] = {"w": conv_weight(nxt(), K, c, 1)}

        return {
            "cond_pose": cond_pose,
            "cond_clo": cond_clo,
            "generator": {"encoder": encoder, "decoder": decoder},
            "discriminator": disc,
        }

    # ------------------------------------------------------------ condition
    def embed_conditions(self, params: dict, pose: jnp.ndarray, clo: jnp.ndarray):
        """(pose [B,126], clo [B,4]) -> (y [B,nz_cond], y2 [B,nz_cond2])."""
        pose = pose.astype(self.dtype)
        clo = clo.astype(self.dtype)
        p = params["cond_pose"]
        y = dense_apply(p["fc1"], pose, activation=leaky_relu)
        y = dense_apply(p["fc2"], y)
        c = params["cond_clo"]
        if "fc2" in c:
            y2 = dense_apply(c["fc1"], clo, activation=leaky_relu)
            y2 = dense_apply(c["fc2"], y2)
        else:
            y2 = dense_apply(c["fc1"], clo)
        return y, y2

    # --------------------------------------------------------------- encoder
    def encode(self, params: dict, ctx: GraphContext, x, y, y2):
        """x [B,V,3] -> (z_mean, z_logvar) [B,nz] (lib/models.py:514-561)."""
        cfg = self.cfg
        enc = params["generator"]["encoder"]
        x = x.astype(self.dtype)
        if ctx.padded:
            # persistent-padded layout: pad ONCE here; every pyramid op is
            # padded-in/padded-out and the tail rows ride along (ops.banded)
            x = _pad_vertex_rows(x)
        fold = cfg.fold_conditions and cfg.cond_encoder
        if cfg.cond_encoder and not fold:
            x = blocks.concat_conditions(x, y, y2)
        for i in range(cfg.num_conv_layers):
            p = enc[f"layer{i}"]
            lap, down = ctx.lap[i], ctx.down[i]
            if fold and i == 0:
                # conditions enter at the input concat only; fold them into
                # the first conv (exact, see ops.cheb.cheb_conv_folded)
                if cfg.use_res_block:
                    blk = self._block(
                        lambda p, x, y, y2, lap=lap, down=down:
                        blocks.res_block_folded_apply(p, x, [y, y2], lap, down, self.act)
                    )
                else:
                    blk = self._block(
                        lambda p, x, y, y2, lap=lap, down=down:
                        blocks.conv_block_folded_apply(p, x, [y, y2], lap, down, self.act)
                    )
                x = blk(p, x, y, y2)
                continue
            if cfg.use_res_block:
                blk = self._block(
                    lambda p, x, lap=lap, down=down: blocks.res_block_apply(
                        p, x, lap, down, self.act
                    )
                )
            else:
                blk = self._block(
                    lambda p, x, lap=lap, down=down: blocks.conv_block_apply(
                        p, x, lap, down, self.act
                    )
                )
            x = blk(p, x)
        if ctx.padded:
            x = x[:, : ctx.level_sizes[-1], :]  # exit the padded layout
        if cfg.reduce_dim > 0:
            x = blocks.conv1x1_apply(enc["reduce"], x, ctx.lap[-1])
        x = x.reshape(x.shape[0], -1)
        z_mean = dense_apply(enc["fc_mean"], x)
        z_logvar = dense_apply(enc["fc_var"], x)
        return z_mean, z_logvar

    # --------------------------------------------------------------- decoder
    def decode(self, params: dict, ctx: GraphContext, z_total, y, y2):
        """[z | y | y2] [B,z_total] -> verts [B,V,3] (lib/models.py:564-617)."""
        cfg = self.cfg
        dec = params["generator"]["decoder"]
        n = cfg.num_conv_layers
        z_total = z_total.astype(self.dtype)
        x = dense_apply(dec["fc1"], z_total, activation=leaky_relu)
        p_last = ctx.level_sizes[-1]
        x = x.reshape(x.shape[0], p_last, -1)
        if cfg.reduce_dim > 0:
            x = blocks.conv1x1_apply(dec["expand"], x, ctx.lap[-1])
        if ctx.padded:
            x = _pad_vertex_rows(x)  # enter the padded layout

        # condition folding is exact for the linear block forms (udn /
        # affine); the CMR block's group norms see the cond channels, so
        # that path keeps the materialized concat
        fold = cfg.fold_conditions and not (cfg.use_res_block_dec and not cfg.affine)

        if not fold:
            x = blocks.concat_conditions(x, y, y2)
        # fused unpool∘conv: the precomposed L~@U operators replace the
        # separate unpool + fine-level conv (exact; ops.cheb.cheb_conv_up)
        fuse = cfg.fuse_decoder and fold and cfg.K == 2
        if fuse and len(ctx.lap_up) == 0:
            raise ValueError(
                "cfg.fuse_decoder=True needs the composed L~@U operators: "
                "build the GraphContext with build_fused=True"
            )
        for i in range(n):
            p = dec[f"layer{i}"]
            lap = ctx.lap[-(i + 2)]
            up = ctx.up[-(i + 1)]
            lap_up = ctx.lap_up[-(i + 1)] if fuse else None
            if fold:
                if fuse and cfg.use_res_block_dec:  # affine, fused
                    blk = self._block(
                        lambda p, x, y, y2, up=up, lu=lap_up:
                        blocks.affine_block_fused_apply(p, x, [y, y2], up, lu)
                    )
                elif fuse:
                    blk = self._block(
                        lambda p, x, y, y2, up=up, lu=lap_up:
                        blocks.deconv_block_fused_apply(p, x, [y, y2], up, lu, self.act)
                    )
                elif cfg.use_res_block_dec:  # affine
                    blk = self._block(
                        lambda p, x, y, y2, lap=lap, up=up:
                        blocks.affine_block_folded_apply(p, x, [y, y2], lap, up)
                    )
                else:
                    blk = self._block(
                        lambda p, x, y, y2, lap=lap, up=up:
                        blocks.deconv_block_folded_apply(p, x, [y, y2], lap, up, self.act)
                    )
                x = blk(p, x, y, y2)
                continue
            if cfg.use_res_block_dec:
                if cfg.affine:
                    blk = self._block(
                        lambda p, x, lap=lap, up=up: blocks.affine_block_apply(p, x, lap, up)
                    )
                else:
                    # padded layout: GN statistics run over the natural
                    # vertex count of this level only
                    nv = lap.n_rows if ctx.padded else None
                    blk = self._block(
                        lambda p, x, lap=lap, up=up, nv=nv: blocks.cmr_block_apply(
                            p, x, lap, up, n_valid=nv
                        )
                    )
            else:
                blk = self._block(
                    lambda p, x, lap=lap, up=up: blocks.deconv_block_apply(
                        p, x, lap, up, self.act
                    )
                )
            x = blk(p, x)
            x = blocks.concat_conditions(x, y, y2)
        if fold:
            x = cheb_conv_folded(x, [y, y2], ctx.lap[0], dec["out"]["w"])
        else:
            x = cheb_conv(x, ctx.lap[0], dec["out"]["w"])
        if ctx.padded:
            x = x[:, : ctx.level_sizes[0], :]  # exit the padded layout
        return x + dec["out"]["b"].astype(x.dtype)

    # ------------------------------------------------------------- generator
    def sample_z(self, rng, z_mean, z_logvar):
        """Reparameterization z = mu + sigma * eps (lib/models.py:193-196).

        The exp is clamped: with the reference's init, deep res-block
        encoders can emit |logvar| in the hundreds at step 0, and
        exp(logvar) overflows float32 -> NaN poisons training. Clamping
        only inside the exp keeps finite values while the KL's linear
        logvar term still provides gradient to bring logvar down.
        """
        eps = jax.random.normal(rng, z_mean.shape, dtype=z_mean.dtype)
        sigma = jnp.exp(0.5 * jnp.clip(z_logvar, -30.0, 30.0))
        return z_mean + sigma * eps

    def generate(self, params, ctx: GraphContext, x, y, y2, rng):
        """Full CVAE forward. Returns (x_hat, z_mean, z_logvar, z)."""
        z_mean, z_logvar = self.encode(params, ctx, x, y, y2)
        z = self.sample_z(rng, z_mean, z_logvar)
        z_total = jnp.concatenate([z, y, y2], axis=-1)
        x_hat = self.decode(params, ctx, z_total, y, y2)
        return x_hat, z_mean, z_logvar, z

    # --------------------------------------------------------- discriminator
    def discriminate(self, params: dict, ctx: GraphContext, x, y, y2):
        """Per-vertex real/fake logits on the coarsest ds2 level
        [B, 431, 1] (lib/models.py:648-678)."""
        cfg = self.cfg
        disc = params["discriminator"]
        x = x.astype(self.dtype)
        if ctx.padded:
            x = _pad_vertex_rows(x)
        fold = cfg.fold_conditions
        if not fold:
            x = blocks.concat_conditions(x, y, y2)
        for i in range(len(ctx.down_d)):
            lap, down = ctx.lap_d[i], ctx.down_d[i]
            if fold and i == 0:
                blk = self._block(
                    lambda p, x, y, y2, lap=lap, down=down:
                    blocks.conv_block_folded_apply(p, x, [y, y2], lap, down, self.act)
                )
                x = blk(disc["layer0"], x, y, y2)
                continue
            blk = self._block(
                lambda p, x, lap=lap, down=down: blocks.conv_block_apply(
                    p, x, lap, down, self.act
                )
            )
            x = blk(disc[f"layer{i}"], x)
        x = cheb_conv(x, ctx.lap_d[-1], disc["pred"]["w"])
        if ctx.padded:
            x = x[:, : ctx.level_sizes_d[-1], :]  # exit the padded layout
        return x
