"""Network building blocks: conv/pool stacks and residual variants.

Functional (init, apply) pairs over explicit param dicts. Block semantics
mirror the reference architecture exactly (channel plans, activation
placement, skip projections) while the compute maps to the TPU ops in
cape_tpu.ops:

  conv_block   — conv -> bias+act -> pool            (reference cnp, lib/models.py:154-171)
  deconv_block — unpool -> conv -> bias+act          (reference udn, :173-191)
  res_block    — encoder residual block              (:715-741)
  cmr_block    — GraphCMR GN decoder residual block  (:744-774)
  affine_block — affine decoder residual block       (:776-793, 2004.02658)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cape_tpu.core.params import conv_bias, conv_weight
from cape_tpu.ops.cheb import (
    _project,
    cheb_conv,
    cheb_conv_folded,
    cheb_conv_up_folded,
)
from cape_tpu.ops.norm import group_norm


# ---------------------------------------------------------------- plain conv
def conv_block_init(key, K: int, fin: int, fout: int) -> dict:
    return {"w": conv_weight(key, K, fin, fout), "b": conv_bias(fout)}


def conv_block_apply(p: dict, x, lap, down, act):
    """conv -> bias + activation -> pool."""
    x = cheb_conv(x, lap, p["w"])
    x = act(x + p["b"].astype(x.dtype))
    return down(x)


def deconv_block_apply(p: dict, x, lap, up, act):
    """unpool -> conv -> bias + activation."""
    x = up(x)
    x = cheb_conv(x, lap, p["w"])
    return act(x + p["b"].astype(x.dtype))


def conv1x1_init(key, fin: int, fout: int) -> dict:
    """K=1 'pointwise' graph conv; no bias (reference 1x1-conv scopes)."""
    return {"w": conv_weight(key, 1, fin, fout)}


def conv1x1_apply(p: dict, x, lap):
    return cheb_conv(x, lap, p["w"])


# ------------------------------------------------------------- encoder resid
def res_block_init(key, K: int, fin: int, fout: int) -> dict:
    keys = jax.random.split(key, 3)
    p = {
        "conv1": {"w": conv_weight(keys[0], K, fin, fout), "b": conv_bias(fout)},
        "conv2": {"w": conv_weight(keys[1], K, fout, fout), "b": conv_bias(fout)},
    }
    if fin != fout:
        p["proj"] = conv1x1_init(keys[2], fin, fout)
    return p


def res_block_apply(p: dict, x_in, lap, down, act):
    """conv->act->conv + projected skip -> act -> pool (lib/models.py:715-741)."""
    x = cheb_conv(x_in, lap, p["conv1"]["w"])
    x = act(x + p["conv1"]["b"].astype(x.dtype))
    x = cheb_conv(x, lap, p["conv2"]["w"])
    skip = conv1x1_apply(p["proj"], x_in, lap) if "proj" in p else x_in
    x = act(x + skip + p["conv2"]["b"].astype(x.dtype))
    return down(x)


# ---------------------------------------------------------- CMR decoder resid
def cmr_block_init(key, K: int, fin: int, fout: int) -> dict:
    keys = jax.random.split(key, 4)
    half = fout // 2
    p = {
        "gn0": {"gamma": jnp.ones((fin,)), "beta": jnp.zeros((fin,))},
        "lin1": conv1x1_init(keys[0], fin, half),
        "gn1": {"gamma": jnp.ones((half,)), "beta": jnp.zeros((half,))},
        "conv": {"w": conv_weight(keys[1], K, half, half)},
        "gn2": {"gamma": jnp.ones((half,)), "beta": jnp.zeros((half,))},
        "lin2": conv1x1_init(keys[2], half, fout),
    }
    if fin != fout:
        p["proj"] = conv1x1_init(keys[3], fin, fout)
    return p


def cmr_block_apply(p: dict, x_in, lap, up, n_valid: int | None = None):
    """unpool -> [GN->relu->1x1 -> GN->relu->cheb -> GN->relu->1x1] + skip
    (lib/models.py:744-774, GraphCMR 1905.03244).

    n_valid: natural vertex count when the vertex axis is padded
    (persistent-padded layout) — the group-norm statistics then run over
    valid rows only (ops.norm)."""
    xu = up(x_in)
    x = group_norm(xu, p["gn0"]["gamma"], p["gn0"]["beta"], n_valid=n_valid)
    x = jax.nn.relu(x)
    x = conv1x1_apply(p["lin1"], x, lap)
    x = group_norm(x, p["gn1"]["gamma"], p["gn1"]["beta"], n_valid=n_valid)
    x = jax.nn.relu(x)
    x = cheb_conv(x, lap, p["conv"]["w"])
    x = group_norm(x, p["gn2"]["gamma"], p["gn2"]["beta"], n_valid=n_valid)
    x = jax.nn.relu(x)
    x = conv1x1_apply(p["lin2"], x, lap)
    skip = conv1x1_apply(p["proj"], xu, lap) if "proj" in p else xu
    return x + skip


# -------------------------------------------------------- affine decoder resid
def affine_block_init(key, K: int, fin: int, fout: int) -> dict:
    """Note: outputs fout//2 channels, matching the reference
    (lib/models.py:784-790 convs to out_channels//2 and sums)."""
    keys = jax.random.split(key, 2)
    half = fout // 2
    return {
        "conv": {"w": conv_weight(keys[0], K, fin, half)},
        "affine": conv1x1_init(keys[1], fin, half),
    }


def affine_block_apply(p: dict, x_in, lap, up):
    """unpool -> [cheb->relu] + parallel 1x1 'affine' branch, summed."""
    x = up(x_in)
    gc = jax.nn.relu(cheb_conv(x, lap, p["conv"]["w"]))
    af = conv1x1_apply(p["affine"], x, lap)
    return gc + af


# ---------------------------------------------------- condition-folded forms
# Folded variants consume the conditions symbolically (ops.cheb
# cheb_conv_folded) instead of materializing the per-vertex broadcast
# concat; exact and parameter-compatible with the concat forms.

def conv_block_folded_apply(p: dict, x, conds, lap, down, act):
    """cnp on concat([x, conds...]) with folded condition channels."""
    x = cheb_conv_folded(x, conds, lap, p["w"])
    x = act(x + p["b"].astype(x.dtype))
    return down(x)


def deconv_block_folded_apply(p: dict, x, conds, lap, up, act):
    """udn whose input was concat([x, conds...]) *before* the unpool; the
    condition seed is commuted through the upsampling as u = U @ 1."""
    xu = up(x)
    seed = up(jnp.ones((x.shape[-2], 1), dtype=x.dtype))
    x = cheb_conv_folded(xu, conds, lap, p["w"], cond_seed=seed)
    return act(x + p["b"].astype(x.dtype))


def affine_block_folded_apply(p: dict, x, conds, lap, up):
    """affine res block with folded conditions (see deconv_block_folded)."""
    xu = up(x)
    seed = up(jnp.ones((x.shape[-2], 1), dtype=x.dtype))
    gc = jax.nn.relu(cheb_conv_folded(xu, conds, lap, p["conv"]["w"], cond_seed=seed))
    af = cheb_conv_folded(xu, conds, lap, p["affine"]["w"], cond_seed=seed)
    return gc + af


def deconv_block_fused_apply(p: dict, x, conds, up, lap_up, act):
    """udn with folded conditions and the unpool composed into the conv
    (ops.cheb.cheb_conv_up_folded): exact vs deconv_block_folded_apply,
    but the weight projections run at the coarse vertex count and the
    unpooled intermediate never materializes."""
    x = cheb_conv_up_folded(x, conds, up, lap_up, p["w"])
    return act(x + p["b"].astype(x.dtype))


def affine_block_fused_apply(p: dict, x, conds, up, lap_up):
    """affine res block with folded conditions AND the unpool composed into
    both branches: one coarse-level GEMM projects [conv W0 | affine Wa], a
    single U apply carries both branches' k=0 terms, and L~U (the
    precomposed banded product, GraphContext.lap_up) carries the conv's
    k=1 term. Exact vs affine_block_folded_apply."""
    wc = p["conv"]["w"].astype(x.dtype)       # [2, fin_total, half]
    wa = p["affine"]["w"].astype(x.dtype)     # [1, fin_total, half]
    fx = x.shape[-1]
    half = wc.shape[-1]
    w0a = jnp.concatenate([wc[0, :fx], wa[0, :fx]], axis=-1)   # [fx, 2*half]
    u = up(_project(x, w0a))                                    # [.., Vf, 2*half]
    l1 = lap_up(_project(x, wc[1, :fx]))
    gc_pre = u[..., :half] + l1
    af = u[..., half:]

    ones = jnp.ones((x.shape[-2], 1), dtype=x.dtype)
    shape = (1,) * (gc_pre.ndim - 2) + (gc_pre.shape[-2], 1)
    s0 = up(ones).reshape(shape)
    s1 = lap_up(ones).reshape(shape)
    off = fx
    for c in conds:
        dim = c.shape[-1]
        c = c.astype(x.dtype)
        gc_pre = gc_pre + s0 * (c @ wc[0, off : off + dim])[..., None, :]
        gc_pre = gc_pre + s1 * (c @ wc[1, off : off + dim])[..., None, :]
        af = af + s0 * (c @ wa[0, off : off + dim])[..., None, :]
        off += dim
    assert off == wc.shape[1], (off, wc.shape[1])
    return jax.nn.relu(gc_pre) + af


def res_block_folded_apply(p: dict, x_in, conds, lap, down, act):
    """encoder res block whose input is concat([x, conds...])."""
    x = cheb_conv_folded(x_in, conds, lap, p["conv1"]["w"])
    x = act(x + p["conv1"]["b"].astype(x.dtype))
    x = cheb_conv(x, lap, p["conv2"]["w"])
    if "proj" in p:
        skip = cheb_conv_folded(x_in, conds, lap, p["proj"]["w"])
    else:
        skip = concat_conditions(x_in, *conds)
    x = act(x + skip + p["conv2"]["b"].astype(x.dtype))
    return down(x)


def concat_conditions(x: jnp.ndarray, *conds: jnp.ndarray) -> jnp.ndarray:
    """Broadcast condition vectors [B, C] across vertices and concat on the
    channel axis (reference fit_cond_dim + concat, lib/models.py:813-832)."""
    B, V, _ = x.shape
    parts = [x]
    for c in conds:
        parts.append(jnp.broadcast_to(c[:, None, :], (B, V, c.shape[-1])).astype(x.dtype))
    return jnp.concatenate(parts, axis=-1)
