"""Optimizers and train state.

Reference policy (lib/models.py:419-474): separate G and D optimizers
(SGD+momentum 0.9 or Adam), lr_d = lr_g * lr_scaler, shared schedule,
gradient clipping by global norm 5.0. G's variable set is the generator
plus the condition nets (gated by optim_condnet); D's is the
discriminator. The reference's D-side clipping bug (it clips *variables*)
is fixed to the intent: clip gradients (SURVEY quirk #1).

Implemented as one optax.multi_transform over a partitioned param tree, so
a single (params, opt_state) pair drives both players.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from cape_tpu.core.config import CAPEConfig
from cape_tpu.train.schedules import WARMUP_EPOCHS, cape_schedule

GRAD_CLIP_NORM = 5.0  # reference: lib/models.py:461


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def param_labels(params: dict, optim_condnet: bool = True) -> dict:
    """Label each top-level param group as 'g' or 'd' (condition nets train
    with G per lib/models.py:455-458; 'frozen' when optim_condnet=0)."""
    labels = {}
    for k in params:
        if k == "discriminator":
            labels[k] = "d"
        elif k in ("cond_pose", "cond_clo"):
            labels[k] = "g" if optim_condnet else "frozen"
        else:
            labels[k] = "g"
    return {
        k: jax.tree_util.tree_map(lambda _: v, params[k]) for k, v in labels.items()
    }


def _player_optimizer(opt_name: str, schedule, momentum: float, state_dtype=None):
    """state_dtype=bfloat16 keeps the momentum buffer (sgd accumulator /
    adam mu; optax keeps adam's nu f32) in bf16 — halves that buffer's
    per-step HBM read+write. Updates are still computed and applied in
    f32 (optax casts the accumulator into the update dtype), so only the
    stored first-moment precision changes."""
    if opt_name == "adam":
        base = optax.adam(learning_rate=schedule, mu_dtype=state_dtype)
    else:
        base = optax.sgd(
            learning_rate=schedule, momentum=momentum, accumulator_dtype=state_dtype
        )
    return optax.chain(optax.clip_by_global_norm(GRAD_CLIP_NORM), base)


def build_optimizer(cfg: CAPEConfig, steps_per_epoch: int):
    """The combined G/D optimizer and the two lr schedules (for logging)."""
    decay_steps = max(int(cfg.decay_every * steps_per_epoch), 1)
    warmup_steps = int(WARMUP_EPOCHS * decay_steps) if cfg.lr_warmup else 0
    sched_g = cape_schedule(cfg.lr, decay_steps, cfg.decay_rate, warmup_steps)
    sched_d = cape_schedule(
        cfg.lr * cfg.lr_scaler, decay_steps, cfg.decay_rate, warmup_steps
    )
    if cfg.opt_state_dtype in ("float32", ""):
        state_dtype = None
    elif cfg.opt_state_dtype == "bfloat16":
        state_dtype = jnp.bfloat16
    else:
        raise ValueError(
            f"opt_state_dtype must be float32|bfloat16, got {cfg.opt_state_dtype!r}"
        )
    tx = optax.multi_transform(
        {
            "g": _player_optimizer(cfg.optimizer, sched_g, cfg.momentum, state_dtype),
            "d": _player_optimizer(cfg.optimizer, sched_d, cfg.momentum, state_dtype),
            "frozen": optax.set_to_zero(),
        },
        param_labels=lambda params: param_labels(params, cfg.optim_condnet),
    )
    return tx, sched_g, sched_d


def create_train_state(params: dict, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )
