"""Learning-rate schedules.

Reference policy (lib/models.py:419-445): optional linear warmup over
8 epochs, then staircase exponential decay
lr * decay_rate^floor((step - warmup_steps)/decay_steps). Without warmup
the decay starts from step 0.
"""

from __future__ import annotations

import jax.numpy as jnp

WARMUP_EPOCHS = 8  # reference warmup_duration (lib/models.py:419)


def cape_schedule(
    base_lr: float,
    decay_steps: int,
    decay_rate: float = 0.99,
    warmup_steps: int = 0,
):
    """Returns an optax-compatible schedule fn: step -> lr."""
    decay_steps = max(int(decay_steps), 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        decayed = base_lr * decay_rate ** jnp.floor(
            (step - warmup_steps) / decay_steps
        )
        if warmup_steps <= 0:
            return base_lr * decay_rate ** jnp.floor(step / decay_steps)
        warm = base_lr * step / warmup_steps
        return jnp.where(step < warmup_steps, warm, decayed)

    return schedule
