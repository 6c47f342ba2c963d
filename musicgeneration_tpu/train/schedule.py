"""LR schedules. Noam/transformer warmup (reference criterion.py:70-96):
lr(step) = d_model^-0.5 * min(step^-0.5, step * warmup^-1.5)."""

from __future__ import annotations

import jax.numpy as jnp


def noam_schedule(d_model: int, warmup_steps: int = 4000):
    scale = d_model ** -0.5

    def schedule(step):
        step = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        return scale * jnp.minimum(step ** -0.5,
                                   step * warmup_steps ** -1.5)

    return schedule
