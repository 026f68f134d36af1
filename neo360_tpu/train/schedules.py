"""Learning-rate schedules.

`nerf_schedule`: warmup-sin delay multiplied by a log-space lerp from lr_init
to lr_final — parity with the reference's `optimizer_step`
(vanilla_nerf/model.py:409-437; neo360/model.py:988-1025; mipnerf360
model.py:599-627). Implemented as an optax-compatible schedule (callable
step -> lr) in jnp so it traces into the update step.
"""

from __future__ import annotations

import jax.numpy as jnp


def nerf_schedule(lr_init: float, lr_final: float, max_steps: int,
                  delay_steps: int = 2500, delay_mult: float = 0.01):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if delay_steps > 0:
            delay_rate = delay_mult + (1.0 - delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / delay_steps, 0.0, 1.0))
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        scaled = jnp.exp(jnp.log(lr_init) * (1.0 - t)
                         + jnp.log(lr_final) * t)
        return delay_rate * scaled
    return schedule
