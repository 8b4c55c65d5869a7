"""LR schedule: warmup + log-space exponential decay.

Spec: reference ``GSWarmUpExponentialDecayScheduler``
(``gs_lightning/scheduler.py:27-46``) — log-lerp lr_init->lr_final over
max_steps with an optional sin delay ramp. optax's
``warmup_exponential_decay_schedule`` is a different curve, so this is written
exactly. Pure function of the step — usable inside jit (the reference mutates
optimizer state via an LRScheduler object; here the step's lr is computed in
the compiled update)."""

from __future__ import annotations

import jax.numpy as jnp


def warmup_exp_decay_schedule(
    lr_init: float,
    lr_final: float,
    max_steps: int,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
):
    log_init = jnp.log(lr_init)
    log_final = jnp.log(lr_final)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(log_init * (1.0 - t) + log_final * t)
        return delay_rate * log_lerp

    return schedule


def constant_schedule(lr: float):
    def schedule(step):
        del step
        return jnp.asarray(lr, jnp.float32)

    return schedule
