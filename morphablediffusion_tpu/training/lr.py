"""LR schedule: LambdaLinearScheduler parity.

Reference: ldm/lr_scheduler.py:81-97 with the shipped params
(configs/facescape.yaml:17-24: warm_up 100, cycle 100000, f_start 0.02,
f_max=f_min=1.0): linear warmup from 0.02x to 1.0x over 100 steps, then
linear from f_max to f_min over the cycle (constant 1.0 with the shipped
f_min). No LR scaling by world size (train_morphable_diffusion.py:317).
"""

from __future__ import annotations

import jax.numpy as jnp


def lambda_linear_schedule(
    base_lr: float,
    warm_up_steps: int = 100,
    cycle_length: int = 100000,
    f_start: float = 0.02,
    f_max: float = 1.0,
    f_min: float = 1.0,
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = f_start + (f_max - f_start) / warm_up_steps * step
        lin = f_min + (f_max - f_min) * (cycle_length - step) / cycle_length
        f = jnp.where(step < warm_up_steps, warm, lin)
        return base_lr * f

    return schedule
