"""LR schedules as optax-compatible callables.

cosine_warm_restarts reproduces the reference's vendored
CosineAnnealingWarmRestarts stepped once per *epoch*
(/root/reference/Experiments/utils.py:668-784; instantiated with
T_0=10, T_mult=1, eta_min=1e-5 at train_model.py:738, stepped at
Train_one_epoch.py:187-188).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def cosine_warm_restarts(
    base_lr: float,
    t_0: int = 10,
    t_mult: int = 1,
    eta_min: float = 1e-5,
    steps_per_epoch: int = 1,
):
    """Returns schedule(step) -> lr. `steps_per_epoch` converts optimizer
    steps to the reference's epoch-granular schedule."""

    def schedule(step):
        epoch = jnp.asarray(step) // steps_per_epoch
        if t_mult == 1:
            t_cur = epoch % t_0
            t_i = t_0
            frac = t_cur / t_i
        else:
            # epoch n lies in cycle k where sum_{i<k} T_0*t_mult^i <= n
            e = jnp.asarray(epoch, jnp.float32)
            k = jnp.floor(
                jnp.log(e * (t_mult - 1) / t_0 + 1) / math.log(t_mult)
            )
            start = t_0 * (t_mult ** k - 1) / (t_mult - 1)
            t_i = t_0 * t_mult ** k
            frac = (e - start) / t_i
        return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * frac)) / 2

    return schedule


def constant(base_lr: float):
    return lambda step: jnp.asarray(base_lr, jnp.float32)
