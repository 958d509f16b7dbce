"""Learning-rate schedule family.

Parity: wenet/utils/scheduler.py (722 LoC of torch LambdaLR subclasses) as
plain optax-style ``step -> lr`` callables:

- `warmup_lr`        — WarmupLR (:26): Noam shape scaled to peak at
                       `warmup_steps`: lr * w^0.5 * min(s^-0.5, s * w^-1.5)
- `linear_warmup`    — the course scripts' warmup (run.py:42-45):
                       lr * min(1, s / warmup)
- `noam_annealing`   — NoamAnnealing (:563): d_model^-0.5 shape
- `warmup_policy`    — WarmupPolicy (:79): linear warmup, then hold at lr
- `warmup_hold`      — WarmupHoldPolicy (:203): warmup → hold → inverse-sqrt
- `cosine_annealing` — CosineAnnealing (:502) with warmup + min_lr floor
- `square_annealing` — SquareAnnealing (:449)
- `square_root_annealing` — SquareRootAnnealing (:476)
- `noam_hold_annealing`   — NoamHoldAnnealing (:629) with decay_rate

All return float-valued callables usable with optax.scale_by_schedule.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def linear_warmup(lr: float, warmup_steps: int) -> Schedule:
    def f(step):
        s = step + 1
        return lr * jnp.minimum(1.0, s / max(warmup_steps, 1))

    return f


def warmup_lr(lr: float, warmup_steps: int) -> Schedule:
    def f(step):
        s = jnp.maximum(step + 1, 1).astype(jnp.float32)
        w = float(warmup_steps)
        return lr * w**0.5 * jnp.minimum(s**-0.5, s * w**-1.5)

    return f


def noam_annealing(base_lr: float, warmup_steps: int, d_model: int) -> Schedule:
    norm = d_model**-0.5

    def f(step):
        s = jnp.maximum(step + 1, 1).astype(jnp.float32)
        w = float(warmup_steps)
        return base_lr * norm * jnp.minimum(s**-0.5, s * w**-1.5)

    return f


def warmup_policy(lr: float, warmup_steps: int) -> Schedule:
    def f(step):
        s = (step + 1).astype(jnp.float32) if hasattr(step, "astype") else float(step + 1)
        return lr * jnp.minimum(1.0, s / max(warmup_steps, 1))

    return f


def warmup_hold(lr: float, warmup_steps: int, hold_steps: int, min_lr: float = 0.0) -> Schedule:
    def f(step):
        s = jnp.asarray(step + 1, jnp.float32)
        warm = lr * jnp.minimum(1.0, s / max(warmup_steps, 1))
        after = lr * jnp.sqrt(max(warmup_steps + hold_steps, 1) / jnp.maximum(s, 1.0))
        out = jnp.where(s <= warmup_steps + hold_steps, warm, after)
        return jnp.maximum(out, min_lr)

    return f


def cosine_annealing(lr: float, warmup_steps: int, max_steps: int, min_lr: float = 0.0) -> Schedule:
    def f(step):
        s = jnp.asarray(step + 1, jnp.float32)
        warm = lr * s / max(warmup_steps, 1)
        frac = jnp.clip((s - warmup_steps) / max(max_steps - warmup_steps, 1), 0.0, 1.0)
        cos = min_lr + (lr - min_lr) * 0.5 * (1.0 + jnp.cos(math.pi * frac))
        return jnp.where(s <= warmup_steps, warm, cos)

    return f


def square_annealing(lr: float, warmup_steps: int, max_steps: int, min_lr: float = 0.0) -> Schedule:
    def f(step):
        s = jnp.asarray(step + 1, jnp.float32)
        warm = lr * s / max(warmup_steps, 1)
        frac = 1.0 - jnp.clip((s - warmup_steps) / max(max_steps - warmup_steps, 1), 0.0, 1.0)
        sq = min_lr + (lr - min_lr) * frac * frac
        return jnp.where(s <= warmup_steps, warm, sq)

    return f


def square_root_annealing(lr: float, warmup_steps: int, max_steps: int, min_lr: float = 0.0) -> Schedule:
    def f(step):
        s = jnp.asarray(step + 1, jnp.float32)
        warm = lr * s / max(warmup_steps, 1)
        frac = 1.0 - jnp.clip((s - warmup_steps) / max(max_steps - warmup_steps, 1), 0.0, 1.0)
        sq = min_lr + (lr - min_lr) * jnp.sqrt(frac)
        return jnp.where(s <= warmup_steps, warm, sq)

    return f


def noam_hold_annealing(
    lr: float, warmup_steps: int, hold_steps: int, decay_rate: float = 0.5,
    min_lr: float = 0.0,
) -> Schedule:
    def f(step):
        s = jnp.asarray(step + 1, jnp.float32)
        warm = lr * s / max(warmup_steps, 1)
        hold = jnp.asarray(lr, jnp.float32)
        anneal = lr * jnp.power(
            jnp.maximum(warmup_steps + hold_steps, 1) / jnp.maximum(s, 1.0), decay_rate
        )
        out = jnp.where(s <= warmup_steps, warm,
                        jnp.where(s <= warmup_steps + hold_steps, hold, anneal))
        return jnp.maximum(out, min_lr)

    return f


SCHEDULES = {
    "linear_warmup": linear_warmup,
    "warmuplr": warmup_lr,
    "noam": noam_annealing,
    "warmup_policy": warmup_policy,
    "warmup_hold": warmup_hold,
    "cosine_annealing": cosine_annealing,
    "square_annealing": square_annealing,
    "square_root_annealing": square_root_annealing,
    "noam_hold_annealing": noam_hold_annealing,
}


def get_schedule(name: str, **kwargs) -> Schedule:
    return SCHEDULES[name](**kwargs)
