"""Optimizer and schedules.

Parity with the reference training protocol (run.py:29-45, 110-113,
rnnt_train.py:44-56, rnnt_common.py:7-21):

- Adam(lr 1e-4, betas (0.9, 0.98), eps 1e-8, weight_decay 1e-4, amsgrad) —
  torch Adam's weight_decay is L2-into-gradient (not decoupled), so decay is
  added *before* the moment updates;
- linear warmup over 4000 steps scaling the base lr;
- gradient clipping at 1.0 applied to raw gradients (before decay);
- ReduceLROnPlateau(factor 0.5, patience 2) on the per-epoch test loss — the
  plateau scale lives on host (`PlateauTracker`) and enters the jitted step as
  a scalar multiplier, so no recompilation on decay.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import optax

from tpuasr.config import OptimConfig


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    def warmup_lr(step):
        return cfg.lr * jnp.minimum(1.0, (step + 1) / max(cfg.warmup_steps, 1))

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_amsgrad(b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps)
        if cfg.amsgrad
        else optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps),
        optax.scale_by_schedule(lambda s: -warmup_lr(s)),
    )
    if cfg.accum_steps > 1:
        # gradient accumulation (reference accum_steps, rnnt_common.py:11 +
        # the no_sync fencing of executor.py:71-81 — under SPMD the psum
        # simply happens once per optimizer update)
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx


@dataclass
class PlateauTracker:
    """Host-side ReduceLROnPlateau state (torch semantics: decay when the
    monitored loss fails to improve for `patience` evaluations)."""

    factor: float = 0.5
    patience: int = 2
    min_scale: float = 1e-3
    best: float = float("inf")
    bad_epochs: int = 0
    scale: float = 1.0

    def update(self, loss: float) -> float:
        if loss < self.best - 1e-8:
            self.best = loss
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.bad_epochs = 0
        return self.scale
