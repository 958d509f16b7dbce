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
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from tpuasr.config import OptimConfig


def _optax_chain(cfg: OptimConfig) -> optax.GradientTransformation:
    def warmup_lr(step):
        return cfg.lr * jnp.minimum(1.0, (step + 1) / max(cfg.warmup_steps, 1))

    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_amsgrad(b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps)
        if cfg.amsgrad
        else optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps),
        optax.scale_by_schedule(lambda s: -warmup_lr(s)),
    )


class FusedAdamState(NamedTuple):
    """Adam state for `GuardedAdam` (count advances only on applied steps,
    like the reverted optax counts under the old post-hoc select)."""

    count: jnp.ndarray  # int32 scalar
    mu: Any
    nu: Any
    nu_max: Any  # amsgrad running max of bias-corrected nu; None w/o amsgrad


class GuardedAdam:
    """Adam(+amsgrad) with clip/warmup/weight-decay and the NaN skip-guard
    folded into each leaf's single read-modify-write expression.

    Numerically identical to `_optax_chain` followed by
    ``jnp.where(finite, new, old)`` over params and optimizer state — but
    that pattern costs a second full pass over ~4 parameter-sized trees
    (measured 1.2 ms/step of `select_n` on the flagship config, the largest
    single device-time item in the round-2 trace). Folding the guard into
    the update lets XLA emit one fused kernel per leaf: read g/mu/nu/p,
    write mu/nu/p. Duck-types the optax GradientTransformation `init`
    contract so `TrainState.create` works unchanged.
    """

    def __init__(self, cfg: OptimConfig):
        self.cfg = cfg

    def init(self, params) -> FusedAdamState:
        z = lambda p: jnp.zeros_like(p)
        return FusedAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(z, params),
            nu=jax.tree.map(z, params),
            nu_max=jax.tree.map(z, params) if self.cfg.amsgrad else None,
        )

    def update_guarded(
        self,
        grads,
        state: FusedAdamState,
        params,
        finite,  # bool scalar: apply the step (False leaves everything as-is)
        lr_scale=1.0,  # plateau multiplier
        grad_norm: Optional[jnp.ndarray] = None,  # reuse caller's global norm
    ):
        """-> (new_params, new_state)."""
        c = self.cfg
        b1, b2 = c.betas
        if grad_norm is None:
            grad_norm = optax.global_norm(grads)
        # optax.clip_by_global_norm semantics AND fp ordering: (g / gn) * c
        clip_on = grad_norm >= c.grad_clip
        count_inc = state.count + finite.astype(jnp.int32)
        t = (state.count + 1).astype(jnp.float32)  # bias-correction step
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - b2 ** t
        # scale_by_schedule uses the pre-increment count (optax parity)
        warm = c.lr * jnp.minimum(
            1.0, (state.count.astype(jnp.float32) + 1) / max(c.warmup_steps, 1)
        )
        wd = c.weight_decay

        def _u(g, p):
            # clip -> L2-into-gradient decay, optax op-for-op
            g = jnp.where(clip_on, (g / grad_norm) * c.grad_clip, g)
            return g + wd * p

        if c.amsgrad:
            def leaf(g, m, v, vmax, p):
                u = _u(g, p)
                m2 = jnp.where(finite, b1 * m + (1 - b1) * u, m)
                v2 = jnp.where(finite, b2 * v + (1 - b2) * u * u, v)
                vmax2 = jnp.where(finite, jnp.maximum(vmax, v2 / bc2), vmax)
                upd = ((m2 / bc1) / (jnp.sqrt(vmax2) + c.eps)) * -warm
                p2 = jnp.where(finite, p + upd * lr_scale, p)
                return m2, v2, vmax2, p2

            out = jax.tree.map(leaf, grads, state.mu, state.nu, state.nu_max, params)
            pick = lambda i: jax.tree.map(
                lambda tup: tup[i], out, is_leaf=lambda x: isinstance(x, tuple)
            )
            new_state = FusedAdamState(count_inc, pick(0), pick(1), pick(2))
            return pick(3), new_state

        def leaf(g, m, v, p):
            u = _u(g, p)
            m2 = jnp.where(finite, b1 * m + (1 - b1) * u, m)
            v2 = jnp.where(finite, b2 * v + (1 - b2) * u * u, v)
            upd = ((m2 / bc1) / (jnp.sqrt(v2 / bc2) + c.eps)) * -warm
            p2 = jnp.where(finite, p + upd * lr_scale, p)
            return m2, v2, p2

        out = jax.tree.map(leaf, grads, state.mu, state.nu, params)
        pick = lambda i: jax.tree.map(
            lambda tup: tup[i], out, is_leaf=lambda x: isinstance(x, tuple)
        )
        return pick(2), FusedAdamState(count_inc, pick(0), pick(1), None)


def make_optimizer(cfg: OptimConfig):
    if cfg.accum_steps > 1:
        # gradient accumulation (reference accum_steps, rnnt_common.py:11 +
        # the no_sync fencing of executor.py:71-81 — under SPMD the psum
        # simply happens once per optimizer update). MultiSteps needs the
        # plain optax chain; the train step falls back to the post-update
        # select guard there.
        return optax.MultiSteps(_optax_chain(cfg), every_k_schedule=cfg.accum_steps)
    return GuardedAdam(cfg)


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
