"""jit/pjit train and eval steps.

One compiled function per batch bucket covers the whole per-step pipeline:
device-side fbank → model forward → lattice losses → grads → NaN-guarded
optimizer update. The reference splits this across host-side torchaudio
features, the model, native losses, and a python loop with NaN checks
(run.py:79-120); here the NaN skip-batch guard is a branch-free masked update
(non-finite grads leave params and optimizer state untouched and are counted).

Sharding: `shardings` (from tpuasr.parallel.mesh) places the batch on the
`data` mesh axis and replicates params; XLA inserts the gradient psum over
ICI/DCN — the TPU-native replacement of DDP allreduce (SURVEY §2.8).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tpuasr.audio import fbank_batch
from tpuasr.config import Config


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar
    lr_scale: jnp.ndarray  # f32 scalar (plateau multiplier)
    skipped: jnp.ndarray  # int32 scalar: NaN-skipped batches

    @classmethod
    def create(cls, params, tx):
        return cls(
            params=params,
            opt_state=tx.init(params["params"]),
            step=jnp.zeros((), jnp.int32),
            lr_scale=jnp.ones((), jnp.float32),
            skipped=jnp.zeros((), jnp.int32),
        )


def _batch_forward(model, cfg: Config, variables, batch, rng, deterministic):
    """waves -> features -> [spec_augment] -> model loss dict."""
    feats, feat_lens = fbank_batch(batch["waves"], batch["wave_lens"], cfg.feature)
    dropout_rng, chunk_rng, sampler_rng, specaug_rng = jax.random.split(rng, 4)
    if not deterministic and cfg.specaug.enabled:
        from tpuasr.audio.specaug import spec_augment

        sa = cfg.specaug
        feats = spec_augment(
            specaug_rng, feats, feat_lens,
            num_t_masks=sa.num_t_masks, num_f_masks=sa.num_f_masks,
            max_t=sa.max_t, max_f=sa.max_f,
        )
    kwargs = dict(
        chunk_rng=chunk_rng,
        deterministic=deterministic,
    )
    if not deterministic:
        # the sampler stream feeds the paraformer glancing sampler; models
        # without that collection simply ignore the extra key
        out = model.apply(
            variables, feats, feat_lens, batch["texts"], batch["text_lens"],
            rngs={"dropout": dropout_rng, "sampler": sampler_rng}, **kwargs,
        )
    else:
        out = model.apply(
            variables, feats, feat_lens, batch["texts"], batch["text_lens"], **kwargs
        )
    return out


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    cfg: Config,
    donate: bool = True,
    remat: bool = False,
    state_shardings=None,
    donate_batch: bool = False,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    `state_shardings` (a TrainState-shaped pytree of NamedShardings from
    tpuasr.parallel.zero.train_state_shardings) pins the output state to the
    ZeRO layout, so sharded optimizer moments / params stay sharded across
    steps — the compiler inserts the all-gathers at their use sites
    (fsdp_utils.py:38-115 parity, SPMD-style)."""

    def loss_fn(params, variables_rest, batch, rng):
        variables = {"params": params, **variables_rest}

        def fwd(variables, batch, rng):
            return _batch_forward(model, cfg, variables, batch, rng, False)

        if remat:
            # rematerialization (reference gradient_checkpointing,
            # encoder.py:181-201): recompute the forward during backward
            fwd = jax.checkpoint(fwd)
        out = fwd(variables, batch, rng)
        return out["loss"], out

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        params = state.params["params"]
        rest = {k: v for k, v in state.params.items() if k != "params"}
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, rest, batch, rng
        )

        grad_norm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)

        if hasattr(tx, "update_guarded"):
            # fused path: the NaN skip-guard and plateau scale fold into each
            # leaf's single read-modify-write (saves a full select pass over
            # params + moments — 1.2 ms/step on the flagship config)
            new_params, new_opt_state = tx.update_guarded(
                grads, state.opt_state, params, finite,
                lr_scale=state.lr_scale, grad_norm=grad_norm,
            )
        else:
            updates, new_opt_state = tx.update(grads, state.opt_state, params)
            updates = jax.tree.map(lambda u: u * state.lr_scale, updates)
            new_params = optax.apply_updates(params, updates)

            # NaN guard: skip the whole update if anything is non-finite
            sel = lambda a, b: jax.tree.map(
                lambda x, y: jnp.where(finite, x, y), a, b
            )
            new_params = sel(new_params, params)
            new_opt_state = sel(new_opt_state, state.opt_state)

        new_state = state.replace(
            params={"params": new_params, **rest},
            opt_state=new_opt_state,
            step=state.step + 1,
            skipped=state.skipped + (1 - finite.astype(jnp.int32)),
        )
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "finite": finite,
            "audio_seconds": jnp.sum(batch["wave_lens"]) / cfg.feature.sample_rate,
        }
        for k in ("loss_rnnt", "loss_ctc", "loss_att", "th_accuracy"):
            if k in out:
                metrics[k] = out[k]
        return new_state, metrics

    jit_kwargs = {}
    if state_shardings is not None:
        jit_kwargs["in_shardings"] = (state_shardings, None, None)
        jit_kwargs["out_shardings"] = (state_shardings, None)
    # donate_batch: the loop device_puts a FRESH batch every step and never
    # touches it after the call, so its buffers are safe to donate (freed
    # for reuse as soon as the step consumes them). The tunnel client's
    # per-execute host-RSS leak is NOT affected — leak_probe measured it
    # immune to donation; see data.wire_dtype + train.max_rss_gb for the
    # actual mitigations. Callers that reuse a batch across steps must keep
    # this off.
    argnums = (0,) if donate else ()
    if donate_batch:
        argnums = argnums + (1,)
    return jax.jit(train_step, donate_argnums=argnums, **jit_kwargs)


def make_eval_step(model, cfg: Config) -> Callable:
    """Returns eval_step(params, batch, rng) -> loss dict (no update)."""

    def eval_step(variables, batch, rng):
        out = _batch_forward(model, cfg, variables, batch, rng, True)
        return {k: v for k, v in out.items()}

    return jax.jit(eval_step)
