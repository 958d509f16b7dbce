"""SpecAugment: time/frequency masking over fbank features, jit-native.

The reference's vendored dataset pipeline (wenet.dataset, absent from the
snapshot — SURVEY §0) applies spec_aug in the loader; here it is a pure
function applied on device inside the train step, parameterized per the
standard policy (2 freq masks x F=10, 2 time masks x T=50)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spec_augment(
    rng: jax.Array,
    feats: jnp.ndarray,  # [B, T, F]
    feat_lens: jnp.ndarray,  # [B]
    num_t_masks: int = 2,
    num_f_masks: int = 2,
    max_t: int = 50,
    max_f: int = 10,
) -> jnp.ndarray:
    """Mask random time/frequency stripes with zeros (post-CMVN convention)."""
    b, t, f = feats.shape
    mask = jnp.ones((b, t, f), bool)
    keys = jax.random.split(rng, 2 * (num_t_masks + num_f_masks))
    ki = 0
    t_idx = jnp.arange(t)[None, :]
    f_idx = jnp.arange(f)[None, :]
    for _ in range(num_t_masks):
        start = jax.random.randint(keys[ki], (b,), 0, jnp.maximum(t, 1))
        width = jax.random.randint(keys[ki + 1], (b,), 0, max_t + 1)
        ki += 2
        # clamp inside the valid region so padding stats are unaffected
        start = jnp.minimum(start, jnp.maximum(feat_lens - 1, 0))
        stripe = (t_idx >= start[:, None]) & (t_idx < (start + width)[:, None])
        mask = mask & ~stripe[:, :, None]
    for _ in range(num_f_masks):
        start = jax.random.randint(keys[ki], (b,), 0, f)
        width = jax.random.randint(keys[ki + 1], (b,), 0, max_f + 1)
        ki += 2
        stripe = (f_idx >= start[:, None]) & (f_idx < (start + width)[:, None])
        mask = mask & ~stripe[:, None, :]
    return jnp.where(mask, feats, 0.0)
