"""CIF — continuous integrate-and-fire monotonic aligner.

Parity: wenet/paraformer/cif.py:24-292 (Cif predictor: conv + sigmoid weight
head, threshold-1.0 integrate-and-fire producing one acoustic embedding per
token, teacher-forced weight rescaling, MAE token-count loss).

TPU design: the reference fires in a python-ish loop over frames; here firing
is fully vectorized — with frame weights alpha_t <= 1, the weight cumsum
c = cumsum(alpha) assigns each frame to at most two adjacent tokens, so the
weighted split is two scatter-adds over token indices floor(c_{t-1}) and
floor(c_{t-1})+1. No scan, no dynamic shapes.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def cif_fire(
    hidden: jnp.ndarray,  # [B, T, D] encoder frames
    alpha: jnp.ndarray,  # [B, T] weights in [0, 1] (already length-masked)
    max_tokens: int,
    threshold: float = 1.0,
) -> jnp.ndarray:
    """-> acoustic embeddings [B, max_tokens, D].

    Token k receives sum_t w(t, k) * hidden[t] where w splits each frame's
    alpha across the token boundaries its cumsum span crosses.
    """
    b, t, d = hidden.shape
    alpha = alpha / threshold
    c = jnp.cumsum(alpha, axis=1)  # [B, T]
    c_prev = jnp.pad(c, ((0, 0), (1, 0)))[:, :t]
    k_lo = jnp.floor(c_prev).astype(jnp.int32)  # token the frame starts in
    boundary = (k_lo + 1).astype(jnp.float32)
    w_lo = jnp.clip(jnp.minimum(c, boundary) - c_prev, 0.0, None)  # to token k_lo
    w_hi = jnp.clip(c - boundary, 0.0, None)  # to token k_lo + 1

    k_lo_c = jnp.minimum(k_lo, max_tokens)  # overflow bucket = max_tokens
    k_hi_c = jnp.minimum(k_lo + 1, max_tokens)
    out = jnp.zeros((b, max_tokens + 1, d), hidden.dtype)
    bidx = jnp.arange(b)[:, None].repeat(t, 1)
    out = out.at[bidx, k_lo_c].add(w_lo[..., None] * hidden)
    out = out.at[bidx, k_hi_c].add(w_hi[..., None] * hidden)
    return out[:, :max_tokens]


class CifPredictor(nn.Module):
    """Weight head + fire. Training uses teacher-forced rescaling so exactly
    `target_lens` tokens fire; inference uses raw weights with the predicted
    count round(sum alpha)."""

    idim: int
    l_order: int = 1
    r_order: int = 1
    threshold: float = 1.0
    smooth_factor: float = 1.0
    noise_threshold: float = 0.0

    @nn.compact
    def alpha(self, hidden: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """[B, T, D], [B, T] -> frame weights [B, T] in [0, 1]."""
        k = self.l_order + self.r_order + 1
        y = nn.Conv(self.idim, (k,), padding=[(self.l_order, self.r_order)],
                    name="cif_conv")(hidden)
        y = nn.relu(y)
        a = nn.Dense(1, name="cif_output")(y)[..., 0]
        a = nn.sigmoid(a) * self.smooth_factor
        a = jnp.where(a >= self.noise_threshold, a, 0.0)
        return jnp.where(mask, a, 0.0)

    def __call__(
        self,
        hidden: jnp.ndarray,  # [B, T, D]
        mask: jnp.ndarray,  # [B, T] True = valid
        max_tokens: int,
        target_lens=None,  # [B] teacher-forced token counts (training)
    ):
        """-> (embeds [B, max_tokens, D], pred_count [B] float, alpha)."""
        a = self.alpha(hidden, mask)
        count = jnp.sum(a, axis=1)  # [B] predicted token count
        if target_lens is not None:
            scale = target_lens.astype(jnp.float32) / jnp.maximum(count, 1e-6)
            a_fire = a * scale[:, None]
        else:
            a_fire = a
        embeds = cif_fire(hidden, a_fire, max_tokens, self.threshold)
        return embeds, count, a


def quantity_loss(pred_count: jnp.ndarray, target_lens: jnp.ndarray) -> jnp.ndarray:
    """MAE token-count loss (wenet cif.py MAELoss parity)."""
    return jnp.mean(jnp.abs(pred_count - target_lens.astype(jnp.float32)))
