"""CIF — continuous integrate-and-fire monotonic aligner.

Parity: wenet/paraformer/cif.py:24-292 (Cif predictor: depthwise conv +
sigmoid weight head, threshold-1.0 integrate-and-fire producing one acoustic
embedding per token, teacher-forced weight rescaling, tail-threshold firing
of trailing mass at inference, `cif_without_hidden` peak positions) and the
timestamp branch of wenet/paraformer/paraformer.py:36-103 (x3 conv-transpose
upsample + BLSTM + sigmoid weight head, quantity loss on tp_alphas).

TPU design: the reference fires in a python-ish loop over frames; here firing
is fully vectorized — with frame weights alpha_t <= 1, the weight cumsum
c = cumsum(alpha) assigns each frame to at most two adjacent tokens, so the
weighted split is two scatter-adds over token indices floor(c_{t-1}) and
floor(c_{t-1})+1. Peaks are cumsum floor-crossings (identical to the
reference's integrate/subtract loop while alpha <= threshold). No scan, no
dynamic shapes.
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


def cif_peaks(alpha: jnp.ndarray, threshold: float = 1.0) -> jnp.ndarray:
    """Fire positions [B, T] (1.0 where the integrator crosses threshold).

    Matches wenet/paraformer/cif.py::cif_without_hidden (integrate, fire,
    subtract threshold) for alpha <= threshold: a fire at frame t is a
    floor-crossing of cumsum(alpha)/threshold.
    """
    c = jnp.cumsum(alpha / threshold, axis=1)
    c_prev = jnp.pad(c, ((0, 0), (1, 0)))[:, : alpha.shape[1]]
    return (jnp.floor(c) > jnp.floor(c_prev)).astype(alpha.dtype)


class CifPredictor(nn.Module):
    """Weight head + fire. Training uses teacher-forced rescaling so exactly
    `target_lens` tokens fire; inference adds the tail-threshold frame so
    trailing integrator mass fires (wenet cif.py:110-146) and uses the
    predicted count round(sum alpha).

    Weight head order matches the reference exactly (cif.py:65-85): depthwise
    conv -> +residual -> dropout -> relu -> linear -> sigmoid ->
    relu(a * smooth_factor - noise_threshold) -> mask.
    """

    idim: int
    l_order: int = 1
    r_order: int = 1
    threshold: float = 1.0
    dropout_rate: float = 0.1
    smooth_factor: float = 1.0
    noise_threshold: float = 0.0
    tail_threshold: float = 0.45
    residual: bool = True
    cnn_groups: int = 0  # 0 = depthwise (reference default)

    @nn.compact
    def alpha(self, hidden: jnp.ndarray, mask: jnp.ndarray,
              deterministic: bool = True) -> jnp.ndarray:
        """[B, T, D], [B, T] -> frame weights [B, T] >= 0."""
        k = self.l_order + self.r_order + 1
        groups = self.idim if self.cnn_groups == 0 else self.cnn_groups
        y = nn.Conv(self.idim, (k,), padding=[(self.l_order, self.r_order)],
                    feature_group_count=groups, name="cif_conv")(hidden)
        if self.residual:
            y = y + hidden
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        y = nn.relu(y)
        a = nn.Dense(1, name="cif_output")(y)[..., 0]
        a = nn.relu(nn.sigmoid(a) * self.smooth_factor - self.noise_threshold)
        return jnp.where(mask, a, 0.0)

    def __call__(
        self,
        hidden: jnp.ndarray,  # [B, T, D]
        mask: jnp.ndarray,  # [B, T] True = valid
        max_tokens: int,
        target_lens=None,  # [B] teacher-forced token counts (training)
        deterministic: bool = True,
    ):
        """-> (embeds [B, max_tokens, D], pred_count [B] float, alpha)."""
        a = self.alpha(hidden, mask, deterministic)
        count = jnp.sum(a, axis=1)  # [B] predicted token count
        if target_lens is not None:
            scale = target_lens.astype(jnp.float32) / jnp.maximum(count, 1e-6)
            a_fire = a * scale[:, None]
            fire_hidden = hidden
        elif self.tail_threshold > 0.0:
            # append a zero frame; add tail_threshold weight at position len_b
            # so the trailing partial integral fires (cif.py:110-146)
            b, t, d = hidden.shape
            m = mask.astype(a.dtype)
            tail = jnp.concatenate([jnp.ones((b, 1), a.dtype), m], 1) - \
                jnp.concatenate([m, jnp.zeros((b, 1), a.dtype)], 1)
            a_fire = jnp.concatenate([a, jnp.zeros((b, 1), a.dtype)], 1) + \
                tail * self.tail_threshold
            fire_hidden = jnp.concatenate([hidden, jnp.zeros((b, 1, d), hidden.dtype)], 1)
            count = jnp.floor(jnp.sum(a_fire, axis=1))
        else:
            a_fire = a
            fire_hidden = hidden
        embeds = cif_fire(fire_hidden, a_fire, max_tokens, self.threshold)
        return embeds, count, a_fire


class TimestampPredictor(nn.Module):
    """Accurate-timestamp branch: x3 conv-transpose upsample -> BLSTM ->
    sigmoid weight head -> tp_alphas (wenet/paraformer/paraformer.py:59-103).

    The BLSTM is two `lax.scan` LSTM passes (forward + reversed) over the
    upsampled frames; the input projections are batched MXU matmuls.
    """

    idim: int
    upsample_times: int = 3
    smooth_factor2: float = 0.25
    noise_threshold2: float = 0.01

    def _lstm(self, x, name):
        """Unidirectional scan-LSTM [B, T, D] -> [B, T, D]."""
        h = self.idim
        x_proj = nn.Dense(4 * h, name=f"{name}_wx")(x)  # [B, T, 4H]
        wh = self.param(f"{name}_wh", nn.initializers.xavier_uniform(), (h, 4 * h))

        def step(carry, xp):
            hs, cs = carry
            gates = xp + jnp.dot(hs, wh)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
            c_new = f * cs + i * jnp.tanh(g)
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        b = x.shape[0]
        init = (jnp.zeros((b, h), x.dtype), jnp.zeros((b, h), x.dtype))
        _, out = jax.lax.scan(step, init, jnp.swapaxes(x_proj, 0, 1))
        return jnp.swapaxes(out, 0, 1)

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, mask: jnp.ndarray):
        """[B, T, D], [B, T] -> tp_alphas [B, T*upsample_times]."""
        up = nn.ConvTranspose(
            self.idim, (self.upsample_times,), strides=(self.upsample_times,),
            name="tp_upsample_cnn",
        )(hidden)
        fwd = self._lstm(up, "fwd")
        bwd = self._lstm(up[:, ::-1], "bwd")[:, ::-1]
        a = nn.Dense(1, name="tp_output")(jnp.concatenate([fwd, bwd], -1))[..., 0]
        a = nn.relu(nn.sigmoid(a) * self.smooth_factor2 - self.noise_threshold2)
        up_mask = jnp.repeat(mask, self.upsample_times, axis=1)
        return jnp.where(up_mask, a, 0.0)


def quantity_loss(pred_count: jnp.ndarray, target_lens: jnp.ndarray) -> jnp.ndarray:
    """Token-count L1 loss, summed and normalized by the total target count
    (wenet/paraformer/paraformer.py:188-196 parity)."""
    tgt = target_lens.astype(jnp.float32)
    return jnp.sum(jnp.abs(pred_count - tgt)) / jnp.maximum(jnp.sum(tgt), 1.0)
