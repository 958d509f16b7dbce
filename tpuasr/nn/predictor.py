"""LSTM predictor for RNN-T.

Parity: model/component/predictor.py:11-98 and wenet/transducer/predictor.py:60-210
(embedding → dropout → LSTM → linear projection; `forward_step` advances one
token with (h, c) carried state, and a padding mask freezes the state of
finished hypotheses — the ApplyPadding contract, predictor.py:185-210).

TPU design: the cuDNN LSTM becomes (1) one big input projection matmul over
the whole label sequence (MXU-friendly [B,U,E] x [E,4H]) + (2) a
`jax.lax.scan` over U for the recurrent half — train path; and (3) a fused
single-step cell for decode, vmappable over beams.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuasr.config import PredictorConfig


def _lstm_step(h, c, x_proj, wh, dtype):
    """One LSTM cell step. x_proj: [B, 4H] (input projection + bias already
    applied); wh: [H, 4H]. Gate order (i, f, g, o)."""
    gates = x_proj + jnp.dot(h, wh, preferred_element_type=dtype)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


class RNNPredictor(nn.Module):
    cfg: PredictorConfig
    vocab_size: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.embed = nn.Embed(self.vocab_size, c.embed_size, dtype=self.dtype, name="embed")
        self.wx = [
            nn.Dense(4 * c.hidden_size, dtype=self.dtype, name=f"wx_{l}")
            for l in range(c.num_layers)
        ]
        self.wh = [
            self.param(
                f"wh_{l}",
                nn.initializers.xavier_uniform(),
                (c.hidden_size, 4 * c.hidden_size),
            )
            for l in range(c.num_layers)
        ]
        self.projection = nn.Dense(c.output_size, dtype=self.dtype, name="projection")
        self.embed_dropout = nn.Dropout(c.embed_dropout)
        self.layer_dropout = nn.Dropout(c.dropout)

    def init_state(self, batch: int) -> tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        shape = (c.num_layers, batch, c.hidden_size)
        return jnp.zeros(shape, self.dtype), jnp.zeros(shape, self.dtype)

    def __call__(
        self,
        tokens: jnp.ndarray,  # [B, U] int32 (blank-prepended label sequence)
        state: Optional[tuple] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """[B, U] -> [B, U, output_size]."""
        c = self.cfg
        b, u = tokens.shape
        x = self.embed(tokens)
        x = self.embed_dropout(x, deterministic=deterministic)
        if state is None:
            state = self.init_state(b)
        hs, cs = state
        for l in range(c.num_layers):
            x_proj = self.wx[l](x)  # [B, U, 4H] — the big MXU matmul
            wh = self.wh[l].astype(x_proj.dtype)

            def step(carry, xp):
                h, cc = carry
                h, cc = _lstm_step(h, cc, xp, wh, x_proj.dtype)
                return (h, cc), h

            (_, _), out = jax.lax.scan(
                step, (hs[l], cs[l]), jnp.swapaxes(x_proj, 0, 1)
            )
            x = jnp.swapaxes(out, 0, 1)  # [B, U, H]
            if l < c.num_layers - 1 and c.dropout > 0:
                x = self.layer_dropout(x, deterministic=deterministic)
        return self.projection(x)

    def forward_step(
        self,
        tokens: jnp.ndarray,  # [B] int32
        state: tuple[jnp.ndarray, jnp.ndarray],  # ([L, B, H], [L, B, H])
        padding: Optional[jnp.ndarray] = None,  # [B] bool/int, 1 = frozen
    ):
        """One decode step -> ([B, output_size], new_state). Frozen rows keep
        their previous state (ApplyPadding parity)."""
        c = self.cfg
        x = self.embed(tokens)  # [B, E]
        hs, cs = state
        new_h, new_c = [], []
        for l in range(c.num_layers):
            x_proj = self.wx[l](x)
            h, cc = _lstm_step(hs[l], cs[l], x_proj, self.wh[l].astype(x_proj.dtype), x_proj.dtype)
            if padding is not None:
                keep = padding.astype(bool)[:, None]
                h = jnp.where(keep, hs[l], h)
                cc = jnp.where(keep, cs[l], cc)
            new_h.append(h)
            new_c.append(cc)
            x = h
        out = self.projection(x)
        return out, (jnp.stack(new_h), jnp.stack(new_c))
