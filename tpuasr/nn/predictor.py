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

    # decode-state convention: which axis of each state leaf is the batch axis
    state_batch_axis = 1  # ([L, B, H], [L, B, H])

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


class EmbeddingPredictor(nn.Module):
    """Stateless N-gram predictor: multi-head positional attention over the
    last `history_size + 1` token embeddings (arXiv:2109.07513; wenet
    predictor.py:213-380 parity). State = the trailing history embeddings
    [B, history_size, E]."""

    cfg: PredictorConfig
    vocab_size: int
    dtype: jnp.dtype = jnp.float32

    state_batch_axis = 0  # ([B, history, E],)

    def setup(self):
        c = self.cfg
        assert c.output_size == c.embed_size, "embedding predictor: output==embed"
        self.context_size = c.history_size + 1
        self.embed = nn.Embed(self.vocab_size, c.embed_size, dtype=self.dtype, name="embed")
        # wenet stores the positional attention as a Linear(embed*ctx, n_head)
        # weight reshaped to [n_head, embed, ctx]; keep the raw param here.
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.lecun_normal(),
            (c.n_head, c.embed_size, self.context_size),
        )
        self.ffn = nn.Dense(c.embed_size, dtype=self.dtype, name="ffn")
        self.norm = nn.LayerNorm(dtype=self.dtype, name="norm")
        self.embed_dropout = nn.Dropout(c.embed_dropout)

    def init_state(self, batch: int):
        c = self.cfg
        return (jnp.zeros((batch, c.history_size, c.embed_size), self.dtype),)

    def _attend(self, windows: jnp.ndarray) -> jnp.ndarray:
        """windows [..., ctx, E] -> [..., E] via the multi-head pos attention."""
        c = self.cfg
        pos = self.pos_embed.astype(windows.dtype)  # [H, E, ctx]
        # weight[..., h, ctx] = sum_e windows[..., ctx, e] * pos[h, e, ctx]
        weight = jnp.einsum("...ce,hec->...hc", windows, pos)
        out = jnp.einsum("...hc,...ce->...he", weight, windows)
        out = jnp.sum(out, axis=-2) / (c.n_head * self.context_size)
        out = self.norm(self.ffn(out))
        return out * nn.sigmoid(out) if c.activation == "swish" else nn.relu(out)

    def __call__(self, tokens, state=None, deterministic: bool = True):
        b, u = tokens.shape
        x = self.embed_dropout(self.embed(tokens), deterministic=deterministic)
        hist = state[0] if state is not None else self.init_state(b)[0]
        x = jnp.concatenate([hist.astype(x.dtype), x], axis=1)  # [B, hist+U, E]
        idx = jnp.arange(u)[:, None] + jnp.arange(self.context_size)[None, :]
        windows = jnp.take(x, idx, axis=1)  # [B, U, ctx, E]
        return self._attend(windows)

    def forward_step(self, tokens, state, padding=None):
        x = self.embed(tokens)[:, None, :]  # [B, 1, E]
        ctx = jnp.concatenate([state[0].astype(x.dtype), x], axis=1)  # [B, ctx, E]
        out = self._attend(ctx)  # [B, E]
        new_hist = ctx[:, 1:, :]
        if padding is not None:
            keep = padding.astype(bool)[:, None, None]
            new_hist = jnp.where(keep, state[0], new_hist)
        return out, (new_hist,)


class ConvPredictor(nn.Module):
    """Causal depthwise-conv predictor over the token-embedding history
    (wenet predictor.py:383-499 parity)."""

    cfg: PredictorConfig
    vocab_size: int
    dtype: jnp.dtype = jnp.float32

    state_batch_axis = 0  # ([B, history, E],)

    def setup(self):
        c = self.cfg
        assert c.output_size == c.embed_size
        self.context_size = c.history_size + 1
        self.embed = nn.Embed(self.vocab_size, c.embed_size, dtype=self.dtype, name="embed")
        self.conv = nn.Conv(
            features=c.embed_size, kernel_size=(self.context_size,),
            feature_group_count=c.embed_size, padding="VALID", use_bias=False,
            dtype=self.dtype, name="conv",
        )
        self.norm = nn.LayerNorm(dtype=self.dtype, name="norm")
        self.embed_dropout = nn.Dropout(c.embed_dropout)

    def init_state(self, batch: int):
        c = self.cfg
        return (jnp.zeros((batch, c.history_size, c.embed_size), self.dtype),)

    def _act(self, y):
        return y * nn.sigmoid(y) if self.cfg.activation == "swish" else nn.relu(y)

    def __call__(self, tokens, state=None, deterministic: bool = True):
        b, u = tokens.shape
        x = self.embed_dropout(self.embed(tokens), deterministic=deterministic)
        hist = state[0] if state is not None else self.init_state(b)[0]
        x = jnp.concatenate([hist.astype(x.dtype), x], axis=1)
        y = self.conv(x)  # [B, U, E] (VALID over hist+U)
        return self._act(self.norm(y))

    def forward_step(self, tokens, state, padding=None):
        x = self.embed(tokens)[:, None, :]
        ctx = jnp.concatenate([state[0].astype(x.dtype), x], axis=1)  # [B, ctx, E]
        y = self.conv(ctx)[:, 0, :]  # [B, E]
        out = self._act(self.norm(y))
        new_hist = ctx[:, 1:, :]
        if padding is not None:
            keep = padding.astype(bool)[:, None, None]
            new_hist = jnp.where(keep, state[0], new_hist)
        return out, (new_hist,)


PREDICTOR_CLASSES = {
    "rnn": RNNPredictor,
    "embedding": EmbeddingPredictor,
    "conv": ConvPredictor,
}
