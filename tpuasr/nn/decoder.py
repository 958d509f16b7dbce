"""Transformer attention decoder (for hybrid CTC/AED models and rescoring).

Parity: wenet/transformer/decoder.py:32-310 (pre-norm self-attn + cross-attn
+ FFN stack over embedded targets, causal + padding masks) and
wenet/transformer/label_smoothing_loss.py:21-105. Round-1 scope: the
teacher-forced forward — which is what joint CTC+AED training and
attention-rescoring of CTC n-best need (wenet/transformer/search.py:369-453);
incremental `forward_one_step` AR beam decoding is a later-round addition.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuasr.nn.embedding import PositionalEncodingTable
from tpuasr.nn.masks import make_pad_mask, subsequent_mask

_NEG = -1.0e9


class _CrossAttention(nn.Module):
    n_head: int
    n_feat: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in, mask):
        h = self.n_head
        dk = self.n_feat // h
        b, tq, _ = q_in.shape
        tk = kv_in.shape[1]
        q = nn.Dense(self.n_feat, dtype=self.dtype, name="linear_q")(q_in).reshape(b, tq, h, dk)
        k = nn.Dense(self.n_feat, dtype=self.dtype, name="linear_k")(kv_in).reshape(b, tk, h, dk)
        v = nn.Dense(self.n_feat, dtype=self.dtype, name="linear_v")(kv_in).reshape(b, tk, h, dk)
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(jnp.asarray(dk, q.dtype))
        if mask is not None:
            scores = jnp.where(mask[:, None], scores, jnp.asarray(_NEG, scores.dtype))
        attn = nn.softmax(scores, axis=-1)
        if mask is not None:
            attn = jnp.where(mask[:, None], attn, 0)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, tq, h * dk)
        return nn.Dense(self.n_feat, dtype=self.dtype, name="linear_out")(out)


class DecoderLayer(nn.Module):
    n_head: int
    n_feat: int
    ffn_dim: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, self_mask, memory, memory_mask, deterministic=True):
        drop = lambda y: nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = _CrossAttention(self.n_head, self.n_feat, self.dtype, name="self_attn")(
            y, y, self_mask
        )
        x = x + drop(y)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = _CrossAttention(self.n_head, self.n_feat, self.dtype, name="src_attn")(
            y, memory, memory_mask
        )
        x = x + drop(y)
        y = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.n_feat, dtype=self.dtype, name="ffn2")(drop(y))
        return x + drop(y)


class TransformerDecoder(nn.Module):
    vocab_size: int
    n_feat: int = 256
    n_head: int = 4
    ffn_dim: int = 1024
    num_blocks: int = 6
    dropout_rate: float = 0.1
    max_len: int = 5000
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.n_feat, dtype=self.dtype, name="embed")
        self.pe = PositionalEncodingTable(self.n_feat, self.max_len)
        self.layers = [
            DecoderLayer(self.n_head, self.n_feat, self.ffn_dim, self.dropout_rate,
                         self.dtype, name=f"layer{i}")
            for i in range(self.num_blocks)
        ]
        self.after_norm = nn.LayerNorm(dtype=self.dtype, name="after_norm")
        self.output_layer = nn.Dense(self.vocab_size, dtype=self.dtype, name="output_layer")
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(
        self,
        memory: jnp.ndarray,  # [B, T, D] encoder output
        memory_lens: jnp.ndarray,  # [B]
        ys_in: jnp.ndarray,  # [B, L] target ids with <sos> prepended
        ys_lens: jnp.ndarray,  # [B] lengths of ys_in
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Teacher-forced forward -> logits [B, L, V]."""
        b, l = ys_in.shape
        x, _ = self.pe.add_abs(self.embed(ys_in), 0)
        x = self.dropout(x, deterministic=deterministic)
        tgt_pad = ~make_pad_mask(ys_lens, l)  # [B, L] True=valid
        self_mask = tgt_pad[:, None, :] & subsequent_mask(l)[None]  # [B, L, L]
        mem_mask = ~make_pad_mask(memory_lens, memory.shape[1])[:, None, :]  # [B,1,T]
        for layer in self.layers:
            x = layer(x, self_mask, memory, mem_mask, deterministic)
        return self.output_layer(self.after_norm(x))


def label_smoothing_loss(
    logits: jnp.ndarray,  # [B, L, V]
    targets: jnp.ndarray,  # [B, L]
    lengths: jnp.ndarray,  # [B] valid target lengths
    smoothing: float = 0.1,
    normalize_length: bool = False,
) -> jnp.ndarray:
    """KLDiv label-smoothing loss with padding masking
    (wenet/transformer/label_smoothing_loss.py parity: normalized by batch
    by default, by token count if normalize_length)."""
    b, l, v = logits.shape
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    conf = 1.0 - smoothing
    low = smoothing / (v - 1)
    true_lp = jnp.take_along_axis(lp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    # KL(dist || p) = -(conf*lp[target] + low*sum_other lp) + H(dist) constant
    # (the entropy constant is included for value parity with torch KLDivLoss)
    import numpy as _np

    entropy = -(conf * _np.log(max(conf, 1e-12)) + (v - 1) * low * _np.log(max(low, 1e-12)))
    kl = -(conf * true_lp + low * (jnp.sum(lp, axis=-1) - true_lp)) - entropy
    mask = jnp.arange(l)[None, :] < lengths[:, None]
    total = jnp.sum(jnp.where(mask, kl, 0.0))
    denom = jnp.sum(lengths) if normalize_length else b
    return total / denom
