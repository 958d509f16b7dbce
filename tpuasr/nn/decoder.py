"""Transformer attention decoder (for hybrid CTC/AED models, rescoring, and
autoregressive beam decoding).

Parity: wenet/transformer/decoder.py:32-310 (pre-norm self-attn + cross-attn
+ FFN stack over embedded targets, causal + padding masks; `forward_one_step`
incremental decoding with per-layer KV caches, decoder.py:225-310) and
wenet/transformer/label_smoothing_loss.py:21-105.

TPU design for AR decoding: self-attention caches are preallocated
[B, Lmax, H, dk] buffers written at the step index (static shapes, one
compile); cross-attention K/V are projected once per utterance and reused
every step.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuasr.nn.embedding import PositionalEncodingTable
from tpuasr.nn.masks import make_pad_mask, subsequent_mask

_NEG = -1.0e9


class _Attention(nn.Module):
    """Generic projected attention with separate q/kv entry points so AR
    decoding can cache projected K/V."""

    n_head: int
    n_feat: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.d_k = self.n_feat // self.n_head
        self.linear_q = nn.Dense(self.n_feat, dtype=self.dtype, name="linear_q")
        self.linear_k = nn.Dense(self.n_feat, dtype=self.dtype, name="linear_k")
        self.linear_v = nn.Dense(self.n_feat, dtype=self.dtype, name="linear_v")
        self.linear_out = nn.Dense(self.n_feat, dtype=self.dtype, name="linear_out")

    def project_q(self, q_in):
        b = q_in.shape[0]
        return self.linear_q(q_in).reshape(b, -1, self.n_head, self.d_k)

    def project_kv(self, kv_in):
        b = kv_in.shape[0]
        k = self.linear_k(kv_in).reshape(b, -1, self.n_head, self.d_k)
        v = self.linear_v(kv_in).reshape(b, -1, self.n_head, self.d_k)
        return k, v

    def attend(self, q, k, v, mask):
        """q [B,Tq,H,dk], k/v [B,Tk,H,dk], mask [B,Tq|1,Tk] -> [B,Tq,D]."""
        b, tq = q.shape[0], q.shape[1]
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(
            jnp.asarray(self.d_k, q.dtype)
        )
        if mask is not None:
            scores = jnp.where(mask[:, None], scores, jnp.asarray(_NEG, scores.dtype))
        attn = nn.softmax(scores, axis=-1)
        if mask is not None:
            attn = jnp.where(mask[:, None], attn, 0)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, tq, self.n_feat)
        return self.linear_out(out)

    def __call__(self, q_in, kv_in, mask):
        return self.attend(self.project_q(q_in), *self.project_kv(kv_in), mask)


class DecoderLayer(nn.Module):
    n_head: int
    n_feat: int
    ffn_dim: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        self.norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        self.norm3 = nn.LayerNorm(dtype=self.dtype, name="norm3")
        self.self_attn = _Attention(self.n_head, self.n_feat, self.dtype, name="self_attn")
        self.src_attn = _Attention(self.n_head, self.n_feat, self.dtype, name="src_attn")
        self.ffn1 = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn1")
        self.ffn2 = nn.Dense(self.n_feat, dtype=self.dtype, name="ffn2")
        self.drop = nn.Dropout(self.dropout_rate)

    def _ffn(self, y, deterministic):
        return self.ffn2(self.drop(nn.relu(self.ffn1(y)), deterministic=deterministic))

    def __call__(self, x, self_mask, memory, memory_mask, deterministic=True):
        d = lambda y: self.drop(y, deterministic=deterministic)
        y1 = self.norm1(x)
        x = x + d(self.self_attn(y1, y1, self_mask))
        x = x + d(self.src_attn(self.norm2(x), memory, memory_mask))
        return x + d(self._ffn(self.norm3(x), deterministic))

    def step(self, x_t, pos: jnp.ndarray, kcache, vcache, mem_k, mem_v, mem_mask):
        """One AR step. x_t [B, 1, D]; kcache/vcache [B, Lmax, H, dk] updated
        at `pos`; mem_k/mem_v precomputed cross K/V. -> (y_t, kcache, vcache)."""
        b, lmax = kcache.shape[0], kcache.shape[1]
        y = self.norm1(x_t)
        q = self.self_attn.project_q(y)
        k_t, v_t = self.self_attn.project_kv(y)
        kcache = jax.lax.dynamic_update_slice_in_dim(kcache, k_t, pos, axis=1)
        vcache = jax.lax.dynamic_update_slice_in_dim(vcache, v_t, pos, axis=1)
        step_mask = (jnp.arange(lmax) <= pos)[None, None, :]  # [1, 1, Lmax]
        att = self.self_attn.attend(q, kcache, vcache, jnp.broadcast_to(step_mask, (b, 1, lmax)))
        x_t = x_t + att
        y = self.norm2(x_t)
        x_t = x_t + self.src_attn.attend(self.src_attn.project_q(y), mem_k, mem_v, mem_mask)
        x_t = x_t + self._ffn(self.norm3(x_t), True)
        return x_t, kcache, vcache

    def project_memory(self, memory):
        return self.src_attn.project_kv(memory)


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
        ys_in: Optional[jnp.ndarray],  # [B, L] target ids with <sos> prepended
        ys_lens: jnp.ndarray,  # [B] lengths of ys_in
        deterministic: bool = True,
        inputs_embeds: Optional[jnp.ndarray] = None,  # [B, L, D] (paraformer NAR)
        causal: bool = True,
    ) -> jnp.ndarray:
        """Teacher-forced forward -> logits [B, L, V].

        `inputs_embeds` replaces token embedding (Paraformer feeds CIF
        acoustic embeddings); `causal=False` gives the bidirectional NAR
        self-attention (wenet/paraformer parity)."""
        if inputs_embeds is not None:
            x = inputs_embeds
            l = x.shape[1]
            x, _ = self.pe.add_abs(x / self.pe.xscale, 0)
        else:
            l = ys_in.shape[1]
            x, _ = self.pe.add_abs(self.embed(ys_in), 0)
        x = self.dropout(x, deterministic=deterministic)
        tgt_pad = ~make_pad_mask(ys_lens, l)  # [B, L] True=valid
        self_mask = tgt_pad[:, None, :]
        if causal:
            self_mask = self_mask & subsequent_mask(l)[None]
        else:
            self_mask = self_mask & tgt_pad[:, :, None]
        mem_mask = ~make_pad_mask(memory_lens, memory.shape[1])[:, None, :]
        for layer in self.layers:
            x = layer(x, self_mask, memory, mem_mask, deterministic)
        return self.output_layer(self.after_norm(x))

    # ------------------------------------------------ AR one-step decoding

    def init_ar_cache(self, batch: int, lmax: int):
        """Per-layer self-attention KV buffers [L, B, Lmax, H, dk] x 2."""
        h, dk = self.n_head, self.n_feat // self.n_head
        shape = (self.num_blocks, batch, lmax, h, dk)
        return jnp.zeros(shape, self.dtype), jnp.zeros(shape, self.dtype)

    def project_memory(self, memory):
        """Precompute cross-attention K/V for all layers:
        ([L, B, T, H, dk], [L, B, T, H, dk])."""
        ks, vs = [], []
        for layer in self.layers:
            k, v = layer.project_memory(memory)
            ks.append(k)
            vs.append(v)
        return jnp.stack(ks), jnp.stack(vs)

    def forward_one_step(
        self,
        tokens: jnp.ndarray,  # [B] current input token
        pos: jnp.ndarray,  # [] step index (0-based)
        kcache: jnp.ndarray,  # [L, B, Lmax, H, dk]
        vcache: jnp.ndarray,
        mem_k: jnp.ndarray,  # [L, B, T, H, dk]
        mem_v: jnp.ndarray,
        mem_mask: jnp.ndarray,  # [B, 1, T]
    ):
        """-> (log_probs [B, V], kcache, vcache)."""
        x = self.embed(tokens)[:, None, :]  # [B, 1, D]
        pe = self.pe.position_encoding(pos, 1).astype(x.dtype)
        x = x * jnp.asarray(self.pe.xscale, x.dtype) + pe
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            x, kc, vc = layer.step(x, pos, kcache[i], vcache[i], mem_k[i], mem_v[i], mem_mask)
            new_k.append(kc)
            new_v.append(vc)
        logits = self.output_layer(self.after_norm(x))[:, 0]
        return (
            jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
            jnp.stack(new_k),
            jnp.stack(new_v),
        )


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
    import numpy as _np

    b, l, v = logits.shape
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    conf = 1.0 - smoothing
    low = smoothing / (v - 1)
    true_lp = jnp.take_along_axis(lp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    # KL(dist || p) = -(conf*lp[target] + low*sum_other lp) + H(dist) constant
    # (the entropy constant is included for value parity with torch KLDivLoss)
    entropy = -(conf * _np.log(max(conf, 1e-12)) + (v - 1) * low * _np.log(max(low, 1e-12)))
    kl = -(conf * true_lp + low * (jnp.sum(lp, axis=-1) - true_lp)) - entropy
    mask = jnp.arange(l)[None, :] < lengths[:, None]
    total = jnp.sum(jnp.where(mask, kl, 0.0))
    denom = jnp.sum(lengths) if normalize_length else b
    return total / denom
