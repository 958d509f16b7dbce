"""Multi-head attention with wenet-style relative positional bias.

Parity: wenet/transformer/attention.py:29-438. The rel-pos variant implements
Transformer-XL u/v biases with `rel_shift` disabled (attention.py:407-409 —
wenet removes it for streaming), so the positional term is
``(q + pos_bias_v) @ linear_pos(PE_keys)^T`` where PE indexes the absolute
positions of the keys. That makes chunked streaming exactly equal to the
full-context forward as long as key PE windows line up (encoder.py:257).

Streaming KV cache: callers pass a fixed-capacity right-aligned (k, v) cache
(newest frames last) plus a validity count; this module concatenates, scores
against the whole window, and returns the updated window for the caller to
re-trim — the static-shape equivalent of wenet `_update_kv_and_cache`
(attention.py:180-215).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

_NEG_INF = -1.0e9


def masked_softmax(scores: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Softmax over the last axis with True=attend mask; fully-masked rows
    produce zero attention (wenet forward_attention double-fill semantics)."""
    if mask is None:
        return nn.softmax(scores, axis=-1)
    neg = jnp.asarray(_NEG_INF, scores.dtype)
    scores = jnp.where(mask, scores, neg)
    attn = nn.softmax(scores, axis=-1)
    return jnp.where(mask, attn, 0)


class RelPositionMultiHeadedAttention(nn.Module):
    """Self-attention with u/v positional biases (no rel_shift).

    `fused=True` routes the full-context path (no KV cache, mask present,
    no attention dropout) through the Pallas fused kernel
    (tpuasr.ops.attention_pallas): scores + mask + softmax + AV stay in VMEM
    per (batch, head) instead of round-tripping [B, H, T, S] through HBM."""

    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    def setup(self):
        assert self.n_feat % self.n_head == 0
        self.d_k = self.n_feat // self.n_head
        dense = lambda name, use_bias=True: nn.Dense(
            self.n_feat, use_bias=use_bias, dtype=self.dtype, name=name
        )
        self.linear_q = dense("linear_q")
        self.linear_k = dense("linear_k")
        self.linear_v = dense("linear_v")
        self.linear_out = dense("linear_out")
        self.linear_pos = dense("linear_pos", use_bias=False)
        init = nn.initializers.xavier_uniform()
        self.pos_bias_u = self.param("pos_bias_u", init, (self.n_head, self.d_k))
        self.pos_bias_v = self.param("pos_bias_v", init, (self.n_head, self.d_k))
        self.attn_dropout = nn.Dropout(self.dropout_rate)

    def __call__(
        self,
        x: jnp.ndarray,  # [B, T1, D] (self-attention input)
        mask: Optional[jnp.ndarray],  # [B, T1|1, T2] bool True=attend, or None
        pos_emb: jnp.ndarray,  # [1|B, T2, D] PE of key absolute positions
        cache: Optional[tuple[jnp.ndarray, jnp.ndarray]] = None,  # ([B,A,H,dk], [B,A,H,dk])
        deterministic: bool = True,
    ):
        b, t1, _ = x.shape
        h, dk = self.n_head, self.d_k

        if self.is_initializing():
            q = self.linear_q(x).reshape(b, t1, h, dk)
            k = self.linear_k(x).reshape(b, t1, h, dk)
            v = self.linear_v(x).reshape(b, t1, h, dk)
        else:
            # fused QKV: one [D, 3D] matmul instead of three [D, D] — the
            # d256 model's per-op work is tiny on the MXU, so merging the
            # projections at apply time cuts op count with bitwise-identical
            # results (same contraction order per output column). Parameter
            # layout is untouched (init still creates linear_{q,k,v}); the
            # concat of the three kernels is a ~0.8 MB copy per call.
            pq = self.linear_q.variables["params"]
            pk = self.linear_k.variables["params"]
            pv = self.linear_v.variables["params"]
            w = jnp.concatenate(
                [pq["kernel"], pk["kernel"], pv["kernel"]], axis=1
            ).astype(self.dtype)
            bias = jnp.concatenate(
                [pq["bias"], pk["bias"], pv["bias"]]
            ).astype(self.dtype)
            qkv = jnp.dot(x.astype(self.dtype), w) + bias
            q, k, v = (z.reshape(b, t1, h, dk)
                       for z in jnp.split(qkv, 3, axis=-1))
        if cache is not None:
            k = jnp.concatenate([cache[0], k], axis=1)  # [B, A+T1, H, dk]
            v = jnp.concatenate([cache[1], v], axis=1)
        new_cache = (k, v)
        t2 = k.shape[1]

        p = self.linear_pos(pos_emb).reshape(pos_emb.shape[0], t2, h, dk)

        if (self.fused and cache is None and mask is not None
                and self.dropout_rate == 0.0 and p.shape[0] == 1):
            from tpuasr.ops.attention_pallas import fused_relpos_attention

            # kernel works in the flat [B, T, H*dk] layout (heads are lane
            # slices) and adds the u/v biases in VMEM itself
            out = fused_relpos_attention(
                q.reshape(b, t1, h * dk),
                k.reshape(b, t2, h * dk),
                p.reshape(1, t2, h * dk),
                v.reshape(b, t2, h * dk),
                self.pos_bias_u.astype(q.dtype).reshape(-1),
                self.pos_bias_v.astype(q.dtype).reshape(-1),
                mask, 1.0 / math.sqrt(dk), h,
            )
            return self.linear_out(out), new_cache

        q_u = q + self.pos_bias_u.astype(q.dtype)[None, None]
        q_v = q + self.pos_bias_v.astype(q.dtype)[None, None]

        # content score (matrix a+c) and position score (matrix b+d, no shift)
        ac = jnp.einsum("bthd,bshd->bhts", q_u, k)
        bd = jnp.einsum("bthd,pshd->bhts", q_v, p)  # p batch dim broadcasts
        scores = (ac + bd) / math.sqrt(dk)

        attn = masked_softmax(scores, None if mask is None else mask[:, None])
        if self.dropout_rate > 0:
            attn = self.attn_dropout(attn, deterministic=deterministic)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, t1, h * dk)
        return self.linear_out(out), new_cache


def repeat_kv(z: jnp.ndarray, n_head: int) -> jnp.ndarray:
    """[B, T, Hkv, dk] -> [B, T, H, dk] GQA/MQA head-repeat
    (wenet attention.py:217-243)."""
    hkv = z.shape[2]
    if hkv == n_head:
        return z
    assert n_head % hkv == 0, (n_head, hkv)
    return jnp.repeat(z, n_head // hkv, axis=2)


class MultiHeadedAttention(nn.Module):
    """Plain scaled dot-product MHA (abs-pos encoders; pos_emb ignored).

    `n_kv_head < n_head` selects GQA (MQA at 1): K/V are projected to
    n_kv_head heads, cached at that width, and head-repeated for the scores
    (wenet attention.py:217-243)."""

    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    n_kv_head: int = 0  # 0 -> n_head

    @nn.compact
    def __call__(self, x, mask, pos_emb=None, cache=None, deterministic=True):
        b, t1, _ = x.shape
        h = self.n_head
        hk = self.n_kv_head or h
        dk = self.n_feat // h
        q = nn.Dense(self.n_feat, dtype=self.dtype, name="linear_q")(x).reshape(b, t1, h, dk)
        k = nn.Dense(hk * dk, dtype=self.dtype, name="linear_k")(x).reshape(b, t1, hk, dk)
        v = nn.Dense(hk * dk, dtype=self.dtype, name="linear_v")(x).reshape(b, t1, hk, dk)
        if cache is not None:
            k = jnp.concatenate([cache[0], k], axis=1)
            v = jnp.concatenate([cache[1], v], axis=1)
        new_cache = (k, v)
        scores = jnp.einsum("bthd,bshd->bhts", q, repeat_kv(k, h)) / math.sqrt(dk)
        attn = masked_softmax(scores, None if mask is None else mask[:, None])
        if self.dropout_rate > 0:
            attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        out = jnp.einsum("bhts,bshd->bthd", attn, repeat_kv(v, h)).reshape(b, t1, h * dk)
        return nn.Dense(self.n_feat, dtype=self.dtype, name="linear_out")(out), new_cache


class ShawRelPositionMultiHeadedAttention(nn.Module):
    """Shaw-style learned relative-position attention
    (https://arxiv.org/abs/1803.02155; wenet attention.py:523-596):
    ``scores[i, j] += q_i . rel_k[clip(j - i, -max_left, max_right)]``.

    Streaming-safe: relative distances are translation-invariant, so the
    same table serves the full forward and cached windows (queries are the
    trailing t1 positions of the key window, the reference's
    ``rel_k[-q.size(2):]`` trick)."""

    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    max_left_rel_pos: int = 64
    max_right_rel_pos: int = 8

    @nn.compact
    def __call__(self, x, mask, pos_emb=None, cache=None, deterministic=True):
        b, t1, _ = x.shape
        h = self.n_head
        dk = self.n_feat // h
        q = nn.Dense(self.n_feat, dtype=self.dtype, name="linear_q")(x).reshape(b, t1, h, dk)
        k = nn.Dense(self.n_feat, dtype=self.dtype, name="linear_k")(x).reshape(b, t1, h, dk)
        v = nn.Dense(self.n_feat, dtype=self.dtype, name="linear_v")(x).reshape(b, t1, h, dk)
        if cache is not None:
            k = jnp.concatenate([cache[0], k], axis=1)
            v = jnp.concatenate([cache[1], v], axis=1)
        new_cache = (k, v)
        t2 = k.shape[1]

        table = self.param(
            "rel_k_embed", nn.initializers.normal(stddev=0.02),
            (self.max_left_rel_pos + self.max_right_rel_pos + 1, dk),
        )
        # queries are the last t1 of the t2-long key window
        qpos = jnp.arange(t1)[:, None] + (t2 - t1)
        rel = jnp.clip(jnp.arange(t2)[None, :] - qpos,
                       -self.max_left_rel_pos, self.max_right_rel_pos)
        rel_k = jnp.take(table.astype(q.dtype), rel + self.max_left_rel_pos,
                         axis=0)  # [t1, t2, dk]
        scores = (
            jnp.einsum("bthd,bshd->bhts", q, k)
            + jnp.einsum("bthd,tsd->bhts", q, rel_k)
        ) / math.sqrt(dk)
        attn = masked_softmax(scores, None if mask is None else mask[:, None])
        if self.dropout_rate > 0:
            attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, t1, h * dk)
        return nn.Dense(self.n_feat, dtype=self.dtype, name="linear_out")(out), new_cache


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotary embedding, non-interleaved half-split ('google' style,
    wenet rope_utils). x [B, T, H, dk]; cos/sin [1|B, T, dk]."""
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    return x * cos + rotate_half(x) * sin


class RopeMultiHeadedAttention(nn.Module):
    """RoPE attention (wenet attention.py:599-686): q/k of the current
    window are rotated by their absolute positions before scoring; cached
    keys carry their rotation, so chunked streaming needs only the current
    chunk's angles. Supports GQA via n_kv_head."""

    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    n_kv_head: int = 0

    @nn.compact
    def __call__(self, x, mask, pos_emb, cache=None, deterministic=True):
        cos, sin = pos_emb  # each [1|B, t1, dk]
        b, t1, _ = x.shape
        h = self.n_head
        hk = self.n_kv_head or h
        dk = self.n_feat // h
        q = nn.Dense(self.n_feat, dtype=self.dtype, name="linear_q")(x).reshape(b, t1, h, dk)
        k = nn.Dense(hk * dk, dtype=self.dtype, name="linear_k")(x).reshape(b, t1, hk, dk)
        v = nn.Dense(hk * dk, dtype=self.dtype, name="linear_v")(x).reshape(b, t1, hk, dk)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if cache is not None:
            k = jnp.concatenate([cache[0], k], axis=1)
            v = jnp.concatenate([cache[1], v], axis=1)
        new_cache = (k, v)
        scores = jnp.einsum("bthd,bshd->bhts", q, repeat_kv(k, h)) / math.sqrt(dk)
        attn = masked_softmax(scores, None if mask is None else mask[:, None])
        if self.dropout_rate > 0:
            attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        out = jnp.einsum("bhts,bshd->bthd", attn, repeat_kv(v, h)).reshape(b, t1, h * dk)
        return nn.Dense(self.n_feat, dtype=self.dtype, name="linear_out")(out), new_cache


def rel_shift_bidirectional(x: jnp.ndarray) -> jnp.ndarray:
    """Transformer-XL relative shift (wenet firered/attention.py:85-104):
    x [B, H, T, 2T-1] scored against a bidirectional position window
    (positions T-1 .. -(T-1)) -> [B, H, T, T] where out[..., i, j] picks the
    entry for relative position i - j."""
    b, h, t, p = x.shape
    zero = jnp.zeros((b, h, t, 1), x.dtype)
    xp = jnp.concatenate([zero, x], axis=-1)  # [B, H, T, P+1]
    xp = xp.reshape(b, h, p + 1, t)
    xp = xp[:, :, 1:].reshape(b, h, t, p)
    return xp[..., : p // 2 + 1]


class FireRedRelPositionAttention(nn.Module):
    """FireRed's Transformer-XL attention (wenet firered/attention.py:58-182):
    q/k/v LayerNorms before the projections, u/v positional biases, and a
    *bidirectional* relative position window with rel_shift (unlike the
    streaming-oriented no-shift formulation used elsewhere in this repo).
    Full-context only — the reference raises on streaming
    (firered/attention.py position_encoding NotImplementedError)."""

    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, pos_emb, cache=None, deterministic=True):
        assert cache is None, "FireRed attention is full-context only"
        b, t, _ = x.shape
        h = self.n_head
        dk = self.n_feat // h

        xq = nn.LayerNorm(dtype=self.dtype, name="layer_norm_q")(x)
        xk = nn.LayerNorm(dtype=self.dtype, name="layer_norm_k")(x)
        xv = nn.LayerNorm(dtype=self.dtype, name="layer_norm_v")(x)
        q = nn.Dense(self.n_feat, dtype=self.dtype, name="linear_q")(xq).reshape(b, t, h, dk)
        k = nn.Dense(self.n_feat, dtype=self.dtype, name="linear_k")(xk).reshape(b, t, h, dk)
        v = nn.Dense(self.n_feat, dtype=self.dtype, name="linear_v")(xv).reshape(b, t, h, dk)

        p = nn.Dense(self.n_feat, use_bias=False, dtype=self.dtype, name="linear_pos")(
            pos_emb
        ).reshape(pos_emb.shape[0], -1, h, dk)  # [1, 2T-1, H, dk]

        init = nn.initializers.xavier_uniform()
        u_bias = self.param("pos_bias_u", init, (h, dk))
        v_bias = self.param("pos_bias_v", init, (h, dk))

        q_u = q + u_bias.astype(q.dtype)[None, None]
        q_v = q + v_bias.astype(q.dtype)[None, None]
        ac = jnp.einsum("bthd,bshd->bhts", q_u, k)
        bd = jnp.einsum("bthd,pshd->bhts", q_v, p)  # [B, H, T, 2T-1]
        bd = rel_shift_bidirectional(bd)
        scores = (ac + bd) / math.sqrt(dk)

        attn = masked_softmax(scores, None if mask is None else mask[:, None])
        if self.dropout_rate > 0:
            attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, t, h * dk)
        return nn.Dense(self.n_feat, dtype=self.dtype, name="linear_out")(out), None
