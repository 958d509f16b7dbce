"""Sinusoidal positional encodings with streaming offset support.

Parity: wenet/transformer/embedding.py:27-147. `PositionalEncoding` scales the
input by sqrt(d) and adds PE[offset:offset+T]; `RelPositionalEncoding` scales
the input and returns the PE window separately for rel-pos attention (where,
with wenet's rel_shift disabled — attention.py:407-409 — the PE indexes the
absolute positions of the *keys*). `position_encoding(offset, size)` supports
traced scalar or per-batch offsets (negative clamped to 0, matching the
batched-offset embedding-lookup path, embedding.py:101-110).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def whisper_sinusoid_table(max_len: int, d_model: int, dtype=np.float32) -> np.ndarray:
    """OpenAI-whisper encoder PE layout: concat(sin, cos) over half-dim
    timescales, xscale 1 (wenet embedding.py:150-165)."""
    half = d_model // 2
    inc = math.log(10000.0) / (half - 1)
    inv = np.exp(-inc * np.arange(half, dtype=np.float64))
    scaled = np.arange(max_len, dtype=np.float64)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(dtype)


def sinusoid_table(max_len: int, d_model: int, dtype=np.float32) -> np.ndarray:
    """[max_len, d_model]: pe[p, 2i]=sin(p/10000^(2i/d)), pe[p, 2i+1]=cos."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe.astype(dtype)


class PositionalEncodingTable:
    """Host-constant PE table with jit-friendly offset indexing."""

    def __init__(self, d_model: int, max_len: int = 5000):
        self.d_model = d_model
        self.max_len = max_len
        self.xscale = math.sqrt(d_model)
        self.table = sinusoid_table(max_len, d_model)

    def position_encoding(self, offset, size: int, stride: int = 1) -> jnp.ndarray:
        """PE window [1, size, d] (or [B, size, d] for per-batch offsets).

        `offset` may be a python int, a traced scalar, or a [B] array; indices
        below zero clamp to 0 (those slots are always masked by callers).
        `stride` indexes every stride-th table entry — used by reduced-rate
        encoder layers whose full-context forward samples ``pos_emb[:, ::f]``
        (squeezeformer/efficient-conformer time reduction).

        Unbounded streams: when the window's end would pass `max_len`, the
        whole window is rebased so it ends at the table top — relative
        geometry *within* the window (chunk + its KV cache, the only span a
        chunk step ever attends over) stays exact for arbitrarily long
        streams. The reference instead hard-asserts at max_len
        (wenet/transformer/embedding.py:80-118), capping streams at 5000
        encoder frames; a plain clamp (the pre-round-3 behavior) silently
        collapses every past-cap position onto one PE row.
        """
        table = jnp.asarray(self.table)
        if isinstance(offset, int) and stride == 1 and offset + size <= self.max_len:
            return table[offset : offset + size][None]
        offset = jnp.asarray(offset)
        idx = jnp.arange(size) * stride
        span = (size - 1) * stride + 1  # window extent in table rows
        if offset.ndim == 0:
            shift = jnp.maximum(offset + span - self.max_len, 0)
            pos = jnp.clip(offset - shift + idx, 0, self.max_len - 1)
            return jnp.take(table, pos, axis=0)[None]
        shift = jnp.maximum(offset + span - self.max_len, 0)
        pos = jnp.clip((offset - shift)[:, None] + idx[None, :], 0, self.max_len - 1)
        return jnp.take(table, pos, axis=0)  # [B, size, d]

    def add_abs(self, x: jnp.ndarray, offset=0) -> tuple[jnp.ndarray, jnp.ndarray]:
        """abs_pos: return (x * xscale + PE, PE window)."""
        pe = self.position_encoding(offset, x.shape[1]).astype(x.dtype)
        return x * jnp.asarray(self.xscale, x.dtype) + pe, pe

    def rel(self, x: jnp.ndarray, offset=0) -> tuple[jnp.ndarray, jnp.ndarray]:
        """rel_pos: return (x * xscale, PE window) — PE consumed by attention."""
        pe = self.position_encoding(offset, x.shape[1]).astype(x.dtype)
        return x * jnp.asarray(self.xscale, x.dtype), pe

    def rel_bidirectional(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Transformer-XL bidirectional PE window for rel_shift attention
        (wenet firered/attention.py:24-55): positions T-1 .. -(T-1) ->
        (x * xscale, pe [1, 2T-1, d]). sin(-p) = -sin(p), cos(-p) = cos(p),
        so the negative half reuses the host table with sin lanes negated."""
        t = x.shape[1]
        table = jnp.asarray(self.table)
        pos = table[:t][::-1]  # positions T-1 .. 0
        neg = table[1:t]  # positions 1 .. T-1 -> negate sin (even) lanes
        sign = jnp.asarray(
            np.where(np.arange(self.d_model) % 2 == 0, -1.0, 1.0), table.dtype
        )
        pe = jnp.concatenate([pos, neg * sign], axis=0)[None].astype(x.dtype)
        return x * jnp.asarray(self.xscale, x.dtype), pe

    def rope_window(self, offset, size: int, head_dim: int,
                    theta: float = 10000.0):
        """Rotary (cos, sin) tables for positions [offset, offset+size),
        non-interleaved half-split layout (wenet embedding.py:201-259 /
        rope_utils 'google' style) -> each [1, size, head_dim]."""
        half = head_dim // 2
        inv = 1.0 / (theta ** (np.arange(0, half, dtype=np.float64) * 2 / head_dim))
        inv = jnp.asarray(inv, jnp.float32)
        if isinstance(offset, int):
            pos = jnp.arange(offset, offset + size, dtype=jnp.float32)
        else:
            pos = (jnp.asarray(offset) + jnp.arange(size)).astype(jnp.float32)
        ang = pos[:, None] * inv[None, :]  # [size, half]
        ang = jnp.concatenate([ang, ang], axis=-1)  # [size, head_dim]
        return jnp.cos(ang)[None], jnp.sin(ang)[None]
