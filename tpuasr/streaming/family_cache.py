"""Shared fixed-capacity streaming-cache machinery for the multi-rate
encoder families (squeezeformer U-Net reduce/recover, efficient-conformer
mid-stack strides).

Both families stream with the same contract (wenet squeezeformer/encoder.py
:266-406 and efficient_conformer/encoder.py:300-462): per-layer KV caches of
`chunk * left_chunks / factor_i` frames at each layer's own frame rate, a
conv left-context cache of `kernel - 1` frames, and one absolute full-rate
offset. What differs per family is only where the rate changes inside the
block stack; that control flow stays in the family encoders."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass
class FamilyStreamState:
    """Per-layer fixed-shape streaming caches (shapes differ by frame rate).

    att: tuple over layers of (k, v), each [B, A_i, H, dk] at the layer's
         own rate (A_i = chunk * left_chunks / factor_i).
    cnn: tuple over layers of [B, lorder, D] conv left context.
    offset: [] int32 — full-rate encoder frames consumed so far.
    """

    att: tuple
    cnn: tuple
    offset: jnp.ndarray


jax.tree_util.register_dataclass(
    FamilyStreamState,
    data_fields=["att", "cnn", "offset"],
    meta_fields=[],
)


def init_family_state(batch: int, chunk_size: int, num_left_chunks: int,
                      num_blocks: int, layer_factor, heads: int, dk: int,
                      lorder: int, dim: int, dtype) -> FamilyStreamState:
    """Zeroed per-layer caches; `layer_factor(i)` gives layer i's frame-rate
    downsampling factor (wenet calculate_downsampling_factor role)."""
    a = chunk_size * max(num_left_chunks, 0)
    att, cnn = [], []
    for i in range(num_blocks):
        f = layer_factor(i)
        att.append((
            jnp.zeros((batch, a // f, heads, dk), dtype),
            jnp.zeros((batch, a // f, heads, dk), dtype),
        ))
        cnn.append(jnp.zeros((batch, lorder, dim), dtype))
    return FamilyStreamState(
        att=tuple(att), cnn=tuple(cnn), offset=jnp.zeros((), jnp.int32)
    )


def rate_view(pe, offset, a0: int, chunk: int, batch: int, factor: int,
              dtype):
    """(pos_emb, att_mask) for one frame rate.

    a0 is the full-rate cache capacity; the position window covers the
    cache + chunk at absolute offsets with `stride=factor`, and the mask
    hides cache slots not yet filled (cold start)."""
    a_f = a0 // factor
    chunk_f = chunk // factor
    off_f = offset // factor
    pos = pe.position_encoding(
        (off_f - a_f) * factor, a_f + chunk_f, stride=factor
    ).astype(dtype)
    valid = jnp.minimum(off_f, a_f)
    j = jnp.arange(a_f + chunk_f)[None, None, :]
    att_mask = jnp.broadcast_to(j >= (a_f - valid), (batch, chunk_f, a_f + chunk_f))
    return pos, att_mask


def roll_cache(k_full: jnp.ndarray, v_full: jnp.ndarray, a_i: int):
    """Keep the trailing `a_i` frames of the concatenated cache+chunk K/V
    (the fixed-capacity rollover; wenet's next_cache_start trim)."""
    chunk_i = k_full.shape[1] - a_i
    if a_i > 0:
        return k_full[:, chunk_i:], v_full[:, chunk_i:]
    return k_full[:, :0], v_full[:, :0]
