"""Attention / padding mask library, jit-native.

Behavior parity with wenet/utils/mask.py:52-227 (subsequent_chunk_mask,
add_optional_chunk_mask, make_pad_mask) re-expressed as branch-free jnp index
arithmetic so chunk size can be a traced value (dynamic-chunk training samples
the chunk size on device each step — reference mask.py:162-188 does it in
Python per rank, which under SPMD would desync replicas; here the PRNG key is
folded from the global step so every data-parallel replica builds the same
mask).

Convention: boolean masks are True = attend/valid (wenet's non-pad
convention); padding masks from `make_pad_mask` are True = PAD (wenet's
make_pad_mask), callers invert as needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] bool, True at padded positions."""
    idx = jnp.arange(max_len)[None, :]
    return idx >= lengths[:, None]


def subsequent_mask(size: int) -> jnp.ndarray:
    """[size, size] lower-triangular causal mask (True = attend)."""
    i = jnp.arange(size)
    return i[None, :] <= i[:, None]


def chunk_mask(size: int, chunk_size: jnp.ndarray, num_left_chunks: jnp.ndarray) -> jnp.ndarray:
    """[size, size] block-chunk mask; True = attend.

    Row i attends columns [start, end) with end = (i//cs + 1) * cs and
    start = 0 if num_left_chunks < 0 else max((i//cs - L) * cs, 0).
    `chunk_size` and `num_left_chunks` may be traced scalars.
    """
    cs = jnp.maximum(chunk_size, 1)
    i = jnp.arange(size)[:, None]
    j = jnp.arange(size)[None, :]
    blk = i // cs
    end = (blk + 1) * cs
    start = jnp.where(
        num_left_chunks < 0, 0, jnp.maximum((blk - num_left_chunks) * cs, 0)
    )
    return (j >= start) & (j < end)


def add_optional_chunk_mask(
    pad_mask: jnp.ndarray,  # [B, 1, T] bool, True = valid (non-pad)
    *,
    use_dynamic_chunk: bool,
    use_dynamic_left_chunk: bool,
    decoding_chunk_size: int,
    static_chunk_size: int,
    num_decoding_left_chunks: int,
    rng: jax.Array | None = None,
    max_chunk_size: int = 25,
    enable_full_context: bool = True,
) -> jnp.ndarray:
    """[B, T, T] combined chunk+padding attention mask (True = attend).

    Semantics of wenet add_optional_chunk_mask (mask.py:126-198):
    - use_dynamic_chunk & decoding_chunk_size == 0 (training): sample
      c ~ U[1, T); if c > T//2 (and full context enabled) use full context,
      else chunk = c % max_chunk_size + 1; optionally sample a random left
      chunk budget.
    - decoding_chunk_size > 0: fixed chunk + num_decoding_left_chunks.
    - decoding_chunk_size < 0: full context.
    - static_chunk_size > 0 (no dynamic): static chunk.
    - else: padding mask only.
    """
    t = pad_mask.shape[-1]
    if use_dynamic_chunk:
        if decoding_chunk_size < 0:
            cs, left = jnp.int32(t), jnp.int32(-1)
        elif decoding_chunk_size > 0:
            cs = jnp.int32(decoding_chunk_size)
            left = jnp.int32(num_decoding_left_chunks)
        else:
            assert rng is not None, "dynamic chunk training needs an rng key"
            k1, k2 = jax.random.split(rng)
            c = jax.random.randint(k1, (), 1, max(t, 2))
            small = c % max_chunk_size + 1
            if enable_full_context:
                cs = jnp.where(c > t // 2, t, small)
            else:
                cs = small
            if use_dynamic_left_chunk:
                max_left = jnp.maximum((t - 1) // jnp.maximum(cs, 1), 1)
                left = jax.random.randint(k2, (), 0, 1 << 30) % max_left
                # full-context draws keep unlimited left context
                left = jnp.where(cs >= t, -1, left)
            else:
                left = jnp.int32(-1)
        cm = chunk_mask(t, cs, left)[None]  # [1, T, T]
        return pad_mask & cm
    if static_chunk_size > 0:
        cm = chunk_mask(t, jnp.int32(static_chunk_size), jnp.int32(num_decoding_left_chunks))[None]
        return pad_mask & cm
    return jnp.broadcast_to(pad_mask, (pad_mask.shape[0], t, t))


def streaming_key_mask(
    cache_capacity: int, chunk: int, valid_cache: jnp.ndarray
) -> jnp.ndarray:
    """[1, chunk, cache_capacity + chunk] mask for one streaming step.

    The fixed-size attention cache is right-aligned (newest frames last); only
    the last `valid_cache` cache slots hold real history. All chunk frames
    attend the full valid window (wenet forward_chunk passes no att_mask:
    the cache is pre-trimmed to the left-context budget, encoder.py:259-264).
    """
    j = jnp.arange(cache_capacity + chunk)[None, None, :]
    return j >= (cache_capacity - valid_cache)
