"""Batched, jit-compiled CTC greedy decode.

Parity: wenet/transformer/search.py:107-122 / model/rnnt_model.py:188-210
(argmax per frame → collapse repeats → drop blanks), but fully vectorized:
the reference collapses with a per-utterance Python loop; here the compaction
is a masked scatter so the whole batch decodes in one XLA program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("blank_id", "pad_id", "with_details"))
def ctc_greedy_decode(
    log_probs: jnp.ndarray,  # [B, T, V]
    lens: jnp.ndarray,  # [B]
    blank_id: int,
    pad_id: int = 0,
    with_details: bool = False,
):
    """-> (tokens [B, T] pad_id-padded, token_lens [B]); with_details adds
    (times [B, T] frame index of each emission, confidence [B] mean token
    prob) — the DecodeResult fields of wenet search.py:30-59."""
    b, t, _ = log_probs.shape
    ids = jnp.argmax(log_probs, axis=-1)  # [B, T]
    valid = jnp.arange(t)[None, :] < lens[:, None]
    prev = jnp.pad(ids, ((0, 0), (1, 0)), constant_values=blank_id)[:, :t]
    keep = (ids != blank_id) & (ids != prev) & valid

    pos = jnp.cumsum(keep, axis=1) - 1  # target slot per kept token
    # scatter kept tokens into compacted rows; dropped tokens go to a trash col
    col = jnp.where(keep, pos, t)
    rows = jnp.arange(b)[:, None]
    out = jnp.full((b, t + 1), pad_id, ids.dtype)
    out = out.at[rows, col].set(jnp.where(keep, ids, pad_id))
    token_lens = jnp.sum(keep, axis=1)
    if not with_details:
        return out[:, :t], token_lens

    frame_idx = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    times = jnp.zeros((b, t + 1), jnp.int32)
    times = times.at[rows, col].set(jnp.where(keep, frame_idx, 0))
    top_p = jnp.exp(jnp.max(log_probs, axis=-1))  # [B, T]
    conf = jnp.sum(jnp.where(keep, top_p, 0.0), axis=1) / jnp.maximum(token_lens, 1)
    return out[:, :t], token_lens, times[:, :t], conf


def remove_duplicates_and_blank(ids, blank_id):
    """Host-side reference collapse (wenet/utils/ctc_utils.py:23-33 parity)."""
    out = []
    prev = None
    for i in ids:
        if i != blank_id and i != prev:
            out.append(int(i))
        prev = i
    return out
