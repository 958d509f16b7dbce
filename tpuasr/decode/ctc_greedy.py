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


@functools.partial(jax.jit, static_argnames=("blank_id", "pad_id"))
def ctc_greedy_decode(
    log_probs: jnp.ndarray,  # [B, T, V]
    lens: jnp.ndarray,  # [B]
    blank_id: int,
    pad_id: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (tokens [B, T] pad_id-padded, token_lens [B])."""
    b, t, _ = log_probs.shape
    ids = jnp.argmax(log_probs, axis=-1)  # [B, T]
    valid = jnp.arange(t)[None, :] < lens[:, None]
    prev = jnp.pad(ids, ((0, 0), (1, 0)), constant_values=blank_id)[:, :t]
    keep = (ids != blank_id) & (ids != prev) & valid

    pos = jnp.cumsum(keep, axis=1) - 1  # target slot per kept token
    # scatter kept tokens into compacted rows; dropped tokens go to a trash col
    col = jnp.where(keep, pos, t)
    out = jnp.full((b, t + 1), pad_id, ids.dtype)
    out = out.at[jnp.arange(b)[:, None], col].set(jnp.where(keep, ids, pad_id))
    token_lens = jnp.sum(keep, axis=1)
    return out[:, :t], token_lens


def remove_duplicates_and_blank(ids, blank_id):
    """Host-side reference collapse (wenet/utils/ctc_utils.py:23-33 parity)."""
    out = []
    prev = None
    for i in ids:
        if i != blank_id and i != prev:
            out.append(int(i))
        prev = i
    return out
