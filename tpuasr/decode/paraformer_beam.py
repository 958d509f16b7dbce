"""Positionwise batch beam search over NAR (Paraformer) decoder logits.

Parity: wenet/paraformer/search.py:181-255 (`paraformer_beam_search` /
`_batch_beam_search` with the mask_finished_scores / mask_finished_preds
finishing rules of wenet/utils/mask.py:258-304): positions are conditionally
independent given the fired embeddings, so the beam is a per-position top-k
product over the running hypothesis scores; hypotheses whose row is past its
length continue with a single zero-cost <eos> child.

TPU design: one `lax.scan` over positions; hypotheses are dense tensors
(tokens [B, N, U], scores [B, N]) reindexed by gather — jit-compiled, batched,
no per-hypothesis python objects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1.0e30


def nar_beam_search(
    logits: jnp.ndarray,  # [B, U, V] NAR decoder logits
    lens: jnp.ndarray,  # [B] valid output lengths
    beam_size: int = 10,
    eos_id: int = 3,
):
    """-> (tokens [B, N, U] int32, scores [B, N] descending)."""
    b, u, v = logits.shape
    n = beam_size
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # finished rows extend each beam with exactly one zero-cost child
    # (mask_finished_scores semantics); the chosen token is forced to eos.
    eos_only = jnp.full((v,), _NEG).at[0].set(0.0)

    scores, idx = jax.lax.top_k(lp[:, 0], n)  # [B, N]
    fin0 = (0 >= lens)[:, None]
    scores = jnp.where(fin0, jnp.where(jnp.arange(n)[None, :] == 0, 0.0, _NEG), scores)
    idx = jnp.where(fin0, eos_id, idx)
    tokens = jnp.zeros((b, n, u), jnp.int32).at[:, :, 0].set(idx)

    def step(carry, i):
        scores, tokens = carry
        s = jax.lax.dynamic_index_in_dim(lp, i, axis=1, keepdims=False)  # [B, V]
        finished = (i >= lens)[:, None, None]  # [B, 1, 1]
        ext = scores[:, :, None] + jnp.where(finished, eos_only[None, None], s[:, None, :])
        new_scores, top = jax.lax.top_k(ext.reshape(b, n * v), n)
        src = top // v
        tok = jnp.where(finished[:, :, 0], eos_id, top % v).astype(jnp.int32)
        tokens = jnp.take_along_axis(tokens, src[..., None], axis=1)
        tokens = tokens.at[:, :, i].set(tok)
        return (new_scores, tokens), None

    (scores, tokens), _ = jax.lax.scan(step, (scores, tokens), jnp.arange(1, u))
    return tokens, scores


def cif_timestamps_from_peaks(peaks, num_frames: int, frame_rate: float = 0.02):
    """(start, end) seconds per token from CIF fire positions (wenet
    paraformer/search.py:113-136).

    Each fire is shifted back half a frame; a token spans fire[i]..fire[i+1]
    capped at MAX_TOKEN_DURATION frames. If the audio tail after the last
    fire exceeds START_END_THRESHOLD frames, the last token ends at the
    midpoint and a trailing silence segment is appended."""
    START_END_THRESHOLD = 5
    MAX_TOKEN_DURATION = 14
    fires = [p - 0.5 for p in peaks]
    times = []
    for i in range(len(fires) - 1):
        start = fires[i]
        if fires[i + 1] - fires[i] <= MAX_TOKEN_DURATION:
            end = fires[i + 1]
        else:
            end = fires[i] + MAX_TOKEN_DURATION
        times.append([start * frame_rate, end * frame_rate])
    if times:
        if num_frames - fires[-1] > START_END_THRESHOLD:
            mid = (num_frames + fires[-1]) * 0.5
            times[-1][1] = mid * frame_rate
            times.append([mid * frame_rate, num_frames * frame_rate])
        else:
            times[-1][1] = num_frames * frame_rate
    return [tuple(t) for t in times]
