"""Batched autoregressive attention beam search.

Parity: wenet/transformer/search.py:250-366 (`attention_beam_search`) — B x N
beam over the attention decoder with per-layer KV caches reindexed on beam
selection, eos-finished hypotheses frozen, running until all beams finish or
`max_len` steps. Supports a forced prompt prefix (the whisper
sot/lang/task/no-timestamps grammar, search.py:265-279) and the final
length-penalty normalization `score / len^alpha` (search.py:352-355).

TPU design: preallocated [L, B*N, Lmax, H, dk] self-attention cache buffers
written at the step index; cross-attention K/V projected once; beam
reindexing is a gather over the hypothesis axis inside the jitted loop (the
reference's cache_reindex python surgery becomes one take_along_axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1.0e30


def attention_beam_search(
    model,  # ASRModel / WhisperModel (unbound)
    params,
    enc_out: jnp.ndarray,  # [B, T, D]
    enc_lens: jnp.ndarray,  # [B]
    sos_id: int,
    eos_id: int,
    beam_size: int = 10,
    max_len: int = 64,
    prompt: jnp.ndarray | None = None,  # [B, P] forced prefix (default [sos])
    length_penalty: float = 0.0,
):
    """-> (best tokens [B, max_len] (no prompt/eos), best lens [B],
           nbest scores [B, N])."""
    b, t, d = enc_out.shape
    n = beam_size
    if prompt is None:
        prompt = jnp.full((b, 1), sos_id, jnp.int32)
    p = prompt.shape[1]
    lmax = p + max_len

    # expand memory to B*N
    mem = jnp.repeat(enc_out, n, axis=0)
    mem_lens = jnp.repeat(enc_lens, n, axis=0)
    mem_mask = (jnp.arange(t)[None, :] < mem_lens[:, None])[:, None, :]  # [BN,1,T]

    mem_k, mem_v = model.apply(params, mem, method="decoder_project_memory")
    kcache, vcache = model.apply(params, b * n, lmax, method="decoder_init_cache")

    tokens = jnp.full((b, n, lmax), eos_id, jnp.int32)
    tokens = jnp.where(
        jnp.arange(lmax)[None, None, :] < p,
        jnp.pad(prompt, ((0, 0), (0, max_len)))[:, None, :],
        tokens,
    )
    scores = jnp.full((b, n), _NEG).at[:, 0].set(0.0)
    finished = jnp.zeros((b, n), bool)
    lens = jnp.zeros((b, n), jnp.int32)

    # prefill the prompt prefix through the AR cache (all beams identical;
    # the last prompt position is consumed by the first beam step below)
    if p > 1:
        def prefill(carry, i):
            kc, vc = carry
            cur = jnp.repeat(prompt[:, i], n, axis=0)  # [B*N]
            _, kc, vc = model.apply(
                params, cur, i, kc, vc, mem_k, mem_v, mem_mask,
                method="decoder_one_step",
            )
            return (kc, vc), None

        (kcache, vcache), _ = jax.lax.scan(
            prefill, (kcache, vcache), jnp.arange(p - 1)
        )

    def step(carry, pos):
        tokens, scores, finished, lens, kcache, vcache = carry
        pos_idx = jnp.full((b, n, 1), 0, jnp.int32) + pos
        cur = jnp.take_along_axis(tokens, pos_idx, axis=2)[..., 0]  # [B, N]
        lp, kcache, vcache = model.apply(
            params, cur.reshape(b * n), pos, kcache, vcache, mem_k, mem_v, mem_mask,
            method="decoder_one_step",
        )
        lp = lp.reshape(b, n, -1)  # [B, N, V]
        # finished hyps: only eos continuation at zero cost
        eos_only = jnp.full_like(lp, _NEG).at[:, :, eos_id].set(0.0)
        lp = jnp.where(finished[..., None], eos_only, lp)

        top_lp, top_tok = jax.lax.top_k(lp, n)  # [B, N, k=n]
        cand_scores = (scores[..., None] + top_lp).reshape(b, n * n)
        new_scores, sel = jax.lax.top_k(cand_scores, n)  # [B, N]
        src_hyp = sel // n  # originating hypothesis
        sel_tok = jnp.take_along_axis(top_tok.reshape(b, n * n), sel, axis=1)

        # reindex hypothesis state
        tokens = jnp.take_along_axis(tokens, src_hyp[..., None], axis=1)
        finished = jnp.take_along_axis(finished, src_hyp, axis=1)
        lens = jnp.take_along_axis(lens, src_hyp, axis=1)

        def reindex(c):
            cc = c.reshape((c.shape[0], b, n) + c.shape[2:])
            idx = src_hyp[None, :, :, None, None, None]
            cc = jnp.take_along_axis(cc, idx, axis=2)
            return cc.reshape(c.shape)

        kcache = reindex(kcache)
        vcache = reindex(vcache)

        write_pos = jnp.minimum(pos + 1, lmax - 1)
        tokens = jnp.where(
            (jnp.arange(lmax)[None, None, :] == write_pos),
            sel_tok[..., None],
            tokens,
        )
        now_finished = finished | (sel_tok == eos_id)
        lens = jnp.where(finished, lens, jnp.where(sel_tok == eos_id, lens, lens + 1))
        return (tokens, new_scores, now_finished, lens, kcache, vcache), None

    carry = (tokens, scores, finished, lens, kcache, vcache)
    carry, _ = jax.lax.scan(step, carry, (p - 1) + jnp.arange(max_len))
    tokens, scores, finished, lens, _, _ = carry

    if length_penalty != 0.0:
        # search.py:352-355: score / (#non-eos tokens)^alpha; the reference's
        # count includes the prompt prefix, reproduced here
        scores = scores / jnp.power(
            jnp.maximum(lens + p, 1).astype(scores.dtype), length_penalty
        )
    best = jnp.argmax(scores, axis=1)
    best_tokens = jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0, p:]
    best_lens = jnp.take_along_axis(lens, best[:, None], axis=1)[:, 0]
    # strip anything after the first eos (tokens buffer is eos-padded)
    valid = jnp.arange(max_len)[None, :] < best_lens[:, None]
    best_tokens = jnp.where(valid, best_tokens, 0)
    return best_tokens, best_lens, scores
