"""Batched, jit-compiled frame-synchronous RNN-T beam search.

Parity targets: the reference's streaming chunk beam search
(model/online_rnnt_model.py:389-522 — per-hypothesis predictor states,
blank/non-blank expansion, dedup by token tuple, keep beam_size) and wenet's
PrefixBeamSearch (wenet/transducer/search/prefix_beam_search.py:7-148 —
breadth-first beam with one emission per frame, prefix merge via log-add).

TPU design (SURVEY §7 hard-part 3): the reference deep-copies LSTM states per
hypothesis per frame in Python (online_rnnt_model.py:427, 524-532) — launch
overhead dominated. Here hypothesis state is dense tensors:

  tokens [B, N, Umax] / lens [B, N] / logp [B, N] / LSTM state [L, B, N, H]

advanced with batched matmuls over B*N lanes and gathered (not copied) on
beam selection. Per frame: every live hyp proposes `blank` (state frozen) and
the top-k non-blank extensions (state advanced); identical-prefix candidates
merge via logaddexp. Duplicate detection compares O(1)-updated rolling
hashes of the token sequences (two independent uint32 streams + length +
frame phase) — C x C scalar compares, C = N * (k + 1), instead of the
O(C^2 * Umax) token-array compare; top-N survive.

Emission policy: one non-blank emission per frame (wenet PrefixBeamSearch's
simplification, prefix_beam_search.py:75-77). RNN-T can in principle emit
several tokens per frame; greedy decode here supports n_steps > 1, and the
beam can be extended the same way in a later pass if CER demands it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

_NEG = -1.0e30


_HASH_MULTS = (1000003, 2654435761)  # two independent rolling-hash streams


@dataclass
class BeamCarry:
    tokens: jnp.ndarray  # [B, N, Umax] int32
    lens: jnp.ndarray  # [B, N] int32
    logp: jnp.ndarray  # [B, N] f32
    pred_state: Any  # ([L, B, N, H], [L, B, N, H])
    # rolling hashes of the token sequence (uint32 x2), updated in O(1) per
    # extension; duplicate detection compares hashes instead of U-length
    # token arrays, dropping the per-frame dedup from O(C^2 * U) to O(C^2)
    seq_hash: jnp.ndarray  # [B, N, 2] uint32


jax.tree_util.register_dataclass(
    BeamCarry,
    data_fields=["tokens", "lens", "logp", "pred_state", "seq_hash"],
    meta_fields=[],
)


def _extend_hash(h: jnp.ndarray, tok: jnp.ndarray) -> jnp.ndarray:
    """h [..., 2] uint32, tok [...] int32 -> hashes of sequence + [tok]."""
    t = (tok.astype(jnp.uint32) + jnp.uint32(1))[..., None]
    mults = jnp.asarray(_HASH_MULTS, jnp.uint32)
    return h * mults + t


def init_beam_carry(model, params, batch: int, beam: int, max_tokens: int) -> BeamCarry:
    from tpuasr.decode.state_utils import predictor_state_axis, split_beam_axis

    ps = model.apply(params, batch * beam, method="init_predictor_state")
    ps = split_beam_axis(ps, batch, beam, predictor_state_axis(model))
    logp = jnp.full((batch, beam), _NEG).at[:, 0].set(0.0)
    return BeamCarry(
        tokens=jnp.zeros((batch, beam, max_tokens), jnp.int32),
        lens=jnp.zeros((batch, beam), jnp.int32),
        logp=logp,
        pred_state=ps,
        seq_hash=jnp.zeros((batch, beam, 2), jnp.uint32),
    )


def _merge_duplicates(keys, lens, logp):
    """logaddexp-merge candidates with identical sequences.

    keys [B, C, K] (rolling hashes or any per-candidate signature), lens
    [B, C] (any extra scalar key, e.g. length + phase), logp [B, C] ->
    merged logp with duplicates (non-first occurrences) squashed to -inf.
    O(C^2) pairs with an O(K) compare — K is 2 hash lanes, not Umax.
    """
    same_tok = jnp.all(keys[:, :, None, :] == keys[:, None, :, :], axis=-1)
    same = same_tok & (lens[:, :, None] == lens[:, None, :])  # [B, C, C]
    c = keys.shape[1]
    idx = jnp.arange(c)
    # first occurrence index for each candidate j
    first = jnp.argmax(same, axis=1)  # [B, C] (first True along i)
    contrib = first[:, None, :] == idx[None, :, None]  # [B, C(i), C(j)]
    cand = jnp.where(contrib, logp[:, None, :], _NEG)
    m = jnp.max(cand, axis=-1)
    m_safe = jnp.maximum(m, _NEG)
    merged = m_safe + jnp.log(jnp.sum(jnp.exp(cand - m_safe[..., None]), axis=-1))
    is_first = first == idx[None, :]
    return jnp.where(is_first, merged, _NEG)


def beam_frames(
    model,
    params,
    enc_frames: jnp.ndarray,  # [B, F, D]
    frame_valid: jnp.ndarray,  # [B, F] bool
    carry: BeamCarry,
    blank_id: int,
    expand_k: int | None = None,
    n_steps: int = 1,
    ctc_logp: jnp.ndarray | None = None,  # [B, F, V] frame CTC log-probs
    transducer_weight: float = 0.7,
    ctc_weight: float = 0.3,
) -> BeamCarry:
    """Advance the beam over F encoder frames.

    `n_steps` > 1 allows multiple non-blank emissions per frame (the
    reference online beam's inner expansion, online_rnnt_model.py:433-499):
    each sub-step expands hypotheses that have not yet taken this frame's
    blank, with a done-flag in the dedup key so frame phases never merge.

    `ctc_logp` enables per-frame CTC shallow fusion
    (wenet/transducer/search/prefix_beam_search.py:99-101):
    ``log(tw * e^rnnt + cw * e^ctc)`` replaces the pure transducer
    log-probs for both the blank and the non-blank expansions."""
    from tpuasr.decode.state_utils import (
        gather_beam, merge_beam_axis, predictor_state_axis, split_beam_axis,
        where_beam,
    )

    b, f, _ = enc_frames.shape
    n = carry.logp.shape[1]
    umax = carry.tokens.shape[2]
    k = expand_k if expand_k is not None else n
    st_axis = predictor_state_axis(model)

    enc_proj = model.apply(params, enc_frames, method=lambda m, e: m.joint.project_enc(e))

    def pred_step(tokens, state):
        return model.apply(params, tokens, state, None, method="predict_step")

    def joint_from_proj(enc_p, pred_out):
        def run(m, e, p):
            return m.joint.head_from_projected(e + m.joint.project_pred(p))

        return model.apply(params, enc_p, pred_out, method=run)

    log_tw = jnp.log(jnp.asarray(max(transducer_weight, 1e-10), jnp.float32))
    log_cw = jnp.log(jnp.asarray(max(ctc_weight, 1e-10), jnp.float32))

    def expand_once(carry: BeamCarry, done, enc_p_t, ctc_t=None):
        """One expansion sub-step. `done` hyps (already took blank this frame)
        pass through unchanged; others propose blank (-> done) and top-k
        non-blank extensions (-> still expandable)."""
        last = jnp.take_along_axis(
            carry.tokens, jnp.maximum(carry.lens - 1, 0)[..., None], axis=2
        )[..., 0]
        last = jnp.where(carry.lens > 0, last, blank_id)  # [B, N]

        flat_state = merge_beam_axis(carry.pred_state, st_axis)
        pred_out, new_flat_state = pred_step(last.reshape(b * n), flat_state)
        pred_out = pred_out.reshape(b, n, -1)
        adv_state = split_beam_axis(new_flat_state, b, n, st_axis)

        logits = joint_from_proj(
            jnp.repeat(enc_p_t[:, None, :], n, axis=1), pred_out
        )  # [B, N, V]
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if ctc_t is not None:
            # per-frame CTC shallow fusion (prefix_beam_search.py:99-101)
            lp = jnp.logaddexp(log_tw + lp, log_cw + ctc_t[:, None, :])

        # candidate 0: blank for expandable hyps / free pass-through for done
        blank_logp = carry.logp + jnp.where(done, 0.0, lp[..., blank_id])
        # top-k non-blank extensions (masked out for done hyps)
        lp_nb = lp.at[..., blank_id].set(_NEG)
        top_lp, top_tok = jax.lax.top_k(lp_nb, k)  # [B, N, k]
        can_extend = (carry.lens < umax) & ~done
        ext_logp = jnp.where(
            can_extend[..., None], carry.logp[..., None] + top_lp, _NEG
        )

        extended = jax.vmap(_extend, in_axes=(0, 0, 0, None))(
            carry.tokens, carry.lens, top_tok, umax
        )  # [B, N, k, U]
        cand_tokens = jnp.concatenate(
            [carry.tokens[:, :, None, :], extended], axis=2
        ).reshape(b, n * (1 + k), umax)
        cand_lens = jnp.concatenate(
            [carry.lens[:, :, None], (carry.lens + 1)[:, :, None].repeat(k, 2)], axis=2
        ).reshape(b, n * (1 + k))
        cand_logp = jnp.concatenate(
            [blank_logp[:, :, None], ext_logp], axis=2
        ).reshape(b, n * (1 + k))
        ext_hash = _extend_hash(carry.seq_hash[:, :, None, :], top_tok)  # [B,N,k,2]
        cand_hash = jnp.concatenate(
            [carry.seq_hash[:, :, None, :], ext_hash], axis=2
        ).reshape(b, n * (1 + k), 2)
        cand_from_hyp = jnp.arange(n)[:, None].repeat(1 + k, 1).reshape(-1)  # [C]
        cand_is_blank = (
            jnp.arange(1 + k)[None, :].repeat(n, 0).reshape(-1) == 0
        )  # [C]
        # resulting done flag: blank/pass-through slots are done
        cand_done = jnp.broadcast_to(cand_is_blank[None, :], (b, n * (1 + k)))

        # dedup key includes the done flag (same prefix, different frame phase
        # must not merge)
        merged = _merge_duplicates(
            cand_hash, cand_lens * 2 + cand_done.astype(cand_lens.dtype), cand_logp
        )
        new_logp, sel = jax.lax.top_k(merged, n)  # [B, N]

        sel_tokens = jnp.take_along_axis(cand_tokens, sel[..., None], axis=1)
        sel_lens = jnp.take_along_axis(cand_lens, sel, axis=1)
        sel_hash = jnp.take_along_axis(cand_hash, sel[..., None], axis=1)
        sel_hyp = cand_from_hyp[sel]  # [B, N] source hyp index
        sel_blank = cand_is_blank[sel]  # [B, N]
        sel_done = jnp.take_along_axis(cand_done, sel, axis=1)

        adv_sel = gather_beam(adv_state, sel_hyp, st_axis)
        old_sel = gather_beam(carry.pred_state, sel_hyp, st_axis)
        new_state = where_beam(sel_blank, old_sel, adv_sel, st_axis)

        return (
            BeamCarry(tokens=sel_tokens, lens=sel_lens, logp=new_logp,
                      pred_state=new_state, seq_hash=sel_hash),
            sel_done,
        )

    def frame_step(carry: BeamCarry, inputs):
        enc_p_t, active, ctc_t = inputs  # [B, Dj], [B], [B, V]|None

        if n_steps <= 1:
            new_carry, _ = expand_once(carry, jnp.zeros((b, n), bool), enc_p_t, ctc_t)
        else:
            def cond(s):
                _, done, i = s
                return (i < n_steps) & jnp.any(~done)

            def body(s):
                c, done, i = s
                c, done = expand_once(c, done, enc_p_t, ctc_t)
                return (c, done, i + 1)

            new_carry, _, _ = jax.lax.while_loop(
                cond, body, (carry, jnp.zeros((b, n), bool), jnp.int32(0))
            )

        # inactive frames: carry through untouched
        keep = active.reshape(b, 1)
        keep_bn = jnp.broadcast_to(keep, (b, n))
        out = BeamCarry(
            tokens=jnp.where(keep[..., None], new_carry.tokens, carry.tokens),
            lens=jnp.where(keep, new_carry.lens, carry.lens),
            logp=jnp.where(keep, new_carry.logp, carry.logp),
            pred_state=where_beam(keep_bn, new_carry.pred_state, carry.pred_state, st_axis),
            seq_hash=jnp.where(keep[..., None], new_carry.seq_hash, carry.seq_hash),
        )
        return out, None

    xs = (
        jnp.swapaxes(enc_proj, 0, 1),
        jnp.swapaxes(frame_valid, 0, 1),
        None if ctc_logp is None else jnp.swapaxes(ctc_logp, 0, 1),
    )
    carry, _ = jax.lax.scan(frame_step, carry, xs)
    return carry


def _extend(tokens, lens, top_tok, umax):
    """tokens [N, U], lens [N], top_tok [N, k] -> [N, k, U] extended copies."""
    n, u = tokens.shape
    k = top_tok.shape[1]
    base = jnp.broadcast_to(tokens[:, None, :], (n, k, u))
    slot = jnp.minimum(lens, u - 1)  # [N]
    onehot = jax.nn.one_hot(slot, u, dtype=tokens.dtype)  # [N, U]
    return base * (1 - onehot[:, None, :]) + top_tok[..., None] * onehot[:, None, :]


def rnnt_beam_decode(
    model,
    params,
    enc_out: jnp.ndarray,  # [B, T, D]
    enc_lens: jnp.ndarray,  # [B]
    blank_id: int,
    beam_size: int = 4,
    max_tokens: int = 200,
    n_steps: int = 1,
    ctc_weight: float = 0.0,
    transducer_weight: float = 0.7,
):
    """Offline beam search -> (best tokens [B, max_tokens], lens [B],
    nbest tokens [B, N, max_tokens], nbest lens, nbest logp).

    `ctc_weight > 0` turns on per-frame CTC shallow fusion over the model's
    CTC head (wenet transducer beam_search ctc_weight/transducer_weight,
    transducer.py:215-262 + prefix_beam_search.py:99-101)."""
    b, t, _ = enc_out.shape
    carry = init_beam_carry(model, params, b, beam_size, max_tokens)
    valid = jnp.arange(t)[None, :] < enc_lens[:, None]
    ctc_logp = None
    if ctc_weight > 0:
        ctc_logits = model.apply(params, enc_out, method="ctc_logits")
        ctc_logp = jax.nn.log_softmax(ctc_logits.astype(jnp.float32), axis=-1)
    carry = beam_frames(model, params, enc_out, valid, carry, blank_id,
                        n_steps=n_steps, ctc_logp=ctc_logp,
                        transducer_weight=transducer_weight,
                        ctc_weight=ctc_weight)
    best = jnp.argmax(carry.logp, axis=1)
    best_tokens = jnp.take_along_axis(carry.tokens, best[:, None, None], axis=1)[:, 0]
    best_lens = jnp.take_along_axis(carry.lens, best[:, None], axis=1)[:, 0]
    return best_tokens, best_lens, carry.tokens, carry.lens, carry.logp
