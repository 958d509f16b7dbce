"""Batched, jit-compiled CTC prefix beam search.

Parity: wenet/transformer/search.py:125-247 — per-frame prefix expansion with
the blank/repeat/new-prefix probability algebra (scores split into
"ending in blank" pb and "ending in non-blank" pnb), prefix merging, top-N
pruning. The reference keeps python dict prefixes per utterance; here the
beam is dense tensors [B, N, Umax] (+ pb/pnb [B, N]) and the whole batch
advances per frame in one fused program:

  - stay-candidates: same prefix; pb' = (pb ⊕ pnb) + lp[blank],
    pnb' = pnb + lp[last] (repeat merge);
  - extend-candidates (top-k tokens, k = beam): prefix+u with
    pnb' = (u == last ? pb : pb ⊕ pnb) + lp[u];
  - duplicate prefixes merge via logaddexp; survivors = top-N by pb ⊕ pnb.
    Duplicates are detected by O(1)-updated rolling sequence hashes
    (2 uint32 streams + length, as in decode/rnnt_beam.py) — C x C scalar
    compares instead of O(C^2 * Umax) token-array compares.

Hotword ContextGraph biasing (wenet context_graph.py) hooks in at the
extend-candidate scores via the `context_graph` argument below: each beam
carries its dense Aho-Corasick state and accumulated bias, applied/backed-off
exactly as wenet does at search.py:99-104, 169-231.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

_NEG = -1.0e30


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, _NEG)
    return m_safe + jnp.log1p(jnp.exp(jnp.minimum(a, b) - m_safe))


@dataclass
class PrefixBeam:
    tokens: jnp.ndarray  # [B, N, Umax]
    lens: jnp.ndarray  # [B, N]
    pb: jnp.ndarray  # [B, N] log prob of prefix ending in blank
    pnb: jnp.ndarray  # [B, N] log prob of prefix ending in its last token
    node: jnp.ndarray  # [B, N] context-graph state (0 when no graph)
    bias: jnp.ndarray  # [B, N] accumulated hotword bias score
    # rolling hashes of the prefix (2 independent uint32 streams, O(1) per
    # extension); duplicate prefixes are detected by (hash, len) equality —
    # C x C scalar compares instead of O(C^2 * Umax) token-array compares
    # (same scheme as decode/rnnt_beam.py)
    seq_hash: jnp.ndarray  # [B, N, 2] uint32


jax.tree_util.register_dataclass(
    PrefixBeam,
    data_fields=["tokens", "lens", "pb", "pnb", "node", "bias", "seq_hash"],
    meta_fields=[],
)


def _first_occurrence_merge(keys, lens, pb, pnb):
    """Merge identical prefixes (same (hash-keys, len)): logaddexp pb's and
    pnb's into the first occurrence, squash the rest to -inf. Also returns
    the contribution matrix [B, C(i), C(j)] (candidate j merges into
    first-occurrence i) and the is_first mask for callers merging additional
    per-candidate state."""
    same = jnp.all(keys[:, :, None, :] == keys[:, None, :, :], axis=-1)
    same = same & (lens[:, :, None] == lens[:, None, :])
    c = keys.shape[1]
    idx = jnp.arange(c)
    first = jnp.argmax(same, axis=1)  # [B, C]
    contrib = first[:, None, :] == idx[None, :, None]  # [B, C(i), C(j)]

    def merge(scores):
        cand = jnp.where(contrib, scores[:, None, :], _NEG)
        m = jnp.maximum(jnp.max(cand, axis=-1), _NEG)
        return m + jnp.log(jnp.sum(jnp.exp(cand - m[..., None]), axis=-1))

    is_first = first == idx[None, :]
    return (
        jnp.where(is_first, merge(pb), _NEG),
        jnp.where(is_first, merge(pnb), _NEG),
        contrib,
        is_first,
    )


def ctc_prefix_beam_search(
    log_probs: jnp.ndarray,  # [B, T, V]
    lens: jnp.ndarray,  # [B]
    blank_id: int,
    beam_size: int = 10,
    max_tokens: int = 200,
    context_graph=None,  # tpuasr.decode.context_graph.ContextGraph
    return_times: bool = False,
):
    """-> (best tokens [B, max_tokens], best lens [B],
           nbest (tokens [B, N, max_tokens], lens [B, N], scores [B, N])).

    With `return_times=True`, per-token viterbi peak frames are tracked
    through the search (wenet PrefixScore v_s/v_ns/times_s/times_ns algebra,
    search.py:60-88, 160-220: each prefix carries the max-prob single path
    ending in blank and in non-blank, each with its token emission frames)
    and the return becomes
    (best tokens, best lens, best times [B, max_tokens],
     nbest (tokens, lens, scores, times [B, N, max_tokens])).
    One deliberate deviation: the reference resets `cur_token_prob` on every
    frame (its dict entries are rebuilt per frame), so a repeated token's
    time follows the *last* repeat frame; here the running peak propagates
    across frames, so the time lands on the *loudest* frame of the run —
    the documented intent of the field.

    With `context_graph`, extensions accrue hotword bias scores
    (wenet/transformer/search.py:99-104 parity); the final ranking includes
    the finalize correction removing dangling partial-match bonuses."""
    b, t, v = log_probs.shape
    n = beam_size
    umax = max_tokens

    if context_graph is not None:
        cg_next = jnp.asarray(context_graph.next_state)
        cg_delta = jnp.asarray(context_graph.score_delta)
        cg_final = jnp.asarray(context_graph.finalize_score)
    beam0 = PrefixBeam(
        tokens=jnp.zeros((b, n, umax), jnp.int32),
        lens=jnp.zeros((b, n), jnp.int32),
        pb=jnp.full((b, n), _NEG).at[:, 0].set(0.0),
        pnb=jnp.full((b, n), _NEG),
        node=jnp.zeros((b, n), jnp.int32),
        bias=jnp.zeros((b, n), jnp.float32),
        seq_hash=jnp.zeros((b, n, 2), jnp.uint32),
    )
    vit0 = None
    if return_times:
        vit0 = {
            # root: v_s = v_ns = 0 (search.py:145-147), dead slots -inf
            "v_s": jnp.full((b, n), _NEG).at[:, 0].set(0.0),
            "v_ns": jnp.full((b, n), _NEG).at[:, 0].set(0.0),
            "times_s": jnp.zeros((b, n, umax), jnp.int32),
            "times_ns": jnp.zeros((b, n, umax), jnp.int32),
            "cur": jnp.full((b, n), _NEG),  # prob of the current last token
        }

    def frame_step(carry, inputs):
        beam, vit = carry
        lp, active, t_idx = inputs  # [B, V], [B], scalar frame index
        last = jnp.take_along_axis(
            beam.tokens, jnp.maximum(beam.lens - 1, 0)[..., None], axis=2
        )[..., 0]
        last = jnp.where(beam.lens > 0, last, blank_id)  # [B, N]
        lp_last = jnp.take_along_axis(lp, last, axis=1)  # [B, N]
        total = _logaddexp(beam.pb, beam.pnb)

        # stay candidates
        stay_pb = total + lp[:, blank_id][:, None]
        stay_pnb = jnp.where(beam.lens > 0, beam.pnb + lp_last, _NEG)

        # extend candidates: top-k non-blank tokens
        lp_nb = lp.at[:, blank_id].set(_NEG)
        top_lp, top_tok = jax.lax.top_k(lp_nb, n)  # [B, k]
        is_repeat = top_tok[:, None, :] == last[:, :, None]  # [B, N, k]
        base = jnp.where(is_repeat, beam.pb[..., None], total[..., None])
        can_extend = beam.lens < umax
        ext_pnb = jnp.where(can_extend[..., None], base + top_lp[:, None, :], _NEG)

        from tpuasr.decode.rnnt_beam import _extend, _extend_hash

        extended = jax.vmap(_extend, in_axes=(0, 0, 0, None))(
            beam.tokens, beam.lens, jnp.broadcast_to(top_tok[:, None, :], (b, n, n)), umax
        )  # [B, N, k, U]
        ext_hash = _extend_hash(
            beam.seq_hash[:, :, None, :], top_tok[:, None, :]
        )  # [B, N, k, 2]

        cand_tokens = jnp.concatenate(
            [beam.tokens[:, :, None, :], extended], axis=2
        ).reshape(b, n * (1 + n), umax)
        cand_lens = jnp.concatenate(
            [beam.lens[:, :, None], (beam.lens + 1)[:, :, None].repeat(n, 2)], axis=2
        ).reshape(b, n * (1 + n))
        cand_pb = jnp.concatenate(
            [stay_pb[:, :, None], jnp.full((b, n, n), _NEG)], axis=2
        ).reshape(b, n * (1 + n))
        cand_pnb = jnp.concatenate([stay_pnb[:, :, None], ext_pnb], axis=2).reshape(
            b, n * (1 + n)
        )
        cand_hash = jnp.concatenate(
            [beam.seq_hash[:, :, None, :], ext_hash], axis=2
        ).reshape(b, n * (1 + n), 2)
        if context_graph is not None:
            ext_node = cg_next[beam.node[..., None], top_tok[:, None, :]]  # [B,N,k]
            ext_bias = beam.bias[..., None] + cg_delta[beam.node[..., None], top_tok[:, None, :]]
            cand_node = jnp.concatenate(
                [beam.node[:, :, None], ext_node], axis=2
            ).reshape(b, n * (1 + n))
            cand_bias = jnp.concatenate(
                [beam.bias[:, :, None], ext_bias], axis=2
            ).reshape(b, n * (1 + n))
        else:
            cand_node = jnp.zeros((b, n * (1 + n)), jnp.int32)
            cand_bias = jnp.zeros((b, n * (1 + n)), jnp.float32)

        if vit is not None:
            v_s, v_ns, cur = vit["v_s"], vit["v_ns"], vit["cur"]
            times_s, times_ns = vit["times_s"], vit["times_ns"]
            vbest = jnp.maximum(v_s, v_ns)
            times_best = jnp.where((v_s > v_ns)[..., None], times_s, times_ns)
            # stay/blank: best path + blank, times unchanged (search.py:166-167)
            stay_v_s = vbest + lp[:, blank_id][:, None]
            # stay/repeat: non-blank path repeats the last token; its peak
            # frame moves here when this frame is the loudest of the run
            # (search.py:176-184)
            stay_v_ns = jnp.where(beam.lens > 0, v_ns + lp_last, _NEG)
            rep_better = lp_last > cur
            slot = (
                jnp.arange(umax)[None, None, :]
                == jnp.maximum(beam.lens - 1, 0)[..., None]
            )
            stay_times_ns = jnp.where(slot & rep_better[..., None], t_idx, times_ns)
            stay_cur = jnp.maximum(cur, lp_last)
            # extend: from the blank path when u == last (search.py:189-196),
            # else from the best path (search.py:202-212); u's time = now
            ext_v = jnp.where(is_repeat, v_s[..., None], vbest[..., None])
            ext_v = jnp.where(can_extend[..., None], ext_v + top_lp[:, None, :], _NEG)
            ext_base = jnp.where(
                is_repeat[..., None], times_s[:, :, None, :], times_best[:, :, None, :]
            )
            eslot = (
                jnp.arange(umax)[None, None, None, :]
                == beam.lens[:, :, None, None]
            )
            ext_times = jnp.where(
                eslot, t_idx, jnp.broadcast_to(ext_base, (b, n, n, umax))
            )
            cand_v_s = jnp.concatenate(
                [stay_v_s[:, :, None], jnp.full((b, n, n), _NEG)], axis=2
            ).reshape(b, -1)
            cand_v_ns = jnp.concatenate(
                [stay_v_ns[:, :, None], ext_v], axis=2
            ).reshape(b, -1)
            cand_times_s = jnp.concatenate(
                [times_best[:, :, None, :], ext_times], axis=2
            ).reshape(b, -1, umax)
            cand_times_ns = jnp.concatenate(
                [stay_times_ns[:, :, None, :], ext_times], axis=2
            ).reshape(b, -1, umax)
            cand_cur = jnp.concatenate(
                [stay_cur[:, :, None], jnp.broadcast_to(top_lp[:, None, :], (b, n, n))],
                axis=2,
            ).reshape(b, -1)

        m_pb, m_pnb, contrib, is_first = _first_occurrence_merge(
            cand_hash, cand_lens, cand_pb, cand_pnb
        )
        score = _logaddexp(m_pb, m_pnb) + cand_bias
        _, sel = jax.lax.top_k(score, n)
        new = PrefixBeam(
            tokens=jnp.take_along_axis(cand_tokens, sel[..., None], axis=1),
            lens=jnp.take_along_axis(cand_lens, sel, axis=1),
            pb=jnp.take_along_axis(m_pb, sel, axis=1),
            pnb=jnp.take_along_axis(m_pnb, sel, axis=1),
            node=jnp.take_along_axis(cand_node, sel, axis=1),
            bias=jnp.take_along_axis(cand_bias, sel, axis=1),
            seq_hash=jnp.take_along_axis(cand_hash, sel[..., None], axis=1),
        )
        keep = active[:, None]
        beam_out = PrefixBeam(
            tokens=jnp.where(keep[..., None], new.tokens, beam.tokens),
            lens=jnp.where(keep, new.lens, beam.lens),
            pb=jnp.where(keep, new.pb, beam.pb),
            pnb=jnp.where(keep, new.pnb, beam.pnb),
            node=jnp.where(keep, new.node, beam.node),
            bias=jnp.where(keep, new.bias, beam.bias),
            seq_hash=jnp.where(keep[..., None], new.seq_hash, beam.seq_hash),
        )
        vit_out = None
        if vit is not None:
            # viterbi merge = max over contributors; times/cur follow the
            # argmax contributor (the dict-entry compare-and-assign of
            # search.py:176-212 expressed densely)
            def vmerge(vs, times, tok_lp=None):
                cand = jnp.where(contrib, vs[:, None, :], _NEG)
                src = jnp.argmax(cand, axis=-1)  # [B, C]
                merged = jnp.where(is_first, jnp.max(cand, axis=-1), _NEG)
                merged = jnp.take_along_axis(merged, sel, axis=1)
                mt = jnp.take_along_axis(times, src[..., None], axis=1)
                mt = jnp.take_along_axis(mt, sel[..., None], axis=1)
                if tok_lp is None:
                    return merged, mt
                mc = jnp.take_along_axis(
                    jnp.take_along_axis(tok_lp, src, axis=1), sel, axis=1
                )
                return merged, mt, mc

            nv_s, nt_s = vmerge(cand_v_s, cand_times_s)
            nv_ns, nt_ns, ncur = vmerge(cand_v_ns, cand_times_ns, cand_cur)
            vit_out = {
                "v_s": jnp.where(keep, nv_s, v_s),
                "v_ns": jnp.where(keep, nv_ns, v_ns),
                "times_s": jnp.where(keep[..., None], nt_s, times_s),
                "times_ns": jnp.where(keep[..., None], nt_ns, times_ns),
                "cur": jnp.where(keep, ncur, cur),
            }
        return (beam_out, vit_out), None

    valid = jnp.arange(t)[None, :] < lens[:, None]
    xs = (
        jnp.swapaxes(log_probs, 0, 1),
        jnp.swapaxes(valid, 0, 1),
        jnp.arange(t, dtype=jnp.int32),
    )
    (beam, vit), _ = jax.lax.scan(frame_step, (beam0, vit0), xs)

    score = _logaddexp(beam.pb, beam.pnb) + beam.bias
    if context_graph is not None:
        score = score + cg_final[beam.node]
    best = jnp.argmax(score, axis=1)
    best_tokens = jnp.take_along_axis(beam.tokens, best[:, None, None], axis=1)[:, 0]
    best_lens = jnp.take_along_axis(beam.lens, best[:, None], axis=1)[:, 0]
    if return_times:
        nb_times = jnp.where(
            (vit["v_s"] > vit["v_ns"])[..., None], vit["times_s"], vit["times_ns"]
        )
        best_times = jnp.take_along_axis(nb_times, best[:, None, None], axis=1)[:, 0]
        return best_tokens, best_lens, best_times, (
            beam.tokens, beam.lens, score, nb_times,
        )
    return best_tokens, best_lens, (beam.tokens, beam.lens, score)
