"""Multi-method decode dispatch.

Parity: wenet ASRModel.decode(methods=[...]) (asr_model.py:262-338) — run any
subset of decoders over one encoder pass and return results per method. All
methods are the framework's batched jit implementations.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from tpuasr.decode.attention_beam import attention_beam_search
from tpuasr.decode.ctc_greedy import ctc_greedy_decode
from tpuasr.decode.ctc_prefix_beam import ctc_prefix_beam_search
from tpuasr.models.asr_model import attention_rescoring


def decode_aed(
    model,  # ASRModel
    params,
    feats: jnp.ndarray,
    feat_lens: jnp.ndarray,
    methods: Sequence[str] = ("ctc_greedy_search",),
    beam_size: int = 10,
    max_tokens: int = 64,
    ctc_weight: float = 0.5,
    context_graph=None,
    return_times: bool = False,
) -> dict:
    """-> {method: (tokens [B, U], lens [B])} for any of
    {ctc_greedy_search, ctc_prefix_beam_search, attention, attention_rescoring}.

    With ``return_times=True`` the CTC-derived methods return
    (tokens, lens, times) — per-token frame indices (greedy emission frames;
    prefix-beam/rescoring viterbi peak frames carried through n-best
    selection, the wenet DecodeResult.times role)."""
    cfg = model.cfg
    enc, enc_lens = model.apply(params, feats, feat_lens, method="encode")
    results: dict = {}

    need_ctc = {"ctc_greedy_search", "ctc_prefix_beam_search", "attention_rescoring"}
    lp = None
    if need_ctc & set(methods):
        logits = model.apply(params, enc, method="ctc_logits")
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    nbest = nb_times = None
    if "ctc_greedy_search" in methods:
        if return_times:
            g_tok, g_len, g_times, _ = ctc_greedy_decode(
                lp, enc_lens, cfg.blank_id, with_details=True
            )
            results["ctc_greedy_search"] = (g_tok, g_len, g_times)
        else:
            results["ctc_greedy_search"] = ctc_greedy_decode(lp, enc_lens, cfg.blank_id)
    if {"ctc_prefix_beam_search", "attention_rescoring"} & set(methods):
        if return_times:
            best_tok, best_len, best_times, (nb_tok, nb_len, nb_score, nb_times) = \
                ctc_prefix_beam_search(
                    lp, enc_lens, cfg.blank_id, beam_size, max_tokens,
                    context_graph=context_graph, return_times=True,
                )
            nbest = (nb_tok, nb_len, nb_score)
            if "ctc_prefix_beam_search" in methods:
                results["ctc_prefix_beam_search"] = (best_tok, best_len, best_times)
        else:
            best_tok, best_len, nbest = ctc_prefix_beam_search(
                lp, enc_lens, cfg.blank_id, beam_size, max_tokens,
                context_graph=context_graph,
            )
            if "ctc_prefix_beam_search" in methods:
                results["ctc_prefix_beam_search"] = (best_tok, best_len)
    if "attention" in methods:
        tok, lens, _ = attention_beam_search(
            model, params, enc, enc_lens, cfg.sos_id, cfg.eos_id, beam_size,
            max_tokens,
        )
        results["attention"] = (tok, lens)
    if "attention_rescoring" in methods:
        nb_tok, nb_len, nb_score = nbest
        r_enc, r_lens = enc, enc_lens
        if getattr(cfg, "apply_non_blank_embedding", False):
            # rescore over the blank-filtered frames the decoder was trained
            # on (asr_model.py:332-334; updated lengths used, see
            # filter_blank_embedding)
            from tpuasr.models.asr_model import filter_blank_embedding

            r_enc, r_lens = filter_blank_embedding(lp, enc, enc_lens, cfg.blank_id)
        # fuse the R2L decoder's scores when the model has one (same rule as
        # eval/cer_eval.py — keep the two entry points in agreement)
        rw = (getattr(cfg, "reverse_weight", 0.0)
              if getattr(cfg, "r_decoder_blocks", 0) > 0 else 0.0)
        tok, lens, total = attention_rescoring(
            model, params, r_enc, r_lens, nb_tok, nb_len, nb_score, ctc_weight,
            reverse_weight=rw,
        )
        if return_times:
            # times follow the selected hypothesis (wenet search.py:448-451:
            # DecodeResult.times = nbest_times[best])
            best = jnp.argmax(total, axis=1)
            times = jnp.take_along_axis(nb_times, best[:, None, None], axis=1)[:, 0]
            results["attention_rescoring"] = (tok, lens, times)
        else:
            results["attention_rescoring"] = (tok, lens)
    return results
