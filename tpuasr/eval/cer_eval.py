"""Offline evaluation: batched decode -> corpus CER with S/D/I breakdown.

Parity: rnnt_eval.py:59-161 — decode dev/test via CTC greedy or RNN-T
greedy/beam, dump REF/HYP samples, corpus CER = Σ(S+D+I)/ΣN. Decoding is the
framework's batched jit path (one XLA program per bucket) instead of the
reference's per-utterance python loops.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.audio import fbank_batch
from tpuasr.config import Config
from tpuasr.decode import ctc_greedy_decode, rnnt_greedy_decode
from tpuasr.decode.rnnt_beam import rnnt_beam_decode
from tpuasr.text.cer import CerCounts, cer_details


@dataclass
class EvalResult:
    counts: CerCounts
    samples: list = field(default_factory=list)  # (utt_id, ref, hyp)

    @property
    def cer(self) -> float:
        return self.counts.cer


def _strip_specials(ids, tokenizer):
    specials = set(tokenizer.special_token_ids())
    return [i for i in ids if i not in specials]


def evaluate_offline(
    model,
    params,
    batches: Iterable[dict],
    cfg: Config,
    tokenizer,
    mode: str = "rnnt_greedy",  # ctc_greedy | rnnt_greedy | rnnt_beam
    beam_size: int = 4,
    n_steps: int = 10,
    max_tokens: int = 200,
    max_samples: int = 5,
    ctc_fusion_weight: float = 0.0,  # rnnt_beam: per-frame CTC shallow fusion
) -> EvalResult:
    c = cfg.model
    total = CerCounts(0, 0, 0, 0)
    samples = []

    @jax.jit
    def encode(waves, wave_lens):
        feats, feat_lens = fbank_batch(waves, wave_lens, cfg.feature)
        return model.apply(params, feats, feat_lens, method="encode")

    @jax.jit
    def ctc_head(enc):
        return model.apply(params, enc, method="ctc_logits")

    for batch in batches:
        enc, enc_lens = encode(batch["waves"], batch["wave_lens"])
        if mode == "ctc_greedy":
            logits = ctc_head(enc)
            lp = jax.nn.log_softmax(logits, axis=-1)
            toks, tok_lens = ctc_greedy_decode(lp, enc_lens, c.blank_id)
        elif mode == "rnnt_greedy":
            toks, tok_lens = rnnt_greedy_decode(
                model, params, enc, enc_lens, c.blank_id, n_steps, max_tokens
            )
        elif mode == "rnnt_beam":
            toks, tok_lens, *_ = rnnt_beam_decode(
                model, params, enc, enc_lens, c.blank_id, beam_size, max_tokens,
                ctc_weight=ctc_fusion_weight,
                transducer_weight=c.transducer_weight,
            )
        else:
            raise ValueError(mode)

        toks = np.asarray(toks)
        tok_lens = np.asarray(tok_lens)
        texts = np.asarray(batch["texts"])
        text_lens = np.asarray(batch["text_lens"])
        n_valid = int(batch.get("num_valid", toks.shape[0]))
        for i in range(n_valid):
            ref = _strip_specials(texts[i, : text_lens[i]].tolist(), tokenizer)
            hyp = _strip_specials(toks[i, : tok_lens[i]].tolist(), tokenizer)
            total = total + cer_details(ref, hyp)
            if len(samples) < max_samples:
                utt = batch.get("utt_ids", [str(i)] * (i + 1))[i]
                samples.append(
                    (utt, " ".join(tokenizer.decode(ref)), " ".join(tokenizer.decode(hyp)))
                )
    return EvalResult(total, samples)
