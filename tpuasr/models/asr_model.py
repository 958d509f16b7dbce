"""Hybrid CTC + attention-decoder ASR model (wenet ASRModel parity).

Parity: wenet/transformer/asr_model.py:35-338 — conformer encoder + CTC head
+ transformer attention decoder; joint loss ``cw·ctc + (1-cw)·att`` with
label smoothing over <sos>/<eos>-wrapped targets; `decode()` dispatch over
{ctc_greedy_search, ctc_prefix_beam_search, attention_rescoring}
(asr_model.py:262-338). Attention rescoring re-scores the CTC prefix-beam
n-best with one batched teacher-forced decoder pass
(wenet/transformer/search.py:369-453) — no per-hypothesis python loops.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuasr.config import EncoderConfig
from tpuasr.losses import ctc_loss_from_logits
from tpuasr.nn.conformer import ConformerEncoder
from tpuasr.nn.decoder import TransformerDecoder, label_smoothing_loss
from tpuasr.nn.subsampling import subsampled_len


@dataclass
class AEDConfig:
    vocab_size: int = 412
    blank_id: int = 5
    sos_id: int = 2
    eos_id: int = 3
    ctc_weight: float = 0.3
    lsm_weight: float = 0.1
    decoder_blocks: int = 6
    decoder_heads: int = 4
    decoder_ffn: int = 1024
    # right-to-left decoder (wenet BiTransformerDecoder, decoder.py:313):
    # r_decoder_blocks > 0 trains a second decoder on reversed targets with
    # loss (1 - reverse_weight) * l2r + reverse_weight * r2l; rescoring fuses
    # both directions' scores.
    r_decoder_blocks: int = 0
    reverse_weight: float = 0.3
    # feed the attention decoder only the frames whose CTC argmax is
    # non-blank (wenet apply_non_blank_embedding, asr_model.py:107-111);
    # requires ctc_weight > 0
    apply_non_blank_embedding: bool = False
    compute_dtype: str = "float32"
    encoder: EncoderConfig = field(default_factory=EncoderConfig)


def filter_blank_embedding(
    ctc_log_probs: jnp.ndarray,  # [B, T, V] (any monotone score works)
    enc_out: jnp.ndarray,  # [B, T, D]
    enc_lens: jnp.ndarray,  # [B]
    blank_id: int,
):
    """Drop frames whose CTC argmax is blank (wenet filter_blank_embedding,
    asr_model.py:149-175).

    TPU-native formulation: the reference builds per-utterance Python index
    lists and re-pads; here a stable-partition gather moves the kept frames
    to the front in order — shapes stay static, only the returned lengths
    shrink.  The vacated tail is zeroed.  Unlike the reference decode path
    (asr_model.py:332-334, which discards the new mask), the updated lengths
    are returned and must be used downstream."""
    top1 = jnp.argmax(ctc_log_probs, axis=-1)  # [B, T]
    t = enc_out.shape[1]
    pos = jnp.arange(t)[None, :]
    keep = (top1 != blank_id) & (pos < enc_lens[:, None])
    # stable argsort of the drop flag: kept frames first, original order
    order = jnp.argsort(jnp.where(keep, 0, 1), axis=1, stable=True)
    new_out = jnp.take_along_axis(enc_out, order[..., None], axis=1)
    new_lens = jnp.sum(keep, axis=1).astype(enc_lens.dtype)
    new_out = jnp.where((pos < new_lens[:, None])[..., None], new_out, 0)
    return new_out, new_lens


def th_accuracy(logits: jnp.ndarray, targets: jnp.ndarray,
                lens: jnp.ndarray) -> jnp.ndarray:
    """Teacher-forced token accuracy over the valid positions (wenet
    th_accuracy, utils/common.py:269-289; valid = pos < lens instead of the
    reference's ignore-id padding)."""
    pred = jnp.argmax(logits, axis=-1)
    valid = jnp.arange(targets.shape[1])[None, :] < lens[:, None]
    correct = jnp.sum(jnp.where(valid, pred == targets, False))
    return correct / jnp.maximum(jnp.sum(valid), 1)


def _reverse_padded(tokens: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    """Reverse each row's valid prefix, keeping padding in place
    (wenet reverse_pad_list parity)."""
    b, u = tokens.shape
    idx = jnp.arange(u)[None, :]
    src = jnp.where(idx < lens[:, None], lens[:, None] - 1 - idx, idx)
    return jnp.take_along_axis(tokens, src, axis=1)


class ASRModel(nn.Module):
    cfg: AEDConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        self.encoder = ConformerEncoder(c.encoder, dtype, name="encoder")
        self.decoder = TransformerDecoder(
            c.vocab_size, c.encoder.output_size, c.decoder_heads, c.decoder_ffn,
            c.decoder_blocks, c.encoder.dropout_rate, c.encoder.max_len, dtype,
            name="decoder",
        )
        if c.r_decoder_blocks > 0:
            self.r_decoder = TransformerDecoder(
                c.vocab_size, c.encoder.output_size, c.decoder_heads, c.decoder_ffn,
                c.r_decoder_blocks, c.encoder.dropout_rate, c.encoder.max_len, dtype,
                name="r_decoder",
            )
        self.ctc_lo = nn.Dense(c.vocab_size, name="ctc_lo")

    def encode(self, feats, feat_lens, deterministic: bool = True, chunk_rng=None,
               decoding_chunk_size: int = 0, num_decoding_left_chunks: int = -1):
        ys, _ = self.encoder(
            feats, feat_lens, decoding_chunk_size, num_decoding_left_chunks,
            chunk_rng, deterministic,
        )
        return ys, subsampled_len(self.cfg.encoder.input_layer, feat_lens)

    def ctc_logits(self, enc_out):
        return self.ctc_lo(enc_out)

    def decoder_scores(self, enc_out, enc_lens, ys_in, ys_lens, deterministic=True):
        """Teacher-forced decoder logits [B, L, V]."""
        return self.decoder(enc_out, enc_lens, ys_in, ys_lens, deterministic)

    def r_decoder_scores(self, enc_out, enc_lens, ys_in, ys_lens, deterministic=True):
        """Teacher-forced right-to-left decoder logits [B, L, V]."""
        return self.r_decoder(enc_out, enc_lens, ys_in, ys_lens, deterministic)

    # AR beam-search surface (decode/attention_beam.py)
    def decoder_project_memory(self, memory):
        return self.decoder.project_memory(memory)

    def decoder_init_cache(self, batch, lmax):
        return self.decoder.init_ar_cache(batch, lmax)

    def decoder_one_step(self, tokens, pos, kcache, vcache, mem_k, mem_v, mem_mask):
        return self.decoder.forward_one_step(
            tokens, pos, kcache, vcache, mem_k, mem_v, mem_mask
        )

    def __call__(
        self,
        feats: jnp.ndarray,
        feat_lens: jnp.ndarray,
        texts: jnp.ndarray,  # [B, U] (bare token ids, no sos/eos)
        text_lens: jnp.ndarray,
        chunk_rng=None,
        deterministic: bool = True,
    ) -> dict:
        c = self.cfg
        enc_out, enc_lens = self.encode(feats, feat_lens, deterministic, chunk_rng)

        # CTC branch first: its activations gate the attention branch's
        # input when apply_non_blank_embedding is set (asr_model.py:99-111)
        ctc_logits = self.ctc_lo(enc_out)
        loss_ctc = ctc_loss_from_logits(
            ctc_logits, enc_lens, texts, text_lens, c.blank_id,
            "sum_over_batch",
        )
        att_enc, att_lens = enc_out, enc_lens
        if c.apply_non_blank_embedding:
            assert c.ctc_weight != 0.0, (
                "apply_non_blank_embedding requires a trained CTC head"
            )
            att_enc, att_lens = filter_blank_embedding(
                ctc_logits, enc_out, enc_lens, c.blank_id
            )

        # attention branch: <sos> y -> y <eos>
        b, u = texts.shape
        sos = jnp.full((b, 1), c.sos_id, texts.dtype)
        ys_in = jnp.concatenate([sos, texts], axis=1)  # [B, U+1]
        u_idx = jnp.arange(u + 1)[None, :]
        eos_slot = u_idx == text_lens[:, None]
        ys_out = jnp.concatenate([texts, jnp.zeros((b, 1), texts.dtype)], axis=1)
        ys_out = jnp.where(eos_slot, c.eos_id, ys_out)
        dec_logits = self.decoder(att_enc, att_lens, ys_in, text_lens + 1, deterministic)
        loss_att = label_smoothing_loss(dec_logits, ys_out, text_lens + 1, c.lsm_weight)
        acc_att = jax.lax.stop_gradient(
            th_accuracy(dec_logits, ys_out, text_lens + 1)
        )
        if c.r_decoder_blocks > 0 and c.reverse_weight > 0:
            r_texts = _reverse_padded(texts, text_lens)
            r_ys_in = jnp.concatenate([sos, r_texts], axis=1)
            r_ys_out = jnp.concatenate([r_texts, jnp.zeros((b, 1), texts.dtype)], axis=1)
            r_ys_out = jnp.where(eos_slot, c.eos_id, r_ys_out)
            r_logits = self.r_decoder(att_enc, att_lens, r_ys_in, text_lens + 1,
                                      deterministic)
            loss_r = label_smoothing_loss(r_logits, r_ys_out, text_lens + 1, c.lsm_weight)
            loss_att = (1.0 - c.reverse_weight) * loss_att + c.reverse_weight * loss_r

        loss = c.ctc_weight * loss_ctc + (1.0 - c.ctc_weight) * loss_att
        return {"loss": loss, "loss_ctc": loss_ctc, "loss_att": loss_att,
                "th_accuracy": acc_att}


def attention_rescoring(
    model: ASRModel,
    params,
    enc_out: jnp.ndarray,  # [B, T, D]
    enc_lens: jnp.ndarray,
    nbest_tokens: jnp.ndarray,  # [B, N, U] from ctc_prefix_beam_search
    nbest_lens: jnp.ndarray,  # [B, N]
    nbest_ctc_scores: jnp.ndarray,  # [B, N]
    ctc_weight: float = 0.5,
    reverse_weight: float = 0.0,
    return_confidence: bool = False,
):
    """Pick the best CTC n-best hypothesis by decoder + ctc score fusion.

    score = att_logp(hyp) + ctc_weight * ctc_score (search.py:443-447); with
    `reverse_weight` > 0 and an R2L decoder, att_logp fuses both directions
    (search.py:418-441).

    With `return_confidence`, also returns the selected hypothesis's
    utterance confidence exp(att_score / (len + 1)) and per-token
    confidences exp(token logp) — averaged over both directions when
    bidirectional (search.py:420-440, DecodeResult confidence fields)."""
    c = model.cfg
    b, n, u = nbest_tokens.shape
    flat_tok = nbest_tokens.reshape(b * n, u)
    flat_len = nbest_lens.reshape(b * n)
    enc_rep = jnp.repeat(enc_out, n, axis=0)
    lens_rep = jnp.repeat(enc_lens, n, axis=0)
    sos = jnp.full((b * n, 1), flat_tok.dtype.type(c.sos_id))
    u_idx = jnp.arange(u + 1)[None, :]

    def score_dir(tokens, method):
        """-> (hyp scores [B, N], per-position token logp [B, N, U+1])."""
        ys_in = jnp.concatenate([sos, tokens], axis=1)
        logits = model.apply(params, enc_rep, lens_rep, ys_in, flat_len + 1,
                             method=method)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = jnp.concatenate([tokens, jnp.zeros((b * n, 1), tokens.dtype)], axis=1)
        tgt = jnp.where(u_idx == flat_len[:, None], c.eos_id, tgt)
        tok_lp = jnp.take_along_axis(lp, tgt[..., None].astype(jnp.int32), axis=-1)[..., 0]
        valid = u_idx <= flat_len[:, None]  # include the eos step
        scores = jnp.sum(jnp.where(valid, tok_lp, 0.0), axis=1).reshape(b, n)
        return scores, tok_lp.reshape(b, n, u + 1)

    att_score, fw_lp = score_dir(flat_tok, "decoder_scores")
    tok_conf = jnp.exp(fw_lp[:, :, :u])  # [B, N, U] (token steps, no eos)
    if reverse_weight > 0 and c.r_decoder_blocks > 0:
        r_score, bw_lp = score_dir(
            _reverse_padded(flat_tok, flat_len), "r_decoder_scores"
        )
        att_score = (1.0 - reverse_weight) * att_score + reverse_weight * r_score
        # bw position j scored token len-1-j: un-reverse before averaging
        bw_conf = _reverse_padded(
            jnp.exp(bw_lp[:, :, :u]).reshape(b * n, u), flat_len
        ).reshape(b, n, u)
        tok_conf = (tok_conf + bw_conf) / 2.0

    total = att_score + ctc_weight * nbest_ctc_scores
    total = jnp.where(nbest_ctc_scores > -1.0e29, total, -1.0e30)
    best = jnp.argmax(total, axis=1)
    tokens = jnp.take_along_axis(nbest_tokens, best[:, None, None], axis=1)[:, 0]
    lens = jnp.take_along_axis(nbest_lens, best[:, None], axis=1)[:, 0]
    if not return_confidence:
        return tokens, lens, total
    best_att = jnp.take_along_axis(att_score, best[:, None], axis=1)[:, 0]
    confidence = jnp.exp(best_att / (lens + 1))
    best_tok_conf = jnp.take_along_axis(tok_conf, best[:, None, None], axis=1)[:, 0]
    valid = jnp.arange(u)[None, :] < lens[:, None]
    best_tok_conf = jnp.where(valid, best_tok_conf, 0.0)
    return tokens, lens, total, confidence, best_tok_conf
