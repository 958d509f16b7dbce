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
    compute_dtype: str = "float32"
    encoder: EncoderConfig = field(default_factory=EncoderConfig)


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

        # attention branch: <sos> y -> y <eos>
        b, u = texts.shape
        sos = jnp.full((b, 1), c.sos_id, texts.dtype)
        ys_in = jnp.concatenate([sos, texts], axis=1)  # [B, U+1]
        u_idx = jnp.arange(u + 1)[None, :]
        eos_slot = u_idx == text_lens[:, None]
        ys_out = jnp.concatenate([texts, jnp.zeros((b, 1), texts.dtype)], axis=1)
        ys_out = jnp.where(eos_slot, c.eos_id, ys_out)
        dec_logits = self.decoder(enc_out, enc_lens, ys_in, text_lens + 1, deterministic)
        loss_att = label_smoothing_loss(dec_logits, ys_out, text_lens + 1, c.lsm_weight)

        loss_ctc = ctc_loss_from_logits(
            self.ctc_lo(enc_out), enc_lens, texts, text_lens, c.blank_id,
            "sum_over_batch",
        )
        loss = c.ctc_weight * loss_ctc + (1.0 - c.ctc_weight) * loss_att
        return {"loss": loss, "loss_ctc": loss_ctc, "loss_att": loss_att}


def attention_rescoring(
    model: ASRModel,
    params,
    enc_out: jnp.ndarray,  # [B, T, D]
    enc_lens: jnp.ndarray,
    nbest_tokens: jnp.ndarray,  # [B, N, U] from ctc_prefix_beam_search
    nbest_lens: jnp.ndarray,  # [B, N]
    nbest_ctc_scores: jnp.ndarray,  # [B, N]
    ctc_weight: float = 0.5,
):
    """Pick the best CTC n-best hypothesis by decoder + ctc score fusion.

    score = att_logp(hyp) + ctc_weight * ctc_score (search.py:443-447).
    -> (tokens [B, U], lens [B])."""
    c = model.cfg
    b, n, u = nbest_tokens.shape
    flat_tok = nbest_tokens.reshape(b * n, u)
    flat_len = nbest_lens.reshape(b * n)
    enc_rep = jnp.repeat(enc_out, n, axis=0)
    lens_rep = jnp.repeat(enc_lens, n, axis=0)

    sos = jnp.full((b * n, 1), c.sos_id, flat_tok.dtype)
    ys_in = jnp.concatenate([sos, flat_tok], axis=1)
    dec_logits = model.apply(
        params, enc_rep, lens_rep, ys_in, flat_len + 1, method="decoder_scores"
    )
    lp = jax.nn.log_softmax(dec_logits.astype(jnp.float32), axis=-1)
    # target at step j is token j (then eos at step len)
    u_idx = jnp.arange(u + 1)[None, :]
    tgt = jnp.concatenate([flat_tok, jnp.zeros((b * n, 1), flat_tok.dtype)], axis=1)
    tgt = jnp.where(u_idx == flat_len[:, None], c.eos_id, tgt)
    tok_lp = jnp.take_along_axis(lp, tgt[..., None].astype(jnp.int32), axis=-1)[..., 0]
    valid = u_idx <= flat_len[:, None]  # include the eos step
    att_score = jnp.sum(jnp.where(valid, tok_lp, 0.0), axis=1).reshape(b, n)

    total = att_score + ctc_weight * nbest_ctc_scores
    total = jnp.where(nbest_ctc_scores > -1.0e29, total, -1.0e30)
    best = jnp.argmax(total, axis=1)
    tokens = jnp.take_along_axis(nbest_tokens, best[:, None, None], axis=1)[:, 0]
    lens = jnp.take_along_axis(nbest_lens, best[:, None], axis=1)[:, 0]
    return tokens, lens, total
