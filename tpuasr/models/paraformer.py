"""Paraformer: non-autoregressive ASR with a CIF monotonic aligner.

Parity: wenet/paraformer/paraformer.py:104-410 (SURVEY §2.4) — encoder →
CIF predictor (frame weights, integrate-and-fire acoustic embeddings,
teacher-forced count scaling, tail-threshold firing) → glancing sampler
(semantic embeddings mixing acoustic embeds with ground-truth token embeds,
paraformer.py:236-275) → bidirectional NAR decoder attending the encoder
memory → label-smoothed CE + MAE quantity loss (+ optional CTC branch and
the timestamp-branch quantity loss). Decoding is single-pass: token count =
round/floor(sum alpha), tokens = argmax per fired position, times = CIF
peaks (wenet paraformer/search.py:139-178); n-best via the positionwise
batch beam (search.py:181-255 → tpuasr/decode/paraformer_beam.py).

Two encoder/decoder stacks are selectable:
  - ``encoder_type="conformer"``: conformer encoder + generic bidirectional
    TransformerDecoder over fired embeddings (the course-sized variant).
  - ``encoder_type="sanm"``: LFR frame stacking + SANM (FSMN-memory
    attention) encoder + SANM NAR decoder — the released-Paraformer stack
    (wenet/paraformer/layers.py), see tpuasr/nn/sanm.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuasr.config import EncoderConfig
from tpuasr.losses.ctc import ctc_loss_from_logits
from tpuasr.nn.cif import CifPredictor, TimestampPredictor, cif_peaks, quantity_loss
from tpuasr.nn.conformer import ConformerEncoder
from tpuasr.nn.decoder import TransformerDecoder, label_smoothing_loss
from tpuasr.nn.masks import make_pad_mask
from tpuasr.nn.sanm import SanmDecoder, SanmEncoder, lfr
from tpuasr.nn.subsampling import subsampled_len


@dataclass
class ParaformerConfig:
    vocab_size: int = 412
    ignore_id: int = -1
    lsm_weight: float = 0.1
    quantity_weight: float = 1.0
    decoder_blocks: int = 6
    decoder_heads: int = 4
    decoder_ffn: int = 1024
    max_tokens: int = 64
    compute_dtype: str = "float32"
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    # --- stack selection -------------------------------------------------
    # conformer (generic NAR decoder) | sanm (LFR + FSMN-memory stack)
    encoder_type: str = "conformer"
    lfr_m: int = 7  # LFR stack size (wenet/paraformer/layers.py:25)
    lfr_n: int = 6  # LFR stride
    sanm_kernel: int = 11
    sanm_shift: int = 0
    # --- training behaviors (wenet/paraformer/paraformer.py:120-125) -----
    sampler: bool = True  # glancing sampler (needs an rng: rngs={"sampler"})
    sampling_ratio: float = 0.75
    add_eos: bool = True  # append <eos> to predictor/decoder targets
    eos_id: int = 3
    ctc_weight: float = 0.0  # optional CTC branch over the encoder output
    ctc_blank: int = 5
    # timestamp branch: upsampled BLSTM weight head + tp quantity loss
    timestamp_branch: bool = False
    # CIF head (wenet/paraformer/cif.py:26-53)
    cif_tail_threshold: float = 0.45
    cif_dropout: float = 0.1


class Paraformer(nn.Module):
    cfg: ParaformerConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        d = c.encoder.output_size
        if c.encoder_type == "sanm":
            self.encoder = SanmEncoder(
                input_size=c.encoder.input_size * c.lfr_m,
                output_size=d,
                attention_heads=c.encoder.attention_heads,
                linear_units=c.encoder.linear_units,
                num_blocks=c.encoder.num_blocks,
                kernel_size=c.sanm_kernel,
                sanm_shift=c.sanm_shift,
                dropout_rate=c.encoder.dropout_rate,
                max_len=c.encoder.max_len,
                dtype=dtype,
                name="encoder",
            )
            self.decoder = SanmDecoder(
                c.vocab_size, d, c.decoder_heads, c.decoder_ffn,
                c.decoder_blocks, c.sanm_kernel, c.sanm_shift,
                c.encoder.dropout_rate, dtype, name="decoder",
            )
        else:
            self.encoder = ConformerEncoder(c.encoder, dtype, name="encoder")
            self.decoder = TransformerDecoder(
                c.vocab_size, d, c.decoder_heads, c.decoder_ffn,
                c.decoder_blocks, c.encoder.dropout_rate, c.encoder.max_len,
                dtype, name="decoder",
            )
        self.predictor = CifPredictor(
            d, dropout_rate=c.cif_dropout,
            tail_threshold=c.cif_tail_threshold, name="predictor",
        )
        if c.sampler:
            self.sampler_embed = nn.Embed(c.vocab_size, d, dtype=dtype,
                                          name="sampler_embed")
        if c.ctc_weight > 0.0:
            self.ctc_lo = nn.Dense(c.vocab_size, dtype=dtype, name="ctc_lo")
        if c.timestamp_branch:
            self.tp = TimestampPredictor(d, name="tp")

    # ------------------------------------------------------------- pieces

    def encode(self, feats, feat_lens, deterministic=True, chunk_rng=None):
        """-> (enc [B, T', D], enc_lens [B])."""
        if self.cfg.encoder_type == "sanm":
            stacked, lens = lfr(feats, feat_lens, self.cfg.lfr_m, self.cfg.lfr_n)
            ys, _ = self.encoder(stacked, lens, deterministic=deterministic)
            return ys, lens
        ys, _ = self.encoder(feats, feat_lens, chunk_rng=chunk_rng,
                             deterministic=deterministic)
        return ys, subsampled_len(self.cfg.encoder.input_layer, feat_lens)

    def _decode_embeds(self, enc, enc_lens, embeds, embed_lens, deterministic):
        """NAR decoder pass over semantic embeddings -> logits [B, U, V]."""
        if self.cfg.encoder_type == "sanm":
            return self.decoder(enc, enc_lens, embeds, embed_lens,
                                deterministic=deterministic)
        return self.decoder(enc, enc_lens, None, embed_lens, deterministic,
                            inputs_embeds=embeds, causal=False)

    def _sample_embeds(self, rng, enc, enc_lens, ys, ys_lens, acoustic):
        """Glancing sampler (wenet/paraformer/paraformer.py:236-275): decode
        once from the acoustic embeddings (no grad), count the wrong
        positions, and replace `ratio * #wrong` random valid positions of
        the acoustic embeddings with ground-truth token embeddings."""
        u = ys.shape[1]
        tgt_mask = jnp.arange(u)[None, :] < ys_lens[:, None]
        logits = jax.lax.stop_gradient(
            self._decode_embeds(enc, enc_lens, acoustic, ys_lens, True)
        )
        pred = jnp.argmax(logits, axis=-1)
        same = jnp.sum((pred == ys) & tgt_mask, axis=1)
        target_num = (
            (ys_lens - same).astype(jnp.float32) * self.cfg.sampling_ratio
        ).astype(jnp.int32)
        scores = jax.random.uniform(rng, ys.shape)
        scores = jnp.where(tgt_mask, scores, 2.0)  # padding never selected
        # rank of each position in its row's random order
        rank = jnp.argsort(jnp.argsort(scores, axis=1), axis=1)
        replace = rank < target_num[:, None]
        tok_embeds = self.sampler_embed(jnp.where(tgt_mask, ys, 0))
        sem = jnp.where(replace[..., None], tok_embeds.astype(acoustic.dtype),
                        acoustic)
        return jnp.where(tgt_mask[..., None], sem, 0)

    # ------------------------------------------------------------- training

    def __call__(
        self,
        feats: jnp.ndarray,
        feat_lens: jnp.ndarray,
        texts: jnp.ndarray,  # [B, U]
        text_lens: jnp.ndarray,
        chunk_rng=None,
        deterministic: bool = True,
    ) -> dict:
        c = self.cfg
        enc, enc_lens = self.encode(feats, feat_lens, deterministic, chunk_rng)
        mask = ~make_pad_mask(enc_lens, enc.shape[1])

        ys, ys_lens = texts, text_lens
        if c.add_eos:  # labels + <eos> feed the predictor/decoder
            b, u = texts.shape
            ys = jnp.pad(texts, ((0, 0), (0, 1)))
            ys = ys.at[jnp.arange(b), text_lens].set(c.eos_id)
            ys_lens = text_lens + 1
        n_tok = ys.shape[1]

        embeds, pred_count, _ = self.predictor(
            enc, mask, n_tok, target_lens=ys_lens, deterministic=deterministic
        )
        if c.sampler and self.has_rng("sampler"):
            embeds = self._sample_embeds(
                self.make_rng("sampler"), enc, enc_lens, ys, ys_lens, embeds
            )
        elif c.sampler and self.is_initializing():
            # materialize the sampler embedding params even when init runs
            # without a "sampler" rng stream
            _ = self.sampler_embed(jnp.zeros_like(ys))
        logits = self._decode_embeds(enc, enc_lens, embeds, ys_lens, deterministic)
        loss_ce = label_smoothing_loss(logits, ys, ys_lens, c.lsm_weight)
        loss_qty = quantity_loss(pred_count, ys_lens)
        loss = loss_ce + c.quantity_weight * loss_qty
        out = {"loss_ce": loss_ce, "loss_quantity": loss_qty}
        if c.ctc_weight > 0.0:
            ctc_logits = self.ctc_lo(enc)
            loss_ctc = ctc_loss_from_logits(
                ctc_logits, enc_lens, texts, text_lens, blank=c.ctc_blank
            )
            loss = loss + c.ctc_weight * loss_ctc
            out["loss_ctc"] = loss_ctc
        if c.timestamp_branch:
            tp_alphas = self.tp(enc, mask)
            loss_tp = quantity_loss(jnp.sum(tp_alphas, axis=1), ys_lens)
            loss = loss + loss_tp
            out["loss_quantity_tp"] = loss_tp
        out["loss"] = loss
        return out

    # ------------------------------------------------------------- decoding

    def _predict(self, feats, feat_lens):
        c = self.cfg
        enc, enc_lens = self.encode(feats, feat_lens, True)
        mask = ~make_pad_mask(enc_lens, enc.shape[1])
        embeds, pred_count, alphas = self.predictor(enc, mask, c.max_tokens)
        lens = jnp.clip(pred_count.astype(jnp.int32), 0, c.max_tokens)
        logits = self._decode_embeds(enc, enc_lens, embeds, lens, True)
        return enc, enc_lens, logits, lens, alphas

    def greedy_decode(self, feats, feat_lens):
        """Single-pass NAR decode -> (tokens [B, max_tokens], lens [B])."""
        _, _, logits, lens, _ = self._predict(feats, feat_lens)
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        valid = jnp.arange(self.cfg.max_tokens)[None, :] < lens[:, None]
        return jnp.where(valid, tokens, 0), lens

    def greedy_decode_with_times(self, feats, feat_lens):
        """-> (tokens, lens, times [B, max_tokens]) — times are CIF fire
        frames (encoder frame indices), wenet paraformer/search.py:166-178."""
        c = self.cfg
        _, _, logits, lens, alphas = self._predict(feats, feat_lens)
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        valid = jnp.arange(c.max_tokens)[None, :] < lens[:, None]
        pk = cif_peaks(alphas) > 0  # [B, T(+tail)]
        b, t = pk.shape
        tok_idx = jnp.cumsum(pk, axis=1) - 1  # token index at fire frames
        slot = jnp.where(pk, jnp.minimum(tok_idx, c.max_tokens - 1), c.max_tokens)
        frames = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
        times = jnp.full((b, c.max_tokens + 1), t, jnp.int32)
        times = times.at[jnp.arange(b)[:, None], slot].min(frames)
        times = jnp.where(valid, times[:, : c.max_tokens], 0)
        return jnp.where(valid, tokens, 0), lens, times

    def beam_decode(self, feats, feat_lens, beam_size: int = 10):
        """Positionwise batch beam over the NAR logits -> n-best
        (tokens [B, N, max_tokens], scores [B, N], lens [B])."""
        from tpuasr.decode.paraformer_beam import nar_beam_search

        _, _, logits, lens, _ = self._predict(feats, feat_lens)
        tokens, scores = nar_beam_search(logits, lens, beam_size, self.cfg.eos_id)
        return tokens, scores, lens
