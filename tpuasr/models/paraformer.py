"""Paraformer: non-autoregressive ASR with a CIF monotonic aligner.

Parity: wenet/paraformer/paraformer.py:104-410 (SURVEY §2.4) — conformer
encoder → CIF predictor (frame weights, integrate-and-fire acoustic
embeddings, teacher-forced count scaling) → bidirectional NAR decoder over
the fired embeddings attending the encoder memory → CE loss + MAE quantity
loss. Decoding is single-pass: token count = round(sum alpha), tokens =
argmax per fired position (wenet paraformer/search.py greedy role).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuasr.config import EncoderConfig
from tpuasr.nn.cif import CifPredictor, quantity_loss
from tpuasr.nn.conformer import ConformerEncoder
from tpuasr.nn.decoder import TransformerDecoder, label_smoothing_loss
from tpuasr.nn.masks import make_pad_mask
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


class Paraformer(nn.Module):
    cfg: ParaformerConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        self.encoder = ConformerEncoder(c.encoder, dtype, name="encoder")
        self.predictor = CifPredictor(c.encoder.output_size, name="predictor")
        self.decoder = TransformerDecoder(
            c.vocab_size, c.encoder.output_size, c.decoder_heads, c.decoder_ffn,
            c.decoder_blocks, c.encoder.dropout_rate, c.encoder.max_len, dtype,
            name="decoder",
        )

    def encode(self, feats, feat_lens, deterministic=True, chunk_rng=None):
        ys, _ = self.encoder(feats, feat_lens, chunk_rng=chunk_rng,
                             deterministic=deterministic)
        return ys, subsampled_len(self.cfg.encoder.input_layer, feat_lens)

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
        embeds, pred_count, _ = self.predictor(
            enc, mask, c.max_tokens, target_lens=text_lens
        )
        logits = self.decoder(
            enc, enc_lens, None, text_lens, deterministic,
            inputs_embeds=embeds, causal=False,
        )
        loss_ce = label_smoothing_loss(logits, texts, text_lens, c.lsm_weight)
        loss_qty = quantity_loss(pred_count, text_lens)
        loss = loss_ce + c.quantity_weight * loss_qty
        return {"loss": loss, "loss_ce": loss_ce, "loss_quantity": loss_qty}

    def greedy_decode(self, feats, feat_lens):
        """Single-pass NAR decode -> (tokens [B, max_tokens], lens [B])."""
        c = self.cfg
        enc, enc_lens = self.encode(feats, feat_lens, True)
        mask = ~make_pad_mask(enc_lens, enc.shape[1])
        embeds, pred_count, _ = self.predictor(enc, mask, c.max_tokens)
        lens = jnp.clip(jnp.round(pred_count).astype(jnp.int32), 0, c.max_tokens)
        logits = self.decoder(enc, enc_lens, None, lens, True,
                              inputs_embeds=embeds, causal=False)
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        valid = jnp.arange(c.max_tokens)[None, :] < lens[:, None]
        return jnp.where(valid, tokens, 0), lens
