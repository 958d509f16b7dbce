"""CTC conformer model (workload 1).

Parity: model/model.py:262-305 — conv2d×8 subsampling, rel-pos PE, small
conformer stack, linear head, CTC loss summed over batch / B. Built on the
framework encoder (which adds pad-masking the reference's local blocks lack —
model/model.py:103-259 runs unmasked attention over padding).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuasr.config import CTCModelConfig, EncoderConfig
from tpuasr.losses import ctc_loss_from_logits
from tpuasr.nn.conformer import ConformerEncoder
from tpuasr.nn.subsampling import subsampled_len


def _encoder_cfg(c: CTCModelConfig) -> EncoderConfig:
    return EncoderConfig(
        input_size=c.input_size,
        output_size=c.hidden_dim,
        attention_heads=c.attention_heads,
        linear_units=c.hidden_dim * c.ffn_factor,
        num_blocks=c.num_blocks,
        dropout_rate=c.dropout_rate,
        input_layer=c.subsampling,
        pos_enc_layer_type="rel_pos",
        macaron_style=True,
        use_cnn_module=True,
        cnn_module_kernel=c.kernel_size,
        causal=False,
    )


class CTCModel(nn.Module):
    cfg: CTCModelConfig
    vocab_size: int
    blank_id: int

    def setup(self):
        self.enc_cfg = _encoder_cfg(self.cfg)
        self.encoder = ConformerEncoder(self.enc_cfg, name="encoder")
        self.fc_out = nn.Dense(self.vocab_size, name="fc_out")

    def encode(self, feats, feat_lens, deterministic: bool = True):
        """[B, T, F] -> (logits [B, T', V], out_lens [B])."""
        ys, _ = self.encoder(feats, feat_lens, deterministic=deterministic)
        logits = self.fc_out(ys)
        out_lens = subsampled_len(self.cfg.subsampling, feat_lens)
        return logits, out_lens

    def __call__(
        self,
        feats: jnp.ndarray,
        feat_lens: jnp.ndarray,
        texts: Optional[jnp.ndarray] = None,
        text_lens: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """Training/eval forward -> (log_probs, out_lens, loss | None)."""
        logits, out_lens = self.encode(feats, feat_lens, deterministic)
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        loss = None
        if texts is not None:
            loss = ctc_loss_from_logits(
                logits, out_lens, texts, text_lens, self.blank_id, "sum_over_batch"
            )
        return log_probs, out_lens, loss
