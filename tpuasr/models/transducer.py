"""RNN-Transducer model — offline and streaming are one model, two call paths.

Parity contracts:
- assembly + hybrid loss `tw·rnnt + cw·ctc` — model/component/transducer.py:73-189,
  model/rnnt_model.py:83-210 (offline), model/online_rnnt_model.py:14-271
  (online: same model with a causal, chunk-trained encoder);
- blank-prepended predictor input — model/component/transducer.py:8-19 (add_blank);
- streaming chunk encode — ConformerEncoder.forward_chunk (fixed-shape caches).

Decoding lives in tpuasr.decode (batched, jit-compiled); evaluation harnesses
in tpuasr.eval.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuasr.config import ModelConfig
from tpuasr.losses import ctc_loss_from_logits, rnnt_loss_from_logits
from tpuasr.nn.conformer import ConformerEncoder, EncoderStreamState
from tpuasr.nn.joint import TransducerJoint
from tpuasr.nn.predictor import PREDICTOR_CLASSES
from tpuasr.nn.subsampling import subsampled_len


def build_encoder(enc_cfg, dtype):
    """Encoder-family factory (wenet init_model registry role): conformer
    (full streaming support) | squeezeformer | efficient_conformer
    (full-context + prefix-recompute streaming)."""
    etype = getattr(enc_cfg, "encoder_type", "conformer")
    if etype == "conformer":
        return ConformerEncoder(enc_cfg, dtype, name="encoder")
    if etype == "firered":
        # FireRed = conformer stack with the odd padded subsampling and
        # Transformer-XL rel_shift attention (wenet/firered/, full-context
        # only — its reference raises on streaming too)
        import dataclasses

        fc = dataclasses.replace(
            enc_cfg,
            input_layer="conv2d_firered",
            attention_type="firered_rel_pos",
        )
        return ConformerEncoder(fc, dtype, name="encoder")
    if etype == "squeezeformer":
        from tpuasr.nn.squeezeformer import SqueezeformerConfig, SqueezeformerEncoder

        sc = SqueezeformerConfig(
            input_size=enc_cfg.input_size,
            encoder_dim=enc_cfg.output_size,
            output_size=enc_cfg.output_size,
            attention_heads=enc_cfg.attention_heads,
            num_blocks=enc_cfg.num_blocks,
            reduce_idx=tuple(enc_cfg.reduce_idx),
            recover_idx=tuple(enc_cfg.recover_idx),
            feed_forward_expansion_factor=max(
                enc_cfg.linear_units // enc_cfg.output_size, 1
            ),
            cnn_module_kernel=enc_cfg.cnn_module_kernel,
            dropout_rate=enc_cfg.dropout_rate,
            activation_type=enc_cfg.activation_type,
            max_len=enc_cfg.max_len,
            use_dynamic_chunk=enc_cfg.use_dynamic_chunk,
            static_chunk_size=enc_cfg.static_chunk_size,
            causal=enc_cfg.causal,
            time_reduction_type=getattr(enc_cfg, "time_reduction_type", "conv"),
        )
        return SqueezeformerEncoder(sc, dtype, name="encoder")
    if etype == "efficient_conformer":
        from tpuasr.nn.efficient_conformer import (
            EfficientConformerConfig, EfficientConformerEncoder,
        )

        ec = EfficientConformerConfig(
            input_size=enc_cfg.input_size,
            output_size=enc_cfg.output_size,
            attention_heads=enc_cfg.attention_heads,
            linear_units=enc_cfg.linear_units,
            num_blocks=enc_cfg.num_blocks,
            stride_layer_idx=tuple(enc_cfg.stride_layer_idx),
            group_size=enc_cfg.group_size,
            cnn_module_kernel=enc_cfg.cnn_module_kernel,
            dropout_rate=enc_cfg.dropout_rate,
            activation_type=enc_cfg.activation_type,
            input_layer=enc_cfg.input_layer,
            max_len=enc_cfg.max_len,
            use_dynamic_chunk=enc_cfg.use_dynamic_chunk,
            static_chunk_size=enc_cfg.static_chunk_size,
            causal=enc_cfg.causal,
        )
        return EfficientConformerEncoder(ec, dtype, name="encoder")
    raise ValueError(f"unknown encoder_type {etype}")


def encoder_output_len(enc_cfg, encoder, feat_lens):
    """Encoder frame count for padded inputs, per family."""
    etype = getattr(enc_cfg, "encoder_type", "conformer")
    if etype == "efficient_conformer":
        return encoder.output_len(feat_lens)
    if etype == "firered":
        return subsampled_len("conv2d_firered", feat_lens)
    return subsampled_len(enc_cfg.input_layer, feat_lens)


def stream_output_factor(enc_cfg) -> int:
    """Encoder-output frames per streaming chunk frame: 1 except for the
    efficient-conformer's mid-stack strides (chunk of C subsampled frames
    emits C / factor output frames)."""
    if getattr(enc_cfg, "encoder_type", "conformer") == "efficient_conformer":
        f = 1
        for _ in enc_cfg.stride_layer_idx:
            f *= getattr(enc_cfg, "stride", 2)
        return f
    return 1


def stream_output_len(enc_cfg, feat_lens):
    """Output frame count at the encoder's final rate (family-aware)."""
    base = subsampled_len(enc_cfg.input_layer, feat_lens)
    f = stream_output_factor(enc_cfg)
    return (base + f - 1) // f if f > 1 else base


def add_blank(texts: jnp.ndarray, blank_id: int) -> jnp.ndarray:
    """[B, U] -> [B, U+1] with blank prepended (predictor input)."""
    b = texts.shape[0]
    blank_col = jnp.full((b, 1), blank_id, texts.dtype)
    return jnp.concatenate([blank_col, texts], axis=1)


class CTCHead(nn.Module):
    """Linear + dropout CTC head (model/rnnt_model.py:11-80 parity)."""

    vocab_size: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, enc_out, deterministic: bool = True):
        y = nn.Dropout(self.dropout_rate)(enc_out, deterministic=deterministic)
        return nn.Dense(self.vocab_size, name="ctc_lo")(y)


class Transducer(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        self.encoder = build_encoder(c.encoder, dtype)
        pred_cls = PREDICTOR_CLASSES[c.predictor.predictor_type]
        self.predictor = pred_cls(c.predictor, c.vocab_size, dtype, name="predictor")
        self.joint = TransducerJoint(c.joint, c.vocab_size, dtype,
                                     blank_id=c.blank_id, name="joint")
        if c.ctc_weight > 0:
            self.ctc = CTCHead(c.vocab_size, c.ctc_dropout_rate, name="ctc")

    # -------------------------------------------------- encoder entry points

    def encode(
        self,
        feats: jnp.ndarray,
        feat_lens: jnp.ndarray,
        decoding_chunk_size: int = 0,
        num_decoding_left_chunks: int = -1,
        chunk_rng: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        """-> (enc_out [B, T', D], enc_lens [B])."""
        ys, _ = self.encoder(
            feats,
            feat_lens,
            decoding_chunk_size=decoding_chunk_size,
            num_decoding_left_chunks=num_decoding_left_chunks,
            chunk_rng=chunk_rng,
            deterministic=deterministic,
        )
        enc_lens = encoder_output_len(self.cfg.encoder, self.encoder, feat_lens)
        return ys, enc_lens

    def encode_chunk(self, xs: jnp.ndarray, state: EncoderStreamState):
        """One streaming chunk -> ([B, chunk, D], new encoder state).
        (Cached streaming: conformer family; squeezeformer/efficient_conformer
        use tpuasr.streaming.prefix_recompute instead.)"""
        return self.encoder.forward_chunk(xs, state)

    def init_encoder_state(self, batch: int, chunk_size: int, num_left_chunks: int):
        return self.encoder.init_stream_state(batch, chunk_size, num_left_chunks)

    # -------------------------------------------------- predictor / joint

    def predict(self, tokens, state=None, deterministic: bool = True):
        return self.predictor(tokens, state, deterministic)

    def predict_step(self, tokens, state, padding=None):
        return self.predictor.forward_step(tokens, state, padding)

    def init_predictor_state(self, batch: int):
        return self.predictor.init_state(batch)

    def joint_full(self, enc_out, pred_out):
        return self.joint(enc_out, pred_out)

    def joint_step(self, enc_t, pred_u):
        return self.joint.step(enc_t, pred_u)

    def ctc_logits(self, enc_out, deterministic: bool = True):
        return self.ctc(enc_out, deterministic=deterministic)

    # -------------------------------------------------- training forward

    def __call__(
        self,
        feats: jnp.ndarray,  # [B, T, F]
        feat_lens: jnp.ndarray,  # [B]
        texts: jnp.ndarray,  # [B, U]
        text_lens: jnp.ndarray,  # [B]
        chunk_rng: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> dict:
        """Hybrid loss forward -> {"loss", "loss_rnnt", "loss_ctc"}.

        loss = transducer_weight * rnnt(mean) + ctc_weight * ctc(sum)/B
        (model/component/transducer.py:122-128, 161-189 parity).
        """
        c = self.cfg
        enc_out, enc_lens = self.encode(
            feats, feat_lens, chunk_rng=chunk_rng, deterministic=deterministic
        )

        ys_in = add_blank(texts, c.blank_id)  # [B, U+1]
        pred_out = self.predictor(ys_in, deterministic=deterministic)  # [B, U+1, P]

        if c.rnnt_prune_range > 0 and not c.joint.hat_joint and not c.joint.postjoin_linear:
            from tpuasr.losses.rnnt_pruned import rnnt_loss_pruned

            enc_p = self.joint.project_enc(enc_out)
            pred_p = self.joint.project_pred(pred_out)
            w, bias = self.joint.head_params()
            loss_rnnt = rnnt_loss_pruned(
                enc_p, pred_p, w, bias, texts, enc_lens, text_lens,
                c.blank_id, s_range=c.rnnt_prune_range, reduction="mean",
            )
            loss = c.transducer_weight * loss_rnnt
            out = {"loss_rnnt": loss_rnnt}
            if c.ctc_weight > 0:
                ctc_logits = self.ctc(enc_out, deterministic=deterministic)
                loss_ctc = ctc_loss_from_logits(
                    ctc_logits, enc_lens, texts, text_lens, c.blank_id,
                    "sum_over_batch",
                )
                loss = loss + c.ctc_weight * loss_ctc
                out["loss_ctc"] = loss_ctc
            out["loss"] = loss
            return out

        if c.fused_joint_loss and not c.joint.hat_joint and not c.joint.postjoin_linear:
            from tpuasr.ops.rnnt_fused_pallas import rnnt_loss_fused_mean

            enc_p = self.joint.project_enc(enc_out)
            pred_p = self.joint.project_pred(pred_out)
            w, bias = self.joint.head_params()
            loss_rnnt = rnnt_loss_fused_mean(
                enc_p, pred_p, w, bias, texts, enc_lens, text_lens, c.blank_id
            )
            loss = c.transducer_weight * loss_rnnt
            out = {"loss_rnnt": loss_rnnt}
            if c.ctc_weight > 0:
                ctc_logits = self.ctc(enc_out, deterministic=deterministic)
                loss_ctc = ctc_loss_from_logits(
                    ctc_logits, enc_lens, texts, text_lens, c.blank_id,
                    "sum_over_batch",
                )
                loss = loss + c.ctc_weight * loss_ctc
                out["loss_ctc"] = loss_ctc
            out["loss"] = loss
            return out

        logits = self.joint(enc_out, pred_out)  # [B, T', U+1, V]
        if c.shard_joint:
            from jax.sharding import PartitionSpec as P

            logits = jax.lax.with_sharding_constraint(
                logits, P("data", None, None, "model")
            )

        loss_rnnt = rnnt_loss_from_logits(
            logits, texts, enc_lens, text_lens, c.blank_id, "mean"
        )
        loss = c.transducer_weight * loss_rnnt
        out = {"loss_rnnt": loss_rnnt}
        if c.ctc_weight > 0:
            ctc_logits = self.ctc(enc_out, deterministic=deterministic)
            loss_ctc = ctc_loss_from_logits(
                ctc_logits, enc_lens, texts, text_lens, c.blank_id, "sum_over_batch"
            )
            loss = loss + c.ctc_weight * loss_ctc
            out["loss_ctc"] = loss_ctc
        out["loss"] = loss
        return out
