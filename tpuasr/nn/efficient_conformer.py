"""EfficientConformer encoder.

Parity: wenet/efficient_conformer/ (SURVEY §2.4) — the distinguishing
mechanics: progressive temporal downsampling via *strided* conformer layers
at `stride_layer_idx` (encoder.py:66-141; the conv module's depthwise conv
takes stride 2 and the residual is average-pooled to match), and
**grouped** rel-pos attention (attention.py:28): consecutive frames are
concatenated in groups of `group_size` along the head dim so attention cost
drops by group_size² at long T.

Full-context training/eval path; the stride-aware streaming cache
(encoder.py:300) is a later round.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuasr.config import EncoderConfig
from tpuasr.nn.attention import masked_softmax
from tpuasr.nn.conformer import ACTIVATIONS, PositionwiseFeedForward
from tpuasr.nn.embedding import PositionalEncodingTable
from tpuasr.nn.masks import add_optional_chunk_mask, make_pad_mask
from tpuasr.nn.subsampling import SUBSAMPLE_CLASSES, subsampled_mask


@dataclass
class EfficientConformerConfig:
    input_size: int = 80
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 1024
    num_blocks: int = 12
    stride_layer_idx: tuple = (3,)
    stride: int = 2
    group_size: int = 3
    cnn_module_kernel: int = 31
    dropout_rate: float = 0.1
    activation_type: str = "swish"
    input_layer: str = "conv2d"
    max_len: int = 5000
    use_dynamic_chunk: bool = False
    static_chunk_size: int = 0


class GroupedRelPositionAttention(nn.Module):
    """Rel-pos attention over frame groups: Q/K/V/pos reshaped from
    [B, T, H, dk] to [B, T/g, H, g*dk] (wenet efficient_conformer
    attention.py:28 contract, no-rel-shift bias formulation)."""

    n_head: int
    n_feat: int
    group_size: int = 3
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, pos_emb, cache=None, deterministic=True):
        b, t, _ = x.shape
        h = self.n_head
        dk = self.n_feat // h
        g = self.group_size
        t_pad = (t + g - 1) // g * g

        def proj(name, src):
            return nn.Dense(self.n_feat, dtype=self.dtype, name=name)(src)

        q = proj("linear_q", x).reshape(b, t, h, dk)
        k = proj("linear_k", x).reshape(b, t, h, dk)
        v = proj("linear_v", x).reshape(b, t, h, dk)
        p = nn.Dense(self.n_feat, use_bias=False, dtype=self.dtype, name="linear_pos")(
            pos_emb
        ).reshape(pos_emb.shape[0], t, h, dk)

        u_bias = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (h, dk * g))
        v_bias = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (h, dk * g))

        def group(z):
            zb = z.shape[0]
            z = jnp.pad(z, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
            return z.reshape(zb, t_pad // g, g, h, dk).transpose(0, 1, 3, 2, 4).reshape(
                zb, t_pad // g, h, g * dk
            )

        qg, kg, vg, pg = group(q), group(k), group(v), group(p)
        q_u = qg + u_bias.astype(qg.dtype)[None, None]
        q_v = qg + v_bias.astype(qg.dtype)[None, None]
        ac = jnp.einsum("bthd,bshd->bhts", q_u, kg)
        bd = jnp.einsum("bthd,pshd->bhts", q_v, pg)
        scores = (ac + bd) / math.sqrt(dk * g)

        gmask = None
        if mask is not None:
            m = jnp.pad(mask, ((0, 0), (0, 0), (0, t_pad - t)))[:, :, ::g]
            if m.shape[1] == t:  # [B, T, T] query-dependent mask
                m = jnp.pad(m, ((0, 0), (0, t_pad - t), (0, 0)))[:, ::g, :]
            gmask = m
        attn = masked_softmax(scores, None if gmask is None else gmask[:, None])
        out = jnp.einsum("bhts,bshd->bthd", attn, vg)  # [B, T/g, H, g*dk]
        out = out.reshape(b, t_pad // g, h, g, dk).transpose(0, 1, 3, 2, 4).reshape(
            b, t_pad, h * dk
        )[:, :t]
        return nn.Dense(self.n_feat, dtype=self.dtype, name="linear_out")(out), None


class StridedConvModule(nn.Module):
    """Conformer conv module whose depthwise conv strides, halving T."""

    channels: int
    kernel_size: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_pad, deterministic=True):
        c = self.channels
        if mask_pad is not None:
            x = jnp.where(mask_pad.transpose(0, 2, 1), x, 0)
        y = nn.Dense(2 * c, dtype=self.dtype, name="pointwise_conv1")(x)
        y = y[..., :c] * nn.sigmoid(y[..., c:])
        pad = (self.kernel_size - 1) // 2
        y = nn.Conv(c, (self.kernel_size,), strides=(self.stride,),
                    padding=[(pad, pad)], feature_group_count=c, dtype=self.dtype,
                    name="depthwise_conv")(y)
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        y = y * nn.sigmoid(y)
        y = nn.Dense(c, dtype=self.dtype, name="pointwise_conv2")(y)
        return y


class EfficientConformerBlock(nn.Module):
    cfg: EfficientConformerConfig
    strided: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, att_mask, pos_emb, mask_pad, deterministic=True):
        c = self.cfg
        d = c.output_size
        drop = lambda y: nn.Dropout(c.dropout_rate)(y, deterministic=deterministic)
        ffn = lambda name: PositionwiseFeedForward(
            c.linear_units, d, c.dropout_rate, c.activation_type, self.dtype, name=name
        )

        x = x + 0.5 * drop(ffn("ff_macaron")(nn.LayerNorm(dtype=self.dtype, name="norm_ff_macaron")(x), deterministic))

        y, _ = GroupedRelPositionAttention(
            c.attention_heads, d, c.group_size, c.dropout_rate, self.dtype,
            name="self_attn",
        )(nn.LayerNorm(dtype=self.dtype, name="norm_mha")(x), att_mask, pos_emb,
          None, deterministic)
        x = x + drop(y)

        conv_in = nn.LayerNorm(dtype=self.dtype, name="norm_conv")(x)
        if self.strided:
            y = StridedConvModule(d, c.cnn_module_kernel, c.stride, self.dtype,
                                  name="conv_module")(conv_in, mask_pad, deterministic)
            # average-pool residual to the strided rate
            t = x.shape[1]
            t_pad = (t + c.stride - 1) // c.stride * c.stride
            xr = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
            residual = xr.reshape(x.shape[0], t_pad // c.stride, c.stride, d).mean(2)
            x = residual[:, : y.shape[1]] + drop(y)
        else:
            from tpuasr.nn.convolution import ConvolutionModule

            y, _ = ConvolutionModule(d, c.cnn_module_kernel, "layer_norm",
                                     causal=False, dtype=self.dtype,
                                     name="conv_module")(conv_in, mask_pad, None,
                                                         deterministic)
            x = x + drop(y)

        x = x + 0.5 * drop(ffn("ff")(nn.LayerNorm(dtype=self.dtype, name="norm_ff")(x), deterministic))
        return nn.LayerNorm(dtype=self.dtype, name="norm_final")(x)


class EfficientConformerEncoder(nn.Module):
    cfg: EfficientConformerConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.embed = SUBSAMPLE_CLASSES[c.input_layer](c.output_size, self.dtype,
                                                      name="embed")
        self.pe = PositionalEncodingTable(c.output_size, c.max_len)
        self.blocks = [
            EfficientConformerBlock(c, strided=(i in set(c.stride_layer_idx)),
                                    dtype=self.dtype, name=f"block{i}")
            for i in range(c.num_blocks)
        ]
        self.after_norm = nn.LayerNorm(dtype=self.dtype, name="after_norm")

    def __call__(self, xs, xs_lens, decoding_chunk_size: int = 0,
                 num_decoding_left_chunks: int = -1, chunk_rng=None,
                 deterministic: bool = True):
        c = self.cfg
        b, t, _ = xs.shape
        masks = ~make_pad_mask(xs_lens, t)[:, None, :]
        ys = self.embed(xs)
        masks = subsampled_mask(masks, c.input_layer)
        ys, pos_emb = self.pe.rel(ys, 0)
        if c.use_dynamic_chunk and decoding_chunk_size == 0 and chunk_rng is None:
            decoding_chunk_size = -1
        chunk_masks = add_optional_chunk_mask(
            masks, use_dynamic_chunk=c.use_dynamic_chunk,
            use_dynamic_left_chunk=False, decoding_chunk_size=decoding_chunk_size,
            static_chunk_size=c.static_chunk_size,
            num_decoding_left_chunks=num_decoding_left_chunks, rng=chunk_rng,
        )
        for i, blk in enumerate(self.blocks):
            ys = blk(ys, chunk_masks, pos_emb, masks, deterministic)
            if i in set(c.stride_layer_idx):
                masks = masks[:, :, :: c.stride][:, :, : ys.shape[1]]
                chunk_masks = chunk_masks[:, :: c.stride, :: c.stride][
                    :, : ys.shape[1], : ys.shape[1]
                ]
                pos_emb = pos_emb[:, :: c.stride][:, : ys.shape[1]]
        return self.after_norm(ys), masks

    def output_len(self, t):
        base = SUBSAMPLE_CLASSES[self.cfg.input_layer].output_len(t)
        for _ in self.cfg.stride_layer_idx:
            base = (base + self.cfg.stride - 1) // self.cfg.stride
        return base
