"""EfficientConformer encoder — full-context / chunk-masked forward and
cached chunk streaming.

Parity: wenet/efficient_conformer/ (SURVEY §2.4) — the distinguishing
mechanics: progressive temporal downsampling via *strided* conformer layers
at `stride_layer_idx` (encoder.py:66-141; the conv module's depthwise conv
takes stride 2 and the residual is average-pooled to match), and
**grouped** rel-pos attention (attention.py:28): consecutive frames are
concatenated in groups of `group_size` along the head dim so attention cost
drops by group_size² at long T.

Streaming (wenet encoder.py:300-462 contract, redesigned for XLA static
shapes): wenet keeps one full-rate att cache per layer, subsamples it by the
layer's downsampling factor on entry and `repeat_interleave`s the new cache
back to full rate on exit (encoder.py:404-443). Here every layer keeps a
fixed-capacity KV cache *at its own frame rate* (pre-stride layers:
`A = chunk * left_chunks` slots; post-stride layers: `A / stride`), causal
conv caches hold the last `kernel-1` post-GLU frames (the strided layer's
cache is at its *input* rate), and positional encodings index the table at
stride `factor` (streaming analog of the full forward's `pos_emb[:, ::s]`,
encoder.py:422). Group alignment: key/query windows are grouped from
absolute frame 0, so streaming requires `chunk_at_layer_rate % group_size
== 0` (asserted in `init_stream_state`); under `causal=True` chunked output
equals the full-context chunk-masked forward exactly
(tests/test_streaming_families.py).
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
from tpuasr.nn.convolution import ConvolutionModule
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
    causal: bool = False


class GroupedRelPositionAttention(nn.Module):
    """Rel-pos attention over frame groups: Q/K/V/pos reshaped from
    [B, T, H, dk] to [B, T/g, H, g*dk] (wenet efficient_conformer
    attention.py:28 contract, no-rel-shift bias formulation).

    Grouping is anchored at index 0 of the given tensors; streaming callers
    pass windows whose absolute start is a multiple of `group_size`, so the
    group grid matches the full-context forward's.
    """

    n_head: int
    n_feat: int
    group_size: int = 3
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, pos_emb, cache=None, deterministic=True):
        b, t_q, _ = x.shape
        h = self.n_head
        dk = self.n_feat // h
        g = self.group_size

        def proj(name, src):
            return nn.Dense(self.n_feat, dtype=self.dtype, name=name)(src)

        q = proj("linear_q", x).reshape(b, t_q, h, dk)
        k = proj("linear_k", x).reshape(b, t_q, h, dk)
        v = proj("linear_v", x).reshape(b, t_q, h, dk)
        if cache is not None:
            k = jnp.concatenate([cache[0], k], axis=1)  # [B, A+Tq, H, dk]
            v = jnp.concatenate([cache[1], v], axis=1)
        new_cache = (k, v)
        t_k = k.shape[1]
        p = nn.Dense(self.n_feat, use_bias=False, dtype=self.dtype, name="linear_pos")(
            pos_emb
        ).reshape(pos_emb.shape[0], t_k, h, dk)

        u_bias = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (h, dk * g))
        v_bias = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (h, dk * g))

        tq_pad = (t_q + g - 1) // g * g
        tk_pad = (t_k + g - 1) // g * g

        def group(z, t_pad):
            zb, t = z.shape[0], z.shape[1]
            z = jnp.pad(z, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
            return z.reshape(zb, t_pad // g, g, h, dk).transpose(0, 1, 3, 2, 4).reshape(
                zb, t_pad // g, h, g * dk
            )

        qg = group(q, tq_pad)
        kg, vg, pg = group(k, tk_pad), group(v, tk_pad), group(p, tk_pad)
        q_u = qg + u_bias.astype(qg.dtype)[None, None]
        q_v = qg + v_bias.astype(qg.dtype)[None, None]
        ac = jnp.einsum("bthd,bshd->bhts", q_u, kg)
        bd = jnp.einsum("bthd,pshd->bhts", q_v, pg)
        scores = (ac + bd) / math.sqrt(dk * g)

        gmask = None
        if mask is not None:
            m = jnp.pad(mask, ((0, 0), (0, 0), (0, tk_pad - t_k)))[:, :, ::g]
            if m.shape[1] > 1:  # [B, Tq, Tk] query-dependent mask
                m = jnp.pad(m, ((0, 0), (0, tq_pad - t_q), (0, 0)))[:, ::g, :]
            gmask = m
        attn = masked_softmax(scores, None if gmask is None else gmask[:, None])
        out = jnp.einsum("bhts,bshd->bthd", attn, vg)  # [B, Tq/g, H, g*dk]
        out = out.reshape(b, tq_pad // g, h, g, dk).transpose(0, 1, 3, 2, 4).reshape(
            b, tq_pad, h * dk
        )[:, :t_q]
        return nn.Dense(self.n_feat, dtype=self.dtype, name="linear_out")(out), new_cache


class StridedConvModule(nn.Module):
    """Conformer conv module whose depthwise conv strides, halving T.

    Causal mode left-pads `kernel-1` frames (streamed via a post-GLU cache at
    the module's input rate); non-causal keeps wenet's symmetric padding.
    """

    channels: int
    kernel_size: int
    stride: int
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_pad, cache=None, deterministic=True):
        c = self.channels
        if mask_pad is not None:
            x = jnp.where(mask_pad.transpose(0, 2, 1), x, 0)
        y = nn.Dense(2 * c, dtype=self.dtype, name="pointwise_conv1")(x)
        y = y[..., :c] * nn.sigmoid(y[..., c:])
        new_cache = None
        if self.causal:
            lorder = self.kernel_size - 1
            if cache is None:
                y = jnp.pad(y, ((0, 0), (lorder, 0), (0, 0)))
            else:
                y = jnp.concatenate([cache.astype(y.dtype), y], axis=1)
                new_cache = y[:, -lorder:] if lorder > 0 else y[:, :0]
            padding = "VALID"
        else:
            pad = (self.kernel_size - 1) // 2
            padding = [(pad, pad)]
        y = nn.Conv(c, (self.kernel_size,), strides=(self.stride,),
                    padding=padding, feature_group_count=c, dtype=self.dtype,
                    name="depthwise_conv")(y)
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        y = y * nn.sigmoid(y)
        y = nn.Dense(c, dtype=self.dtype, name="pointwise_conv2")(y)
        return y, new_cache


class EfficientConformerBlock(nn.Module):
    cfg: EfficientConformerConfig
    strided: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, att_mask, pos_emb, mask_pad, att_cache=None,
                 cnn_cache=None, deterministic=True):
        c = self.cfg
        d = c.output_size
        drop = lambda y: nn.Dropout(c.dropout_rate)(y, deterministic=deterministic)
        ffn = lambda name: PositionwiseFeedForward(
            c.linear_units, d, c.dropout_rate, c.activation_type, self.dtype, name=name
        )

        x = x + 0.5 * drop(ffn("ff_macaron")(nn.LayerNorm(dtype=self.dtype, name="norm_ff_macaron")(x), deterministic))

        y, new_att_cache = GroupedRelPositionAttention(
            c.attention_heads, d, c.group_size, c.dropout_rate, self.dtype,
            name="self_attn",
        )(nn.LayerNorm(dtype=self.dtype, name="norm_mha")(x), att_mask, pos_emb,
          att_cache, deterministic)
        x = x + drop(y)

        conv_in = nn.LayerNorm(dtype=self.dtype, name="norm_conv")(x)
        if self.strided:
            y, new_cnn_cache = StridedConvModule(
                d, c.cnn_module_kernel, c.stride, c.causal, self.dtype,
                name="conv_module",
            )(conv_in, mask_pad, cnn_cache, deterministic)
            # average-pool residual to the strided rate
            t = x.shape[1]
            t_pad = (t + c.stride - 1) // c.stride * c.stride
            xr = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
            residual = xr.reshape(x.shape[0], t_pad // c.stride, c.stride, d).mean(2)
            x = residual[:, : y.shape[1]] + drop(y)
        else:
            y, new_cnn_cache = ConvolutionModule(
                d, c.cnn_module_kernel, "layer_norm", causal=c.causal,
                dtype=self.dtype, name="conv_module",
            )(conv_in, mask_pad, cnn_cache, deterministic)
            x = x + drop(y)

        x = x + 0.5 * drop(ffn("ff")(nn.LayerNorm(dtype=self.dtype, name="norm_ff")(x), deterministic))
        return nn.LayerNorm(dtype=self.dtype, name="norm_final")(x), new_att_cache, new_cnn_cache


# shared multi-rate streaming cache machinery (also used by squeezeformer)
from tpuasr.streaming.family_cache import (  # noqa: E402
    FamilyStreamState as EfficientConformerStreamState,
    init_family_state,
    rate_view as _rate_view,
    roll_cache,
)


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

    @property
    def subsampling_rate(self):
        return SUBSAMPLE_CLASSES[self.cfg.input_layer].subsampling_rate

    @property
    def right_context(self):
        return SUBSAMPLE_CLASSES[self.cfg.input_layer].right_context

    def layer_factor(self, i: int) -> int:
        """Downsampling factor of layer i's *input* relative to the embed
        output (wenet calculate_downsampling_factor, encoder.py:233-242)."""
        f = 1
        for s in self.cfg.stride_layer_idx:
            if i > s:
                f *= self.cfg.stride
        return f

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
            ys, _, _ = blk(ys, chunk_masks, pos_emb, masks,
                           deterministic=deterministic)
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

    # ------------------------------------------------------------------
    # streaming
    # ------------------------------------------------------------------

    def init_stream_state(self, batch: int, chunk_size: int,
                          num_left_chunks: int) -> EfficientConformerStreamState:
        """Zeroed per-layer caches. Streaming requires causal convs and a
        chunk size divisible by `stride * group_size` at every rate so the
        stride grid and the attention group grid stay absolutely aligned."""
        c = self.cfg
        assert c.causal, "efficient-conformer streaming requires causal=True"
        for i in range(c.num_blocks):
            f = self.layer_factor(i)
            assert chunk_size % (f * c.group_size) == 0, (
                f"chunk {chunk_size} must be divisible by factor {f} * "
                f"group_size {c.group_size} for layer {i}"
            )
        return init_family_state(
            batch, chunk_size, num_left_chunks, c.num_blocks,
            self.layer_factor, c.attention_heads,
            c.output_size // c.attention_heads, c.cnn_module_kernel - 1,
            c.output_size, self.dtype,
        )

    def forward_chunk(self, xs: jnp.ndarray, state: EfficientConformerStreamState):
        """One streaming step -> ([B, chunk / total_stride, D], new state).

        `xs` is the raw feature window
        `(chunk - 1) * subsampling_rate + right_context + 1`.
        """
        c = self.cfg
        b = xs.shape[0]
        stride_idx = set(c.stride_layer_idx)

        ys = self.embed(xs)  # [B, chunk, D]
        chunk = ys.shape[1]
        ys = ys * jnp.asarray(self.pe.xscale, ys.dtype)

        a0 = state.att[0][0].shape[1]

        def rate_view(factor):
            return _rate_view(self.pe, state.offset, a0, chunk, b, factor,
                              ys.dtype)

        new_att = [None] * c.num_blocks
        new_cnn = [None] * c.num_blocks
        factor = 1
        pos_emb, att_mask = rate_view(1)
        for i, blk in enumerate(self.blocks):
            k_cache, v_cache = state.att[i]
            ys, (k_full, v_full), cnn_new = blk(
                ys, att_mask, pos_emb, mask_pad=None,
                att_cache=(k_cache, v_cache), cnn_cache=state.cnn[i],
                deterministic=True,
            )
            new_att[i] = roll_cache(k_full, v_full, k_cache.shape[1])
            new_cnn[i] = cnn_new if cnn_new is not None else state.cnn[i]
            if i in stride_idx:
                factor *= c.stride
                pos_emb, att_mask = rate_view(factor)

        ys = self.after_norm(ys)
        new_state = EfficientConformerStreamState(
            att=tuple(new_att), cnn=tuple(new_cnn), offset=state.offset + chunk
        )
        return ys, new_state
