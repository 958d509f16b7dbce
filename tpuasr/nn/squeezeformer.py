"""Squeezeformer encoder — full-context / chunk-masked forward and cached
chunk streaming.

Parity: wenet/squeezeformer/ (SURVEY §2.4) — the distinguishing mechanics:
U-Net-style temporal reduction (halve the frame rate at `reduce_idx`, recover
at `recover_idx` with a learned upsample + skip connection,
encoder.py:209-237), post-norm blocks in MHSA→FFN→Conv→FFN order with
per-submodule adaptive scale/bias (encoder_layer.py:21-180), depthwise conv
subsampling, rel-pos attention.

Streaming (wenet encoder.py:266-406 contract, redesigned for XLA static
shapes): wenet stores one full-rate att cache per layer and re-expands the
reduced-rate layers' caches by `repeat_interleave(factor)` each chunk
(encoder.py:388-396). Here each layer keeps a fixed-capacity cache *at its own
frame rate* — full-rate layers hold `A = chunk * left_chunks` key/value slots,
reduced-rate layers hold `A / 2` — so no repeat/subsample round-trip happens
and every chunk step compiles once. Positional encodings for reduced-rate
layers index the table at stride `factor` (the streaming analog of the full
forward's `pos_emb[:, ::2]`, encoder.py:219). Streaming requires
`causal=True` (cached depthwise conv) and the chunk-local
`time_reduction_type="stream"` (TimeReductionLayerStream,
subsampling.py:241-321: kernel 1, stride 2 — no cross-chunk receptive field);
under those flags chunked output equals the full-context chunk-masked forward
exactly (tests/test_streaming_families.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuasr.config import EncoderConfig
from tpuasr.nn.attention import RelPositionMultiHeadedAttention
from tpuasr.nn.convolution import ConvolutionModule
from tpuasr.nn.embedding import PositionalEncodingTable
from tpuasr.nn.conformer import ACTIVATIONS, PositionwiseFeedForward
from tpuasr.nn.masks import add_optional_chunk_mask, make_pad_mask


@dataclass
class SqueezeformerConfig:
    input_size: int = 80
    encoder_dim: int = 256
    output_size: int = 256
    attention_heads: int = 4
    num_blocks: int = 12
    reduce_idx: tuple = (5,)
    recover_idx: tuple = (11,)
    feed_forward_expansion_factor: int = 4
    cnn_module_kernel: int = 31
    adaptive_scale: bool = True
    dropout_rate: float = 0.1
    activation_type: str = "swish"
    max_len: int = 5000
    use_dynamic_chunk: bool = False
    static_chunk_size: int = 0
    causal: bool = False
    # "conv": k=5 s=2 symmetric-pad depthwise (TimeReductionLayer1D parity,
    #   full-context only); "stream": k=1 s=2 chunk-local
    #   (TimeReductionLayerStream parity, required for cached streaming)
    time_reduction_type: str = "conv"


class AdaptiveScale(nn.Module):
    """Learnable elementwise scale+bias on a submodule input
    (wenet squeezeformer adaptive_scale)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class DepthwiseConv2dSubsampling4(nn.Module):
    """Conv2d stride-2 then depthwise conv2d stride-2 (squeezeformer
    subsampling) + linear projection; rate 4, right_context 6."""

    odim: int
    dtype: jnp.dtype = jnp.float32
    subsampling_rate = 4
    right_context = 6

    @nn.compact
    def __call__(self, x):
        y = x[..., None]
        y = nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name="pw_conv")(y))
        y = nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                            feature_group_count=self.odim, dtype=self.dtype,
                            name="dw_conv")(y))
        b, t, f, c = y.shape
        return nn.Dense(self.odim, dtype=self.dtype, name="out")(y.reshape(b, t, f * c))

    @staticmethod
    def output_len(t):
        return (((t - 1) // 2) - 1) // 2


class TimeReductionLayer(nn.Module):
    """Depthwise conv (k=5, s=2) halving the frame rate
    (wenet squeezeformer subsampling.py:95-180). Symmetric padding looks
    ahead 2 frames — full-context configs only."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_pad):
        # zero padded frames, depthwise temporal conv stride 2
        if mask_pad is not None:
            x = jnp.where(mask_pad.transpose(0, 2, 1), x, 0)
        y = nn.Conv(self.dim, (5,), strides=(2,), padding=[(2, 2)],
                    feature_group_count=self.dim, dtype=self.dtype, name="dw")(x)
        y = nn.Conv(self.dim, (1,), dtype=self.dtype, name="pw")(y)
        if mask_pad is None:
            return y, None
        new_mask = mask_pad[:, :, ::2]
        return jnp.where(new_mask.transpose(0, 2, 1), y, 0), new_mask


class TimeReductionLayerStream(nn.Module):
    """Chunk-local time reduction: depthwise conv k=1 s=2 + pointwise
    (wenet TimeReductionLayerStream, subsampling.py:241-321). Zero receptive
    field across frames, so chunked == full exactly."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_pad):
        if mask_pad is not None:
            x = jnp.where(mask_pad.transpose(0, 2, 1), x, 0)
        y = nn.Conv(self.dim, (1,), strides=(2,), padding="VALID",
                    feature_group_count=self.dim, dtype=self.dtype, name="dw")(x)
        y = nn.Conv(self.dim, (1,), dtype=self.dtype, name="pw")(y)
        if mask_pad is None:
            return y, None
        new_mask = mask_pad[:, :, ::2]
        return jnp.where(new_mask.transpose(0, 2, 1), y, 0), new_mask


class SqueezeformerBlock(nn.Module):
    cfg: SqueezeformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, att_mask, pos_emb, mask_pad, att_cache=None,
                 cnn_cache=None, deterministic=True):
        c = self.cfg
        d = c.encoder_dim
        drop = lambda y: nn.Dropout(c.dropout_rate)(y, deterministic=deterministic)
        scale = (lambda name: AdaptiveScale(d, name=name)) if c.adaptive_scale else (
            lambda name: (lambda v: v)
        )
        ffn = lambda name: PositionwiseFeedForward(
            d * c.feed_forward_expansion_factor, d, c.dropout_rate,
            c.activation_type, self.dtype, name=name,
        )

        # MHSA (post-norm)
        residual = x
        y, new_att_cache = RelPositionMultiHeadedAttention(
            c.attention_heads, d, c.dropout_rate, self.dtype, name="self_attn"
        )(scale("scale_att")(x), att_mask, pos_emb, att_cache, deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="ln1")(residual + drop(y))

        # FFN 1
        residual = x
        y = ffn("ffn1")(scale("scale_ffn1")(x), deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="ln2")(residual + drop(y))

        # Conv
        residual = x
        y, new_cnn_cache = ConvolutionModule(
            d, c.cnn_module_kernel, "layer_norm", causal=c.causal,
            dtype=self.dtype, name="conv",
        )(scale("scale_conv")(x), mask_pad, cnn_cache, deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="ln3")(residual + drop(y))

        # FFN 2
        residual = x
        y = ffn("ffn2")(scale("scale_ffn2")(x), deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="ln4")(residual + drop(y))
        return x, new_att_cache, new_cnn_cache


# shared multi-rate streaming cache machinery (also used by the
# efficient-conformer family)
from tpuasr.streaming.family_cache import (  # noqa: E402
    FamilyStreamState as SqueezeformerStreamState,
    init_family_state,
    rate_view as _rate_view,
    roll_cache,
)


class SqueezeformerEncoder(nn.Module):
    cfg: SqueezeformerConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.embed = DepthwiseConv2dSubsampling4(c.encoder_dim, self.dtype, name="embed")
        self.pe = PositionalEncodingTable(c.encoder_dim, c.max_len)
        self.preln = nn.LayerNorm(dtype=self.dtype, name="preln")
        self.blocks = [
            SqueezeformerBlock(c, self.dtype, name=f"block{i}")
            for i in range(c.num_blocks)
        ]
        if c.reduce_idx:
            red_cls = (TimeReductionLayerStream if c.time_reduction_type == "stream"
                       else TimeReductionLayer)
            self.time_reduction = red_cls(c.encoder_dim, self.dtype,
                                          name="time_reduction")
        if c.recover_idx:
            self.time_recover = nn.Dense(c.encoder_dim, dtype=self.dtype,
                                         name="time_recover")
        if c.output_size != c.encoder_dim:
            self.final_proj = nn.Dense(c.output_size, dtype=self.dtype,
                                       name="final_proj")

    @property
    def subsampling_rate(self):
        return 4

    @property
    def right_context(self):
        return 6

    def layer_factor(self, i: int) -> int:
        """Frame-rate downsampling factor seen by layer i's attention
        (wenet calculate_downsampling_factor, encoder.py:252-264)."""
        c = self.cfg
        f = 1
        for rd in c.reduce_idx or ():
            if i >= rd:
                f *= 2
        for rc in c.recover_idx or ():
            if i >= rc:
                f //= 2
        return max(f, 1)

    def __call__(self, xs, xs_lens, decoding_chunk_size: int = 0,
                 num_decoding_left_chunks: int = -1, chunk_rng=None,
                 deterministic: bool = True):
        c = self.cfg
        b, t, _ = xs.shape
        masks = ~make_pad_mask(xs_lens, t)[:, None, :]
        ys = self.embed(xs)
        masks = masks[:, :, 2::2][:, :, 2::2]
        ys, pos_emb = self.pe.rel(ys, 0)
        if c.use_dynamic_chunk and decoding_chunk_size == 0 and chunk_rng is None:
            decoding_chunk_size = -1
        chunk_masks = add_optional_chunk_mask(
            masks,
            use_dynamic_chunk=c.use_dynamic_chunk,
            use_dynamic_left_chunk=False,
            decoding_chunk_size=decoding_chunk_size,
            static_chunk_size=c.static_chunk_size,
            num_decoding_left_chunks=num_decoding_left_chunks,
            rng=chunk_rng,
        )
        ys = self.preln(ys)

        stack = []  # (ys, chunk_masks, pos_emb, masks) at each reduction
        reduce_idx = set(c.reduce_idx or ())
        recover_idx = set(c.recover_idx or ())
        for i, blk in enumerate(self.blocks):
            if i in reduce_idx:
                stack.append((ys, chunk_masks, pos_emb, masks))
                ys, masks = self.time_reduction(ys, masks)
                chunk_masks = chunk_masks[:, ::2, ::2]
                pos_emb = pos_emb[:, ::2]
            if i in recover_idx and stack:
                rec_ys, chunk_masks, pos_emb, masks = stack.pop()
                up = jnp.repeat(ys, 2, axis=1)[:, : rec_ys.shape[1]]
                ys = rec_ys + self.time_recover(up)
                ys = jnp.where(masks.transpose(0, 2, 1), ys, 0)
            ys, _, _ = blk(ys, chunk_masks, pos_emb, masks,
                           deterministic=deterministic)

        if c.output_size != c.encoder_dim:
            ys = self.final_proj(ys)
        return ys, masks

    # ------------------------------------------------------------------
    # streaming
    # ------------------------------------------------------------------

    def init_stream_state(self, batch: int, chunk_size: int,
                          num_left_chunks: int) -> SqueezeformerStreamState:
        """Zeroed per-layer caches. Streaming requires causal convs, the
        chunk-local "stream" time reduction, and an even chunk size (the
        reduced-rate region advances by chunk/2 per step)."""
        c = self.cfg
        assert c.causal, "squeezeformer streaming requires causal=True"
        assert c.time_reduction_type == "stream" or not c.reduce_idx, (
            "squeezeformer streaming requires time_reduction_type='stream'"
        )
        assert chunk_size % 2 == 0 or not c.reduce_idx, "chunk must be even"
        return init_family_state(
            batch, chunk_size, num_left_chunks, c.num_blocks,
            self.layer_factor, c.attention_heads,
            c.encoder_dim // c.attention_heads, c.cnn_module_kernel - 1,
            c.encoder_dim, self.dtype,
        )

    def forward_chunk(self, xs: jnp.ndarray, state: SqueezeformerStreamState):
        """One streaming step -> ([B, chunk, D], new state).

        `xs` is the raw feature window
        `(chunk - 1) * subsampling_rate + right_context + 1` (overlap
        subsampling, wenet encoder.py:424-435 rationale).
        """
        c = self.cfg
        b = xs.shape[0]
        reduce_idx = set(c.reduce_idx or ())
        recover_idx = set(c.recover_idx or ())

        ys = self.embed(xs)  # [B, chunk, D]
        chunk = ys.shape[1]
        ys = ys * jnp.asarray(self.pe.xscale, ys.dtype)
        ys = self.preln(ys)

        a0 = state.att[0][0].shape[1] * self.layer_factor(0)

        def rate_view(factor):
            return _rate_view(self.pe, state.offset, a0, chunk, b, factor,
                              ys.dtype)

        new_att = [None] * c.num_blocks
        new_cnn = [None] * c.num_blocks
        stack = []
        factor = 1
        pos_emb, att_mask = rate_view(1)
        for i, blk in enumerate(self.blocks):
            if i in reduce_idx:
                stack.append((ys, pos_emb, att_mask, factor))
                ys, _ = self.time_reduction(ys, None)
                factor *= 2
                pos_emb, att_mask = rate_view(factor)
            if i in recover_idx and stack:
                rec_ys, pos_emb, att_mask, factor = stack.pop()
                up = jnp.repeat(ys, 2, axis=1)[:, : rec_ys.shape[1]]
                ys = rec_ys + self.time_recover(up)
            k_cache, v_cache = state.att[i]
            ys, (k_full, v_full), cnn_new = blk(
                ys, att_mask, pos_emb, mask_pad=None,
                att_cache=(k_cache, v_cache), cnn_cache=state.cnn[i],
                deterministic=True,
            )
            new_att[i] = roll_cache(k_full, v_full, k_cache.shape[1])
            new_cnn[i] = cnn_new if cnn_new is not None else state.cnn[i]

        if c.output_size != c.encoder_dim:
            ys = self.final_proj(ys)
        new_state = SqueezeformerStreamState(
            att=tuple(new_att), cnn=tuple(new_cnn), offset=state.offset + chunk
        )
        return ys, new_state
