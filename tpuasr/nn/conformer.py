"""Conformer encoder: full-context / chunk-masked training forward and the
fixed-shape streaming `forward_chunk`.

Parity contracts (re-designed for XLA static shapes, not transliterated):

- training forward — wenet/transformer/encoder.py:121-180: pad mask →
  subsample+embed → optional dynamic/static chunk mask → layer stack → final LN;
- layer order — wenet/transformer/encoder_layer.py:130-265: ½FF(macaron) →
  rel-pos MHA → conv module → ½FF → final LN, pre-norm residuals;
- streaming — wenet encoder.py:203-299 `forward_chunk`, with one structural
  change: the attention cache is a *fixed-capacity* right-aligned ring window
  [L, B, A, H, dk] (A = chunk_size * num_left_chunks) with a validity counter,
  instead of wenet's dynamically growing tensor, so every chunk step compiles
  once. Key positions are recovered from the stream offset and clamped; the
  invalid left slots are masked out of the softmax. Chunked output equals the
  full-context chunk-masked forward exactly (see tests/test_streaming.py).

Batching: unlike the reference (b=1 assert, encoder.py:252), all streaming
entry points are batched — B parallel streams advance in lockstep.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuasr.config import EncoderConfig
from tpuasr.nn.attention import (
    FireRedRelPositionAttention,
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
    RopeMultiHeadedAttention,
    ShawRelPositionMultiHeadedAttention,
)
from tpuasr.nn.convolution import ConvolutionModule
from tpuasr.nn.embedding import PositionalEncodingTable
from tpuasr.nn.masks import add_optional_chunk_mask, make_pad_mask
from tpuasr.nn.subsampling import SUBSAMPLE_CLASSES, subsampled_mask


def swish(x):
    return x * nn.sigmoid(x)


ACTIVATIONS = {"swish": swish, "relu": nn.relu, "gelu": nn.gelu}


def attention_type_of(c) -> str:
    """Resolve the configured attention family (wenet class_utils
    WENET_ATTENTION_CLASSES role): explicit `attention_type`, else derived
    from the positional-encoding type."""
    explicit = getattr(c, "attention_type", "")
    if explicit:
        return explicit
    return "rel_pos" if c.pos_enc_layer_type == "rel_pos" else "mha"


class PositionwiseFeedForward(nn.Module):
    hidden: int
    out: int
    dropout_rate: float
    activation: str = "swish"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        y = nn.Dense(self.hidden, dtype=self.dtype, name="w_1")(x)
        y = ACTIVATIONS[self.activation](y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        return nn.Dense(self.out, dtype=self.dtype, name="w_2")(y)


class GatedVariantsMLP(nn.Module):
    """SwiGLU-style gated MLP (wenet positionwise_feed_forward.py:124-159)."""

    hidden: int
    out: int
    dropout_rate: float
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        gate = ACTIVATIONS[self.activation](
            nn.Dense(self.hidden, use_bias=False, dtype=self.dtype, name="gate")(x)
        )
        up = nn.Dense(self.hidden, dtype=self.dtype, name="w_1")(x)
        fuse = nn.Dropout(self.dropout_rate)(gate * up, deterministic=deterministic)
        return nn.Dense(self.out, dtype=self.dtype, name="w_2")(fuse)


class MoEFFNLayer(nn.Module):
    """Top-k routed mixture-of-experts FFN (wenet
    positionwise_feed_forward.py:61-121 parity).

    TPU-native dispatch: expert weights are stacked [E, D, H] and every token
    runs through every expert as one batched einsum, combined by the router's
    top-k softmax weights — no scatter/gather, fully MXU-shaped. (The
    reference loops over experts with boolean indexing on GPU.) Expert
    parallelism (experts sharded over the `model` axis + all-to-all) is the
    natural extension when n_expert grows.
    """

    hidden: int
    out: int
    dropout_rate: float
    n_expert: int = 8
    n_expert_activated: int = 2
    activation: str = "swish"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        d = x.shape[-1]
        router = nn.Dense(self.n_expert, use_bias=False, dtype=self.dtype, name="gate")(x)
        top_logits, top_idx = jax.lax.top_k(router, self.n_expert_activated)
        weights = jax.nn.softmax(top_logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        # dense per-expert weight: combine[.., e] = sum_k weights_k * (top_idx_k == e)
        combine = jnp.sum(
            weights[..., None] * jax.nn.one_hot(top_idx, self.n_expert, dtype=x.dtype),
            axis=-2,
        )  # [..., E]

        w1 = self.param("w1", nn.initializers.lecun_normal(),
                        (self.n_expert, d, self.hidden))
        w2 = self.param("w2", nn.initializers.lecun_normal(),
                        (self.n_expert, self.hidden, self.out))
        h = ACTIVATIONS[self.activation](
            jnp.einsum("...d,edh->...eh", x, w1.astype(x.dtype))
        )
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        y = jnp.einsum("...eh,eho->...eo", h, w2.astype(x.dtype))
        return jnp.sum(combine[..., None] * y, axis=-2)


MLP_CLASSES = {
    "position_wise_feed_forward": PositionwiseFeedForward,
    "gated": GatedVariantsMLP,
    "moe": MoEFFNLayer,
}


class ConformerBlock(nn.Module):
    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        d = c.output_size
        mlp_type = getattr(c, "mlp_type", "position_wise_feed_forward")
        if mlp_type == "moe":
            ffn = lambda name: MoEFFNLayer(
                c.linear_units, d, c.dropout_rate,
                n_expert=getattr(c, "n_expert", 8),
                n_expert_activated=getattr(c, "n_expert_activated", 2),
                activation=c.activation_type, dtype=self.dtype, name=name,
            )
        elif mlp_type == "gated":
            ffn = lambda name: GatedVariantsMLP(
                c.linear_units, d, c.dropout_rate, "gelu", self.dtype, name=name
            )
        else:
            ffn = lambda name: PositionwiseFeedForward(
                c.linear_units, d, c.dropout_rate, c.activation_type, self.dtype, name=name
            )
        if c.macaron_style:
            self.feed_forward_macaron = ffn("feed_forward_macaron")
            self.norm_ff_macaron = nn.LayerNorm(dtype=self.dtype, name="norm_ff_macaron")
        self.feed_forward = ffn("feed_forward")
        att_type = attention_type_of(c)
        n_kv = getattr(c, "n_kv_head", 0)
        if att_type == "rel_pos":
            self.self_attn = RelPositionMultiHeadedAttention(
                c.attention_heads, d, c.attention_dropout_rate, self.dtype,
                fused=getattr(c, "fused_attention", False), name="self_attn"
            )
        elif att_type == "shaw_rel_pos":
            self.self_attn = ShawRelPositionMultiHeadedAttention(
                c.attention_heads, d, c.attention_dropout_rate, self.dtype, name="self_attn"
            )
        elif att_type == "firered_rel_pos":
            self.self_attn = FireRedRelPositionAttention(
                c.attention_heads, d, c.attention_dropout_rate, self.dtype, name="self_attn"
            )
        elif att_type == "rope":
            self.self_attn = RopeMultiHeadedAttention(
                c.attention_heads, d, c.attention_dropout_rate, self.dtype,
                n_kv_head=n_kv, name="self_attn"
            )
        else:
            self.self_attn = MultiHeadedAttention(
                c.attention_heads, d, c.attention_dropout_rate, self.dtype,
                n_kv_head=n_kv, name="self_attn"
            )
        self.norm_mha = nn.LayerNorm(dtype=self.dtype, name="norm_mha")
        self.norm_ff = nn.LayerNorm(dtype=self.dtype, name="norm_ff")
        if c.use_cnn_module:
            self.conv_module = ConvolutionModule(
                d, c.cnn_module_kernel, c.cnn_module_norm, c.causal, dtype=self.dtype,
                name="conv_module",
            )
            self.norm_conv = nn.LayerNorm(dtype=self.dtype, name="norm_conv")
            self.norm_final = nn.LayerNorm(dtype=self.dtype, name="norm_final")
        self.dropout = nn.Dropout(c.dropout_rate)

    def __call__(
        self,
        x: jnp.ndarray,
        att_mask: Optional[jnp.ndarray],
        pos_emb: jnp.ndarray,
        mask_pad: Optional[jnp.ndarray] = None,
        att_cache=None,
        cnn_cache=None,
        deterministic: bool = True,
    ):
        c = self.cfg
        ff_scale = 0.5 if c.macaron_style else 1.0
        drop = lambda y: self.dropout(y, deterministic=deterministic)

        def ffn_branch(ffn_mod, norm_mod, h):
            """h + ff_scale * drop(ffn(norm(h))) — via the fused Pallas FFN
            (ops/ffn_pallas.py: LN+matmuls+swish+dropout+residual in one
            VMEM pass, in-kernel PRNG dropout) when enabled and applicable,
            else the module chain. Parameter layout identical either way."""
            if (getattr(c, "fused_ffn", False) and not self.is_initializing()
                    and getattr(c, "mlp_type", "position_wise_feed_forward")
                    == "position_wise_feed_forward"
                    and c.activation_type == "swish"):
                from tpuasr.ops.ffn_pallas import fused_ffn

                p = ffn_mod.variables["params"]
                n = norm_mod.variables["params"]
                b_, t_, d_ = h.shape
                if not deterministic and c.dropout_rate > 0.0:
                    # keep-masks drawn OUTSIDE the kernel from the step's
                    # dropout stream (RBG-fast); the custom_vjp saves them
                    # so fwd and bwd apply identical masks (the in-kernel
                    # hardware PRNG is not reproducible across the two
                    # kernel programs — measured, ops/ffn_pallas.py)
                    k1, k2 = jax.random.split(self.make_rng("dropout"))
                    keep = 1.0 - c.dropout_rate
                    m1 = jax.random.bernoulli(
                        k1, keep, (b_ * t_, c.linear_units)).astype(jnp.uint8)
                    m2 = jax.random.bernoulli(
                        k2, keep, (b_ * t_, d_)).astype(jnp.uint8)
                else:
                    m1 = m2 = None
                y = fused_ffn(
                    h.reshape(b_ * t_, d_), n["scale"], n["bias"],
                    p["w_1"]["kernel"].astype(self.dtype), p["w_1"]["bias"],
                    p["w_2"]["kernel"].astype(self.dtype), p["w_2"]["bias"],
                    m1, m2, c.dropout_rate, ff_scale, deterministic)
                return y.reshape(b_, t_, d_)
            return h + ff_scale * drop(ffn_mod(norm_mod(h), deterministic))

        if c.macaron_style:
            x = ffn_branch(self.feed_forward_macaron, self.norm_ff_macaron, x)

        att_in = self.norm_mha(x)
        x_att, new_att_cache = self.self_attn(
            att_in, att_mask, pos_emb, att_cache, deterministic
        )
        x = x + drop(x_att)

        new_cnn_cache = None
        if c.use_cnn_module:
            y, new_cnn_cache = self.conv_module(
                self.norm_conv(x), mask_pad, cnn_cache, deterministic
            )
            x = x + drop(y)

        x = ffn_branch(self.feed_forward, self.norm_ff, x)

        if c.use_cnn_module:
            x = self.norm_final(x)
        return x, new_att_cache, new_cnn_cache


class ConformerLayerStack(nn.Module):
    """`num_blocks` identical conformer layers as ONE scanned block body over
    stacked parameters (leading layer axis), instead of `num_blocks` unrolled
    program clones.

    XLA compiles the unrolled stack into thousands of per-layer fusion/copy
    programs (r03 trace: 2,365 fusion + 3,390 copy invocations per train
    step); `lax.scan` compiles the body once and iterates, so dispatch and
    program count drop by ~num_blocks. Both the training forward (caches=None)
    and the streaming `forward_chunk` (per-layer KV/conv caches as the scan
    xs/ys) share the same body. Parameters live under `block` with a leading
    [L] axis; `stack_layer_params`/`unstack_layer_params` convert checkpoints
    between the unrolled and scanned layouts.
    """

    cfg: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ys, att_mask, pos_emb, masks=None, caches=None,
                 deterministic=True):
        c = self.cfg
        block = ConformerBlock(c, self.dtype, name="block")

        if caches is None:
            def body(blk, carry, _):
                y, _, _ = blk(carry, att_mask, pos_emb, masks,
                              deterministic=deterministic)
                return y, None

            ys, _ = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=c.num_blocks,
                unroll=getattr(c, "scan_unroll", 1),
            )(block, ys, None)
            return ys, None

        chunk = ys.shape[1]

        def body(blk, carry, cache):
            k, v, cnn = cache
            a = k.shape[1]
            y, (k_full, v_full), cnn_new = blk(
                carry, att_mask, pos_emb, mask_pad=None,
                att_cache=(k, v), cnn_cache=cnn, deterministic=True)
            # keep the newest A frames of the [B, A+chunk] window
            new_k = k_full[:, chunk:] if a > 0 else k_full[:, :0]
            new_v = v_full[:, chunk:] if a > 0 else v_full[:, :0]
            return y, (new_k, new_v, cnn_new if cnn_new is not None else cnn)

        ys, new_caches = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=c.num_blocks,
            unroll=getattr(c, "scan_unroll", 1),
        )(block, ys, caches)
        return ys, new_caches


def stack_layer_params(enc_params: dict, num_blocks: int) -> dict:
    """Convert an unrolled encoder param tree (block0..block{L-1}) to the
    scanned layout (layers/block with a leading [L] axis) so pre-scan
    checkpoints load into `scan_layers=True` models. Optimizer-moment trees
    with the same structure convert identically."""
    blocks = [enc_params[f"block{i}"] for i in range(num_blocks)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    out = {k: v for k, v in enc_params.items()
           if not (k.startswith("block") and k[5:].isdigit())}
    out["layers"] = {"block": stacked}
    return out


def unstack_layer_params(enc_params: dict, num_blocks: int) -> dict:
    """Inverse of `stack_layer_params`."""
    stacked = enc_params["layers"]["block"]
    out = {k: v for k, v in enc_params.items() if k != "layers"}
    for i in range(num_blocks):
        out[f"block{i}"] = jax.tree.map(lambda x, i=i: x[i], stacked)
    return out


@dataclass
class EncoderStreamState:
    """Pytree of fixed-shape streaming caches for one batch of streams.

    att_k/att_v: [L, B, A, H, dk] right-aligned (newest last), A = capacity.
    cnn:        [L, B, lorder, D] post-GLU left context per conv module.
    offset:     [] int32 — encoder frames consumed so far (shared by batch).
    """

    att_k: jnp.ndarray
    att_v: jnp.ndarray
    cnn: jnp.ndarray
    offset: jnp.ndarray


jax.tree_util.register_dataclass(
    EncoderStreamState,
    data_fields=["att_k", "att_v", "cnn", "offset"],
    meta_fields=[],
)


class ConformerEncoder(nn.Module):
    """Stack of conformer blocks over a conv-subsampled input."""

    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.embed = SUBSAMPLE_CLASSES[c.input_layer](c.output_size, self.dtype, name="embed")
        self.pe = PositionalEncodingTable(c.output_size, c.max_len)
        if c.pos_enc_layer_type == "abs_pos_learnable":
            # whisper-decoder-style learned positions (embedding.py:167-175)
            self.learned_pe = self.param(
                "learned_pe", nn.initializers.normal(stddev=0.02),
                (c.max_len, c.output_size),
            )
        if getattr(c, "scan_layers", False):
            # one scanned body over stacked [L, ...] params instead of
            # num_blocks unrolled program clones (see ConformerLayerStack)
            self.layer_stack = ConformerLayerStack(c, self.dtype, name="layers")
            self.blocks = None
        else:
            self.blocks = [
                ConformerBlock(c, self.dtype, name=f"block{i}")
                for i in range(c.num_blocks)
            ]
        self.after_norm = nn.LayerNorm(dtype=self.dtype, name="after_norm")
        self.pos_dropout = nn.Dropout(c.positional_dropout_rate)

    def _abs_pe_window(self, offset, size):
        """PE window for the abs-pos variants (xscale-1 families add it
        directly to the features)."""
        c = self.cfg
        if c.pos_enc_layer_type == "abs_pos_whisper":
            from tpuasr.nn.embedding import whisper_sinusoid_table

            table = jnp.asarray(
                whisper_sinusoid_table(c.max_len, c.output_size)
            )
        elif c.pos_enc_layer_type == "abs_pos_learnable":
            table = self.learned_pe
        else:
            return None
        if isinstance(offset, int):
            return table[offset : offset + size][None]
        idx = jnp.clip(jnp.asarray(offset) + jnp.arange(size), 0, c.max_len - 1)
        return jnp.take(table, idx, axis=0)[None]

    @property
    def subsampling_rate(self) -> int:
        return SUBSAMPLE_CLASSES[self.cfg.input_layer].subsampling_rate

    @property
    def right_context(self) -> int:
        return SUBSAMPLE_CLASSES[self.cfg.input_layer].right_context

    def __call__(
        self,
        xs: jnp.ndarray,  # [B, T, F]
        xs_lens: jnp.ndarray,  # [B]
        decoding_chunk_size: int = 0,
        num_decoding_left_chunks: int = -1,
        chunk_rng: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        """Full/chunk-masked forward -> (ys [B, T', D], pad_mask [B, 1, T'])."""
        c = self.cfg
        b, t, _ = xs.shape
        masks = ~make_pad_mask(xs_lens, t)[:, None, :]  # [B, 1, T] True=valid
        ys = self.embed(xs)
        masks = subsampled_mask(masks, c.input_layer)
        att_type = attention_type_of(c)
        if att_type == "rope":
            ys = ys * jnp.asarray(self.pe.xscale, ys.dtype)
            pos_emb = self.pe.rope_window(0, ys.shape[1],
                                          c.output_size // c.attention_heads)
        elif att_type == "firered_rel_pos":
            ys, pos_emb = self.pe.rel_bidirectional(ys)
        elif c.pos_enc_layer_type == "rel_pos":
            ys, pos_emb = self.pe.rel(ys, 0)
        elif c.pos_enc_layer_type == "no_pos":
            ys = ys * jnp.asarray(self.pe.xscale, ys.dtype)
            pos_emb = self.pe.position_encoding(0, ys.shape[1])
        elif c.pos_enc_layer_type in ("abs_pos_whisper", "abs_pos_learnable"):
            pe = self._abs_pe_window(0, ys.shape[1]).astype(ys.dtype)
            ys = ys + pe  # xscale 1 (embedding.py:150-175)
            pos_emb = pe
        else:
            ys, pos_emb = self.pe.add_abs(ys, 0)
        ys = self.pos_dropout(ys, deterministic=deterministic)

        # dynamic-chunk sampling needs an rng; without one (init / eval callers
        # that did not specify a chunk policy) fall back to full context.
        if c.use_dynamic_chunk and decoding_chunk_size == 0 and chunk_rng is None:
            decoding_chunk_size = -1
        chunk_masks = add_optional_chunk_mask(
            masks,
            use_dynamic_chunk=c.use_dynamic_chunk,
            use_dynamic_left_chunk=c.use_dynamic_left_chunk,
            decoding_chunk_size=decoding_chunk_size,
            static_chunk_size=c.static_chunk_size,
            num_decoding_left_chunks=num_decoding_left_chunks,
            rng=chunk_rng,
            max_chunk_size=c.max_chunk_size,
        )
        if self.blocks is None:
            ys, _ = self.layer_stack(ys, chunk_masks, pos_emb, masks,
                                     deterministic=deterministic)
        else:
            for blk in self.blocks:
                # rematerialization (the reference's gradient_checkpointing,
                # encoder.py:181-201) is applied at the train-step level via
                # jax.checkpoint over the whole loss fn when configured.
                ys, _, _ = blk(ys, chunk_masks, pos_emb, masks,
                               deterministic=deterministic)
        return self.after_norm(ys), masks

    # ------------------------------------------------------------------
    # streaming
    # ------------------------------------------------------------------

    def init_stream_state(self, batch: int, chunk_size: int, num_left_chunks: int):
        """Zeroed fixed-shape caches for `batch` parallel streams."""
        c = self.cfg
        h = c.attention_heads
        if attention_type_of(c) in ("mha", "rope") and getattr(c, "n_kv_head", 0):
            h = c.n_kv_head  # GQA caches K/V at the reduced head count
        dk = c.output_size // c.attention_heads
        a = chunk_size * max(num_left_chunks, 0)
        lorder = c.cnn_module_kernel - 1 if c.causal else 0
        z = jnp.zeros
        return EncoderStreamState(
            att_k=z((c.num_blocks, batch, a, h, dk), self.dtype),
            att_v=z((c.num_blocks, batch, a, h, dk), self.dtype),
            cnn=z((c.num_blocks, batch, lorder, c.output_size), self.dtype),
            offset=jnp.zeros((), jnp.int32),
        )

    def forward_chunk(
        self,
        xs: jnp.ndarray,  # [B, window, F] raw feature window for one chunk
        state: EncoderStreamState,
    ) -> tuple[jnp.ndarray, EncoderStreamState]:
        """One streaming step -> ([B, chunk, D], new state).

        `window = (chunk - 1) * subsampling_rate + right_context + 1` raw
        frames (overlapping windows; no subsampling cache — wenet
        encoder.py:320-333).
        """
        c = self.cfg
        b = xs.shape[0]
        a = state.att_k.shape[2]  # cache capacity

        ys = self.embed(xs)  # [B, chunk, D]
        chunk = ys.shape[1]
        att_type = attention_type_of(c)
        assert att_type != "firered_rel_pos", (
            "firered attention is full-context only (reference raises too, "
            "firered/model.py:50-58)"
        )
        if att_type == "rope":
            # cached keys carry their own rotation; only the current chunk's
            # absolute angles are needed
            ys = ys * jnp.asarray(self.pe.xscale, ys.dtype)
            pos_emb = self.pe.rope_window(state.offset, chunk,
                                          c.output_size // c.attention_heads)
        elif c.pos_enc_layer_type == "rel_pos":
            ys = ys * jnp.asarray(self.pe.xscale, ys.dtype)
            pos_emb = self.pe.position_encoding(state.offset - a, a + chunk).astype(ys.dtype)
        elif c.pos_enc_layer_type == "no_pos":
            ys = ys * jnp.asarray(self.pe.xscale, ys.dtype)
            pos_emb = self.pe.position_encoding(state.offset - a, a + chunk).astype(ys.dtype)
        elif c.pos_enc_layer_type in ("abs_pos_whisper", "abs_pos_learnable"):
            pe = self._abs_pe_window(state.offset, chunk).astype(ys.dtype)
            ys = ys + pe
            pos_emb = pe
        else:
            ys, _ = self.pe.add_abs(ys, state.offset)
            pos_emb = self.pe.position_encoding(state.offset - a, a + chunk).astype(ys.dtype)

        valid = jnp.minimum(state.offset, a)
        # [1, chunk, A + chunk]: attend current chunk + valid cache slots
        j = jnp.arange(a + chunk)[None, None, :]
        att_mask = jnp.broadcast_to(j >= (a - valid), (b, chunk, a + chunk))

        if self.blocks is None:
            ys, (new_k, new_v, new_cnn) = self.layer_stack(
                ys, att_mask, pos_emb, caches=(state.att_k, state.att_v, state.cnn))
            ys = self.after_norm(ys)
            return ys, EncoderStreamState(
                att_k=new_k, att_v=new_v, cnn=new_cnn,
                offset=state.offset + chunk,
            )

        new_ks, new_vs, new_cnns = [], [], []
        for i, blk in enumerate(self.blocks):
            cache_i = (state.att_k[i], state.att_v[i])
            cnn_i = state.cnn[i]
            ys, (k_full, v_full), cnn_new = blk(
                ys, att_mask, pos_emb,
                mask_pad=None,
                att_cache=cache_i,
                cnn_cache=cnn_i,
                deterministic=True,
            )
            # keep the newest A frames (window length A + chunk)
            new_ks.append(k_full[:, chunk:] if a > 0 else k_full[:, :0])
            new_vs.append(v_full[:, chunk:] if a > 0 else v_full[:, :0])
            new_cnns.append(cnn_new if cnn_new is not None else cnn_i)

        ys = self.after_norm(ys)
        new_state = EncoderStreamState(
            att_k=jnp.stack(new_ks),
            att_v=jnp.stack(new_vs),
            cnn=jnp.stack(new_cnns),
            offset=state.offset + chunk,
        )
        return ys, new_state
