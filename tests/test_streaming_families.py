"""Cached-streaming chunk-vs-full equivalence for the Squeezeformer and
EfficientConformer families (the conformer's gate lives in
test_streaming.py).

Contract (wenet parity): `forward_chunk` with fixed per-rate ring caches must
reproduce the full-context forward evaluated with the equivalent chunk
attention mask — wenet/squeezeformer/encoder.py:266-406 and
wenet/efficient_conformer/encoder.py:300-462 reimplemented with per-rate
static-shape caches instead of repeat_interleave re-expansion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.config import EncoderConfig, ModelConfig, PredictorConfig
from tpuasr.models import Transducer
from tpuasr.streaming import chunk_stream_encode, num_chunks

VOCAB = 20
BLANK = 5


def sq_cfg(chunk=4, reduce_idx=(1,), recover_idx=(3,)):
    return ModelConfig(
        vocab_size=VOCAB,
        blank_id=BLANK,
        encoder=EncoderConfig(
            encoder_type="squeezeformer",
            output_size=32,
            attention_heads=2,
            linear_units=64,
            num_blocks=4,
            cnn_module_kernel=7,
            dropout_rate=0.0,
            positional_dropout_rate=0.0,
            causal=True,
            use_dynamic_chunk=True,
            static_chunk_size=chunk,
            reduce_idx=reduce_idx,
            recover_idx=recover_idx,
            time_reduction_type="stream",
        ),
        predictor=PredictorConfig(embed_size=16, hidden_size=16, output_size=32),
    )


def ec_cfg(chunk=8, group=2, stride_idx=(1,)):
    return ModelConfig(
        vocab_size=VOCAB,
        blank_id=BLANK,
        encoder=EncoderConfig(
            encoder_type="efficient_conformer",
            output_size=32,
            attention_heads=2,
            linear_units=64,
            num_blocks=4,
            cnn_module_kernel=7,
            dropout_rate=0.0,
            positional_dropout_rate=0.0,
            causal=True,
            use_dynamic_chunk=True,
            static_chunk_size=chunk,
            stride_layer_idx=stride_idx,
            group_size=group,
        ),
        predictor=PredictorConfig(embed_size=16, hidden_size=16, output_size=32),
    )


def init_model(cfg, t=131, b=2, seed=0):
    model = Transducer(cfg)
    feats = np.zeros((b, t, 80), np.float32)
    params = model.init(
        jax.random.PRNGKey(seed), feats, np.full((b,), t, np.int32),
        np.zeros((b, 5), np.int32), np.full((b,), 5, np.int32),
    )
    return model, params


def stream_vs_full(model, params, chunk, left, t=131, b=2, out_rate=1, seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((b, t, 80)).astype(np.float32)
    feat_lens = np.full((b,), t, np.int32)
    full, _ = model.apply(
        params, feats, feat_lens,
        decoding_chunk_size=chunk, num_decoding_left_chunks=left,
        method="encode",
    )
    n = num_chunks(t, chunk, 4, 6)
    ys, state = chunk_stream_encode(model, params, jnp.asarray(feats), chunk, left, n)
    usable = min(n * chunk // out_rate, full.shape[1])
    np.testing.assert_allclose(
        np.asarray(ys[:, :usable]), np.asarray(full[:, :usable]),
        rtol=3e-4, atol=3e-4,
    )
    return state


class TestSqueezeformerStreaming:
    def test_chunk_equals_full(self):
        model, params = init_model(sq_cfg())
        state = stream_vs_full(model, params, chunk=4, left=2)
        assert int(state.offset) > 0

    def test_chunk_equals_full_no_reduce(self):
        """Degenerate config without the U-Net reduce/recover pair."""
        model, params = init_model(sq_cfg(reduce_idx=(), recover_idx=()))
        stream_vs_full(model, params, chunk=4, left=2)

    def test_state_shapes_per_rate(self):
        model, params = init_model(sq_cfg())
        state = model.apply(params, 3, 4, 2, method="init_encoder_state")
        # layers 0 and 3 at full rate (A=8), layers 1-2 reduced (A=4)
        assert state.att[0][0].shape == (3, 8, 2, 16)
        assert state.att[1][0].shape == (3, 4, 2, 16)
        assert state.att[2][0].shape == (3, 4, 2, 16)
        assert state.att[3][0].shape == (3, 8, 2, 16)
        assert state.cnn[0].shape == (3, 6, 32)

    def test_wide_left_context(self):
        # t=131 -> 32 encoder frames = 8 full chunks (a partial final chunk
        # zero-pads the window; valid frames in it see in-chunk lookahead
        # garbage — see chunk_windows docstring / wenet encoder.py:455-460)
        model, params = init_model(sq_cfg())
        stream_vs_full(model, params, chunk=4, left=6, t=131, b=1)


class TestEfficientConformerStreaming:
    def test_chunk_equals_full(self):
        model, params = init_model(ec_cfg())
        state = stream_vs_full(model, params, chunk=8, left=2, out_rate=2)
        assert int(state.offset) > 0

    def test_chunk_equals_full_group3(self):
        """wenet's default group_size=3 needs chunk % (stride*group) == 0."""
        model, params = init_model(ec_cfg(chunk=12, group=3))
        # t=147 -> 36 encoder frames = 3 full chunks of 12 (no partial tail)
        stream_vs_full(model, params, chunk=12, left=1, out_rate=2, t=147)

    def test_state_shapes_per_rate(self):
        model, params = init_model(ec_cfg())
        state = model.apply(params, 3, 8, 2, method="init_encoder_state")
        # layers 0-1 at full rate (A=16); layers 2-3 post-stride (A=8)
        assert state.att[0][0].shape == (3, 16, 2, 16)
        assert state.att[1][0].shape == (3, 16, 2, 16)
        assert state.att[2][0].shape == (3, 8, 2, 16)
        assert state.att[3][0].shape == (3, 8, 2, 16)

    def test_misaligned_chunk_rejected(self):
        model, params = init_model(ec_cfg())
        with pytest.raises(AssertionError):
            model.apply(params, 1, 6, 2, method="init_encoder_state")


def test_streaming_decode_squeezeformer():
    """End-to-end: batched streaming greedy decode runs on the cached path."""
    from tpuasr.decode.rnnt_streaming import streaming_greedy_decode

    model, params = init_model(sq_cfg())
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((2, 131, 80)).astype(np.float32)
    hyps, hyp_lens, _ = streaming_greedy_decode(
        model, params, jnp.asarray(feats), np.array([131, 131], np.int32),
        chunk_size=4, num_left_chunks=2, blank_id=BLANK,
    )
    assert hyps.shape[0] == 2


def test_streaming_decode_efficient_conformer():
    """Decode gate handles the stride-compressed output rate (chunk of 8
    subsampled frames emits 4 output frames)."""
    from tpuasr.decode.rnnt_streaming import streaming_greedy_decode

    model, params = init_model(ec_cfg())
    rng = np.random.default_rng(4)
    feats = rng.standard_normal((2, 131, 80)).astype(np.float32)
    hyps, hyp_lens, state = streaming_greedy_decode(
        model, params, jnp.asarray(feats), np.array([131, 131], np.int32),
        chunk_size=8, num_left_chunks=2, blank_id=BLANK,
    )
    assert hyps.shape[0] == 2
    assert int(state.enc.offset) == 32  # 4 chunks x 8 pre-stride frames
