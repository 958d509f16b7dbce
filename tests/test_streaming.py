"""Chunk-vs-full-context equivalence — the #1 correctness trap (SURVEY §4.5).

The streaming `forward_chunk` path (fixed ring caches, offset positions,
overlap subsampling windows) must produce exactly the same encoder output as
the full-context forward evaluated with the equivalent chunk attention mask
(wenet's de-facto `forward_chunk_by_chunk ≡ forward(decoding_chunk_size=k)`
invariant, encoder.py:301-361)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.config import EncoderConfig, ModelConfig, PredictorConfig
from tpuasr.models import Transducer
from tpuasr.streaming import chunk_stream_encode, num_chunks

VOCAB = 20
BLANK = 5
CHUNK = 4
LEFT = 2


def causal_cfg(num_blocks=2, left=LEFT):
    return ModelConfig(
        vocab_size=VOCAB,
        blank_id=BLANK,
        encoder=EncoderConfig(
            output_size=32,
            attention_heads=2,
            linear_units=64,
            num_blocks=num_blocks,
            cnn_module_kernel=7,
            dropout_rate=0.0,
            positional_dropout_rate=0.0,
            causal=True,
            use_dynamic_chunk=True,
            static_chunk_size=CHUNK,
        ),
        predictor=PredictorConfig(embed_size=16, hidden_size=16, output_size=32),
    )


@pytest.fixture(scope="module")
def causal_model():
    cfg = causal_cfg()
    model = Transducer(cfg)
    feats = np.zeros((2, 131, 80), np.float32)
    params = model.init(
        jax.random.PRNGKey(0), feats, np.array([131, 131], np.int32),
        np.zeros((2, 5), np.int32), np.array([5, 5], np.int32),
    )
    return model, params


def test_chunk_equals_full_context(causal_model, rng):
    model, params = causal_model
    b, t = 2, 131
    feats = rng.standard_normal((b, t, 80)).astype(np.float32)
    feat_lens = np.full((b,), t, np.int32)

    # full-context forward with the fixed-chunk attention mask
    full, full_lens = model.apply(
        params, feats, feat_lens,
        decoding_chunk_size=CHUNK, num_decoding_left_chunks=LEFT,
        method="encode",
    )
    t_out = int(full_lens[0])

    n = num_chunks(t, CHUNK, 4, 6)
    ys, state = chunk_stream_encode(model, params, jnp.asarray(feats), CHUNK, LEFT, n)

    usable = min(t_out, n * CHUNK)
    np.testing.assert_allclose(
        np.asarray(ys[:, :usable]), np.asarray(full[:, :usable]), rtol=2e-4, atol=2e-4
    )
    assert int(state.offset) == n * CHUNK


def test_chunk_equals_full_context_unlimited_left(rng):
    """num_left_chunks large enough to cover the whole stream ≡ full causal
    attention at chunk granularity."""
    cfg = causal_cfg(left=100)
    model = Transducer(cfg)
    b, t = 1, 67
    feats = rng.standard_normal((b, t, 80)).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(1), feats, np.array([t], np.int32),
        np.zeros((b, 5), np.int32), np.array([5], np.int32),
    )
    full, full_lens = model.apply(
        params, feats, np.array([t], np.int32),
        decoding_chunk_size=CHUNK, num_decoding_left_chunks=100,
        method="encode",
    )
    n = num_chunks(t, CHUNK, 4, 6)
    ys, _ = chunk_stream_encode(model, params, jnp.asarray(feats), CHUNK, 100, n)
    usable = min(int(full_lens[0]), n * CHUNK)
    np.testing.assert_allclose(
        np.asarray(ys[:, :usable]), np.asarray(full[:, :usable]), rtol=2e-4, atol=2e-4
    )


def test_streaming_state_shapes(causal_model):
    model, params = causal_model
    state = model.apply(params, 3, CHUNK, LEFT, method="init_encoder_state")
    l, b, a, h, dk = state.att_k.shape
    assert (l, b, a, h, dk) == (2, 3, CHUNK * LEFT, 2, 16)
    assert state.cnn.shape == (2, 3, 6, 32)  # kernel 7 -> lorder 6
    assert int(state.offset) == 0


def test_incremental_chunks_match_batch_scan(causal_model, rng):
    """Feeding chunks one-by-one (incremental API) == scanning them."""
    model, params = causal_model
    t = 67
    feats = rng.standard_normal((1, t, 80)).astype(np.float32)
    n = num_chunks(t, CHUNK, 4, 6)
    ys_scan, _ = chunk_stream_encode(model, params, jnp.asarray(feats), CHUNK, LEFT, n)

    from tpuasr.streaming.chunkwise import chunk_windows

    windows = chunk_windows(jnp.asarray(feats), CHUNK, 4, 6, n)
    state = model.apply(params, 1, CHUNK, LEFT, method="init_encoder_state")
    outs = []
    for i in range(n):
        y, state = model.apply(params, windows[i], state, method="encode_chunk")
        outs.append(np.asarray(y))
    ys_inc = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(ys_inc, np.asarray(ys_scan), rtol=1e-5, atol=1e-5)


def test_streaming_greedy_equals_offline_greedy_on_chunked_encoder(causal_model, rng):
    """Streaming decode (chunked encoder + carried decoder state) must equal
    offline greedy run over the chunk-masked full-context encoder output."""
    from tpuasr.decode.rnnt_greedy import rnnt_greedy_decode
    from tpuasr.decode.rnnt_streaming import streaming_greedy_decode

    model, params = causal_model
    b, t = 2, 131
    feats = rng.standard_normal((b, t, 80)).astype(np.float32) * 0.5
    feat_lens = np.array([131, 99], np.int32)

    full, full_lens = model.apply(
        params, feats, feat_lens,
        decoding_chunk_size=CHUNK, num_decoding_left_chunks=LEFT,
        method="encode",
    )
    n = num_chunks(t, CHUNK, 4, 6)
    # streaming only sees complete chunks; cap offline lens the same way
    capped = np.minimum(np.asarray(full_lens), n * CHUNK).astype(np.int32)
    toks_off, lens_off = rnnt_greedy_decode(
        model, params, full, capped, BLANK, n_steps=4, max_tokens=50
    )
    toks_str, lens_str, _ = streaming_greedy_decode(
        model, params, jnp.asarray(feats), jnp.asarray(capped * 4 + 3), CHUNK, LEFT,
        BLANK, n_steps=4, max_tokens=50,
    )
    assert list(np.asarray(lens_off)) == list(np.asarray(lens_str))
    np.testing.assert_array_equal(np.asarray(toks_off), np.asarray(toks_str))
