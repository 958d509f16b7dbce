"""Unbounded streams: positional-encoding windows past max_len rebase onto
the table top instead of clamping (VERDICT r2 weak #4 / next #5).

The reference hard-asserts at max_len (wenet/transformer/embedding.py:80-118,
5000 encoder frames ~= 3.5 min at the 48 kHz protocol); the pre-round-3 clamp
silently collapsed every past-cap key PE onto one row. With the rebase, the
relative geometry inside each chunk step's attention window (chunk + KV
cache) stays exact for arbitrarily long streams.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.config import EncoderConfig, ModelConfig, PredictorConfig
from tpuasr.models import Transducer
from tpuasr.nn.embedding import PositionalEncodingTable

CHUNK = 4
LEFT = 2


def test_position_encoding_rebases_past_cap():
    tab = PositionalEncodingTable(16, max_len=32)
    # inside the table: plain absolute window
    w = tab.position_encoding(jnp.asarray(4), 8)
    np.testing.assert_allclose(np.asarray(w[0]), tab.table[4:12], rtol=1e-6)
    # far past the cap: window = top `size` rows, NOT `size` copies of the
    # last row — relative geometry inside the window preserved
    w = tab.position_encoding(jnp.asarray(1000), 8)
    np.testing.assert_allclose(np.asarray(w[0]), tab.table[24:32], rtol=1e-6)
    # straddling the cap: rebased so the window *ends* at the top
    w = tab.position_encoding(jnp.asarray(28), 8)
    np.testing.assert_allclose(np.asarray(w[0]), tab.table[24:32], rtol=1e-6)
    # per-batch offsets rebase row-wise
    w = tab.position_encoding(jnp.asarray([0, 1000]), 8)
    np.testing.assert_allclose(np.asarray(w[0]), tab.table[0:8], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w[1]), tab.table[24:32], rtol=1e-6)
    # python-int offsets past the cap take the same rebased path (the
    # reference would assert here)
    w = tab.position_encoding(1000, 8)
    np.testing.assert_allclose(np.asarray(w[0]), tab.table[24:32], rtol=1e-6)


def test_stream_past_max_len_stable():
    """Stream 3x max_len encoder frames through the cached chunked encoder:
    outputs stay finite, and once past the cap the chunk step becomes
    translation-invariant (same content + same cache => same output) —
    the steady-state property a clamped PE breaks in spirit and a growing
    absolute PE breaks in memory."""
    cfg = ModelConfig(
        vocab_size=20, blank_id=5,
        encoder=EncoderConfig(
            output_size=32, attention_heads=2, linear_units=64, num_blocks=2,
            cnn_module_kernel=7, dropout_rate=0.0, positional_dropout_rate=0.0,
            causal=True, use_dynamic_chunk=True, static_chunk_size=CHUNK,
            max_len=64,
        ),
        predictor=PredictorConfig(embed_size=16, hidden_size=16, output_size=32),
    )
    model = Transducer(cfg)
    feats0 = np.zeros((1, 131, 80), np.float32)
    params = model.init(
        jax.random.PRNGKey(0), feats0, np.array([131], np.int32),
        np.zeros((1, 5), np.int32), np.array([5], np.int32),
    )

    rng = np.random.default_rng(0)
    window = rng.standard_normal((1, (CHUNK - 1) * 4 + 7, 80)).astype(np.float32)

    state = model.apply(params, 1, CHUNK, LEFT, method="init_encoder_state")
    step = jax.jit(
        lambda w, s: model.apply(params, w, s, method="encode_chunk")
    )
    outs = []
    n_steps = 3 * 64 // CHUNK  # 192 encoder frames = 3x max_len
    for i in range(n_steps):
        y, state = step(jnp.asarray(window), state)
        outs.append(np.asarray(y))
    ys = np.concatenate(outs, axis=1)
    assert np.isfinite(ys).all()
    # steady state: identical content into a saturated cache + saturated PE
    # window => identical chunk outputs (true once offset+window > max_len
    # and the repeated input has filled the whole cache)
    np.testing.assert_allclose(outs[-1], outs[-2], rtol=1e-5, atol=1e-6)
    # ... and the output is not the degenerate constant a collapsed PE
    # would tend toward: frames within one chunk still differ
    last = outs[-1][0]
    assert np.abs(last[0] - last[-1]).max() > 1e-4
