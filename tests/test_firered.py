"""FireRed encoder variant (wenet/firered/): Transformer-XL rel_shift
attention over a bidirectional PE window, q/k/v pre-norms, odd padded
conv2d4 subsampling; full-context only."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.config import EncoderConfig, ModelConfig, PredictorConfig
from tpuasr.models import Transducer
from tpuasr.nn.attention import rel_shift_bidirectional
from tpuasr.nn.subsampling import FireRedConv2dSubsampling4, subsampled_mask


def test_rel_shift_selects_relative_positions():
    """out[..., i, j] must equal in[..., i, (T-1) - i + j] — i.e. the entry
    for relative position i - j in a window ordered T-1 .. -(T-1)."""
    b, h, t = 1, 1, 5
    p = 2 * t - 1
    x = np.arange(b * h * t * p, dtype=np.float32).reshape(b, h, t, p)
    out = np.asarray(rel_shift_bidirectional(jnp.asarray(x)))
    assert out.shape == (b, h, t, t)
    for i in range(t):
        for j in range(t):
            np.testing.assert_allclose(out[0, 0, i, j], x[0, 0, i, t - 1 - i + j])


def test_firered_subsampling_lengths():
    sub = FireRedConv2dSubsampling4(16)
    for t in (37, 64, 101):
        x = np.zeros((2, t, 80), np.float32)
        params = sub.init(jax.random.PRNGKey(0), x)
        y = sub.apply(params, x)
        assert y.shape[1] == FireRedConv2dSubsampling4.output_len(t), (t, y.shape)
        mask = jnp.ones((2, 1, t), bool)
        m = subsampled_mask(mask, "conv2d_firered")
        assert m.shape[-1] == y.shape[1], (t, m.shape, y.shape)


def test_firered_transducer_trains_and_decodes():
    cfg = ModelConfig(
        vocab_size=20,
        blank_id=5,
        encoder=EncoderConfig(
            encoder_type="firered",
            output_size=32, attention_heads=2, linear_units=64, num_blocks=2,
            cnn_module_kernel=7, dropout_rate=0.0, positional_dropout_rate=0.0,
        ),
        predictor=PredictorConfig(embed_size=16, hidden_size=16, output_size=32),
    )
    model = Transducer(cfg)
    b, t, u = 2, 67, 5
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((b, t, 80)).astype(np.float32)
    feat_lens = np.array([67, 50], np.int32)
    texts = rng.integers(6, 19, (b, u)).astype(np.int32)
    text_lens = np.full((b,), u, np.int32)
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens, texts, text_lens)

    def loss_fn(p):
        return model.apply(p, feats, feat_lens, texts, text_lens)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = float(jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads))))
    assert gnorm > 0

    # q/k/v pre-norm params exist (the firered attention signature)
    att0 = params["params"]["encoder"]["block0"]["self_attn"]
    assert "layer_norm_q" in att0 and "layer_norm_k" in att0

    from tpuasr.decode.rnnt_greedy import rnnt_greedy_decode

    enc, enc_lens = model.apply(params, feats, feat_lens, method="encode")
    assert enc.shape[1] == int(enc_lens[0])
    toks, lens = rnnt_greedy_decode(model, params, enc, enc_lens, 5, 3, 10)
    assert toks.shape[0] == b

    # streaming is rejected, like the reference
    with pytest.raises(AssertionError):
        state = model.apply(params, 1, 4, 2, method="init_encoder_state")
        model.apply(params, np.zeros((1, 19, 80), np.float32), state,
                    method="encode_chunk")
