"""Predictor zoo + HAT joint tests: forward/step consistency per predictor
type, normalized HAT output, decoders work with every predictor family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.config import JointConfig, ModelConfig, PredictorConfig
from tpuasr.decode import rnnt_greedy_decode
from tpuasr.decode.rnnt_beam import rnnt_beam_decode
from tpuasr.models import Transducer
from tpuasr.nn.predictor import ConvPredictor, EmbeddingPredictor, RNNPredictor

from tests.test_models import small_model_cfg, VOCAB, BLANK


@pytest.mark.parametrize("ptype", ["rnn", "embedding", "conv"])
def test_forward_equals_steps(ptype, rng):
    """Running U steps through forward_step must equal the batched forward."""
    cfg = PredictorConfig(
        predictor_type=ptype, embed_size=16, hidden_size=16, output_size=16,
        history_size=2, n_head=2,
    )
    cls = {"rnn": RNNPredictor, "embedding": EmbeddingPredictor, "conv": ConvPredictor}[ptype]
    model = cls(cfg, VOCAB)
    tokens = rng.integers(0, VOCAB, (2, 5)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)
    full = np.asarray(model.apply(params, tokens))

    state = model.apply(params, 2, method="init_state")
    outs = []
    for u in range(5):
        out, state = model.apply(params, tokens[:, u], state, method="forward_step")
        outs.append(np.asarray(out))
    stepped = np.stack(outs, axis=1)
    np.testing.assert_allclose(stepped, full, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("ptype", ["embedding", "conv"])
def test_decoders_with_alt_predictors(ptype, rng):
    cfg = small_model_cfg()
    cfg.predictor = PredictorConfig(
        predictor_type=ptype, embed_size=32, hidden_size=32, output_size=32,
        history_size=2, n_head=2,
    )
    model = Transducer(cfg)
    feats = np.zeros((2, 67, 80), np.float32)
    params = model.init(
        jax.random.PRNGKey(0), feats, np.array([67, 67], np.int32),
        np.full((2, 5), 7, np.int32), np.array([5, 5], np.int32),
    )
    enc = rng.standard_normal((2, 9, 32)).astype(np.float32)
    enc_lens = np.array([9, 6], np.int32)
    toks, lens = rnnt_greedy_decode(model, params, jnp.asarray(enc), enc_lens,
                                    BLANK, n_steps=3, max_tokens=20)
    assert toks.shape == (2, 20)
    b_tok, b_len, *_ = rnnt_beam_decode(model, params, jnp.asarray(enc), enc_lens,
                                        BLANK, beam_size=3, max_tokens=20)
    assert b_tok.shape == (2, 20)


def test_hat_joint_normalized(rng):
    cfg = small_model_cfg()
    cfg.joint = JointConfig(join_dim=32, hat_joint=True)
    model = Transducer(cfg)
    feats = np.zeros((1, 67, 80), np.float32)
    params = model.init(
        jax.random.PRNGKey(0), feats, np.array([67], np.int32),
        np.full((1, 4), 7, np.int32), np.array([4], np.int32),
    )
    enc = jnp.asarray(rng.standard_normal((1, 3, 32)).astype(np.float32))
    pred = jnp.asarray(rng.standard_normal((1, 2, 32)).astype(np.float32))
    out = model.apply(params, enc, pred, method="joint_full")  # [1,3,2,V]
    probs = np.exp(np.asarray(out, np.float64))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-3)
    # training forward with HAT joint also works
    res = model.apply(params, feats + 0.1, np.array([67], np.int32),
                      np.full((1, 4), 7, np.int32), np.array([4], np.int32))
    assert np.isfinite(float(res["loss"]))
