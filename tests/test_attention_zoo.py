"""Attention/embedding zoo: GQA/MQA head-repeat, RoPE, Shaw relative
embedding (wenet attention.py:217-243, 523-596, 599-686; embedding.py:201-259).

Gates: each family is selectable from EncoderConfig, trains (finite loss +
nonzero grads), and — because all three are translation-consistent — passes
the same chunk≡full streaming equivalence as the rel-pos default.
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
CHUNK = 4
LEFT = 2


def cfg_for(attention_type, n_kv_head=0, pos_enc="rel_pos"):
    return ModelConfig(
        vocab_size=VOCAB,
        blank_id=BLANK,
        encoder=EncoderConfig(
            output_size=32,
            attention_heads=4,
            linear_units=64,
            num_blocks=2,
            cnn_module_kernel=7,
            dropout_rate=0.0,
            positional_dropout_rate=0.0,
            causal=True,
            use_dynamic_chunk=True,
            static_chunk_size=CHUNK,
            attention_type=attention_type,
            n_kv_head=n_kv_head,
            pos_enc_layer_type=pos_enc,
        ),
        predictor=PredictorConfig(embed_size=16, hidden_size=16, output_size=32),
    )


def init_model(cfg, t=131, b=2):
    model = Transducer(cfg)
    feats = np.zeros((b, t, 80), np.float32)
    params = model.init(
        jax.random.PRNGKey(0), feats, np.full((b,), t, np.int32),
        np.zeros((b, 5), np.int32), np.full((b,), 5, np.int32),
    )
    return model, params


CASES = [
    ("rope", 0, "no_pos"),
    ("rope", 2, "no_pos"),  # rope + GQA
    ("shaw_rel_pos", 0, "no_pos"),
    ("mha", 1, "abs_pos"),  # MQA
    ("mha", 2, "abs_pos"),  # GQA
]


@pytest.mark.parametrize("att,nkv,pos", CASES)
def test_trains_and_streams(att, nkv, pos):
    cfg = cfg_for(att, nkv, pos)
    model, params = init_model(cfg)
    b, t = 2, 131
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((b, t, 80)).astype(np.float32)
    feat_lens = np.full((b,), t, np.int32)
    texts = np.ones((b, 5), np.int32) * 7
    text_lens = np.full((b,), 5, np.int32)

    def loss_fn(p):
        out = model.apply(p, feats, feat_lens, texts, text_lens)
        return out["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    )
    assert gnorm > 0

    # chunk streaming == full-context chunk-masked forward
    full, full_lens = model.apply(
        params, feats, feat_lens,
        decoding_chunk_size=CHUNK, num_decoding_left_chunks=LEFT,
        method="encode",
    )
    n = num_chunks(t, CHUNK, 4, 6)
    ys, _ = chunk_stream_encode(model, params, jnp.asarray(feats), CHUNK, LEFT, n)
    usable = min(int(full_lens[0]), n * CHUNK)
    np.testing.assert_allclose(
        np.asarray(ys[:, :usable]), np.asarray(full[:, :usable]),
        rtol=3e-4, atol=3e-4,
    )


def test_gqa_param_shapes():
    cfg = cfg_for("mha", n_kv_head=1, pos_enc="abs_pos")
    model, params = init_model(cfg)
    att0 = params["params"]["encoder"]["block0"]["self_attn"]
    assert att0["linear_q"]["kernel"].shape == (32, 32)
    assert att0["linear_k"]["kernel"].shape == (32, 8)  # 1 kv head x dk 8
    assert att0["linear_v"]["kernel"].shape == (32, 8)


def test_gqa_stream_state_uses_kv_heads():
    cfg = cfg_for("mha", n_kv_head=2, pos_enc="abs_pos")
    model, params = init_model(cfg)
    state = model.apply(params, 3, CHUNK, LEFT, method="init_encoder_state")
    assert state.att_k.shape == (2, 3, CHUNK * LEFT, 2, 8)  # hkv=2


def test_shaw_table_shape():
    cfg = cfg_for("shaw_rel_pos", pos_enc="no_pos")
    model, params = init_model(cfg)
    att0 = params["params"]["encoder"]["block0"]["self_attn"]
    assert att0["rel_k_embed"].shape == (64 + 8 + 1, 8)


@pytest.mark.parametrize("pos", ["abs_pos_whisper", "abs_pos_learnable"])
def test_abs_pe_variants_train_and_stream(pos):
    """Whisper-style and learnable absolute PE (embedding.py:150-175):
    trainable and chunk==full under streaming."""
    cfg = cfg_for("mha", 0, pos)
    model, params = init_model(cfg)
    b, t = 2, 131
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((b, t, 80)).astype(np.float32)
    feat_lens = np.full((b,), t, np.int32)
    texts = np.ones((b, 5), np.int32) * 7
    text_lens = np.full((b,), 5, np.int32)

    if pos == "abs_pos_learnable":
        assert "learned_pe" in params["params"]["encoder"]

    def loss_fn(p):
        return model.apply(p, feats, feat_lens, texts, text_lens)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))

    full, full_lens = model.apply(
        params, feats, feat_lens,
        decoding_chunk_size=CHUNK, num_decoding_left_chunks=LEFT,
        method="encode",
    )
    n = num_chunks(t, CHUNK, 4, 6)
    ys, _ = chunk_stream_encode(model, params, jnp.asarray(feats), CHUNK, LEFT, n)
    usable = min(int(full_lens[0]), n * CHUNK)
    np.testing.assert_allclose(
        np.asarray(ys[:, :usable]), np.asarray(full[:, :usable]),
        rtol=3e-4, atol=3e-4,
    )
