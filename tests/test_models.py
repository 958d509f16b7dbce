"""Model-level tests: encoder/predictor/joint shapes, hybrid loss forward,
and batched decoders (the example1/example2 fixture role from the reference
notebooks, SURVEY §4, re-expressed as randomized shape/semantic tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.config import CTCModelConfig, EncoderConfig, ModelConfig, PredictorConfig
from tpuasr.decode import ctc_greedy_decode, rnnt_greedy_decode
from tpuasr.decode.ctc_greedy import remove_duplicates_and_blank
from tpuasr.models import CTCModel, Transducer, add_blank

VOCAB = 20
BLANK = 5


def small_model_cfg(**enc_over):
    enc = EncoderConfig(
        output_size=32,
        attention_heads=2,
        linear_units=64,
        num_blocks=2,
        cnn_module_kernel=7,
        dropout_rate=0.0,
        positional_dropout_rate=0.0,
        **enc_over,
    )
    return ModelConfig(
        vocab_size=VOCAB,
        blank_id=BLANK,
        encoder=enc,
        predictor=PredictorConfig(embed_size=16, hidden_size=16, output_size=32),
    )


@pytest.fixture(scope="module")
def transducer():
    cfg = small_model_cfg()
    model = Transducer(cfg)
    feats = np.zeros((2, 67, 80), np.float32)
    params = model.init(
        jax.random.PRNGKey(0), feats, np.array([67, 50], np.int32),
        np.zeros((2, 5), np.int32), np.array([5, 3], np.int32),
    )
    return model, params, cfg


def test_transducer_forward_losses(transducer, rng):
    model, params, cfg = transducer
    feats = rng.standard_normal((2, 67, 80)).astype(np.float32)
    feat_lens = np.array([67, 50], np.int32)
    texts = rng.integers(6, VOCAB, size=(2, 5)).astype(np.int32)
    text_lens = np.array([5, 3], np.int32)
    out = model.apply(params, feats, feat_lens, texts, text_lens)
    assert set(out) == {"loss", "loss_rnnt", "loss_ctc"}
    loss = float(out["loss"])
    assert np.isfinite(loss) and loss > 0
    np.testing.assert_allclose(
        loss,
        0.7 * float(out["loss_rnnt"]) + 0.3 * float(out["loss_ctc"]),
        rtol=1e-6,
    )


def test_transducer_grads_finite(transducer, rng):
    model, params, cfg = transducer
    feats = rng.standard_normal((2, 67, 80)).astype(np.float32)
    feat_lens = np.array([67, 50], np.int32)
    texts = rng.integers(6, VOCAB, size=(2, 5)).astype(np.int32)
    text_lens = np.array([5, 3], np.int32)

    def loss_fn(p):
        return model.apply(p, feats, feat_lens, texts, text_lens)["loss"]

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    assert any(np.any(np.asarray(x) != 0) for x in leaves)


def test_encoder_lens(transducer, rng):
    model, params, _ = transducer
    feats = rng.standard_normal((2, 67, 80)).astype(np.float32)
    feat_lens = np.array([67, 50], np.int32)
    enc, enc_lens = model.apply(params, feats, feat_lens, method="encode")
    assert enc.shape == (2, (67 - 1) // 2 // 2 - 0, 32) or enc.shape[1] >= enc_lens.max()
    assert list(np.asarray(enc_lens)) == [((67 - 1) // 2 - 1) // 2, ((50 - 1) // 2 - 1) // 2]


def test_add_blank():
    t = np.array([[7, 8], [9, 0]], np.int32)
    out = np.asarray(add_blank(jnp.asarray(t), BLANK))
    assert out.tolist() == [[BLANK, 7, 8], [BLANK, 9, 0]]


def test_ctc_greedy_decode_collapse():
    # build log_probs forcing sequence [1, 1, blk, 2, 2, blk, 1]
    path = [1, 1, BLANK, 2, 2, BLANK, 1]
    lp = np.full((1, len(path), VOCAB), -10.0, np.float32)
    for t, p in enumerate(path):
        lp[0, t, p] = 0.0
    toks, lens = ctc_greedy_decode(jnp.asarray(lp), np.array([7], np.int32), BLANK)
    assert int(lens[0]) == 3
    assert list(np.asarray(toks[0, :3])) == [1, 2, 1]
    assert remove_duplicates_and_blank(path, BLANK) == [1, 2, 1]


def test_ctc_greedy_decode_respects_lens():
    path = [1, BLANK, 2, 3]
    lp = np.full((1, 4, VOCAB), -10.0, np.float32)
    for t, p in enumerate(path):
        lp[0, t, p] = 0.0
    toks, lens = ctc_greedy_decode(jnp.asarray(lp), np.array([3], np.int32), BLANK)
    assert int(lens[0]) == 2
    assert list(np.asarray(toks[0, :2])) == [1, 2]


def test_rnnt_greedy_decode_runs(transducer, rng):
    model, params, cfg = transducer
    enc = rng.standard_normal((2, 9, 32)).astype(np.float32)
    enc_lens = np.array([9, 5], np.int32)
    toks, lens = rnnt_greedy_decode(model, params, jnp.asarray(enc), enc_lens, BLANK,
                                    n_steps=4, max_tokens=30)
    assert toks.shape == (2, 30)
    assert 0 <= int(lens[0]) <= 30 and 0 <= int(lens[1]) <= 30
    # tokens beyond length are pad (0)
    for b in range(2):
        assert np.all(np.asarray(toks[b, int(lens[b]):]) == 0)
    # no blanks ever emitted
    for b in range(2):
        assert BLANK not in np.asarray(toks[b, : int(lens[b])])


def test_ctc_model_forward(rng):
    cfg = CTCModelConfig(hidden_dim=32, attention_heads=2, num_blocks=2, kernel_size=7)
    model = CTCModel(cfg, VOCAB, BLANK)
    feats = rng.standard_normal((2, 130, 80)).astype(np.float32)
    feat_lens = np.array([130, 100], np.int32)
    texts = rng.integers(6, VOCAB, size=(2, 4)).astype(np.int32)
    text_lens = np.array([4, 2], np.int32)
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens, texts, text_lens)
    lp, out_lens, loss = model.apply(params, feats, feat_lens, texts, text_lens)
    assert lp.shape[0] == 2 and lp.shape[2] == VOCAB
    assert np.isfinite(float(loss))
    # conv2d8: ((T-1)//2 -1)//2 -1)//2
    assert int(out_lens[0]) == ((((130 - 1) // 2) - 1) // 2 - 1) // 2


def test_mlp_variants(rng):
    import jax.numpy as jnp

    from tpuasr.nn.conformer import GatedVariantsMLP, MoEFFNLayer

    x = jnp.asarray(rng.standard_normal((2, 7, 16)).astype(np.float32))
    gated = GatedVariantsMLP(32, 16, 0.0)
    p = gated.init(jax.random.PRNGKey(0), x)
    assert gated.apply(p, x).shape == (2, 7, 16)

    moe = MoEFFNLayer(32, 16, 0.0, n_expert=4, n_expert_activated=2)
    p = moe.init(jax.random.PRNGKey(0), x)
    y = moe.apply(p, x)
    assert y.shape == (2, 7, 16)
    assert np.all(np.isfinite(np.asarray(y)))


def test_moe_encoder_trains(rng):
    cfg = small_model_cfg()
    cfg.encoder.mlp_type = "moe"
    cfg.encoder.n_expert = 4
    model = Transducer(cfg)
    feats = rng.standard_normal((2, 67, 80)).astype(np.float32)
    feat_lens = np.array([67, 50], np.int32)
    texts = rng.integers(6, VOCAB, size=(2, 5)).astype(np.int32)
    text_lens = np.array([5, 3], np.int32)
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens, texts, text_lens)
    out = model.apply(params, feats, feat_lens, texts, text_lens)
    assert np.isfinite(float(out["loss"]))
    g = jax.grad(lambda p: model.apply(p, feats, feat_lens, texts, text_lens)["loss"])(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))


def test_squeezeformer_encoder(rng):
    from tpuasr.nn.squeezeformer import SqueezeformerConfig, SqueezeformerEncoder

    cfg = SqueezeformerConfig(
        encoder_dim=32, output_size=32, attention_heads=2, num_blocks=4,
        reduce_idx=(1,), recover_idx=(3,), feed_forward_expansion_factor=2,
        cnn_module_kernel=7, dropout_rate=0.0,
    )
    model = SqueezeformerEncoder(cfg)
    feats = rng.standard_normal((2, 67, 80)).astype(np.float32)
    feat_lens = np.array([67, 50], np.int32)
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens)
    ys, masks = model.apply(params, feats, feat_lens)
    t_out = (((67 - 1) // 2) - 1) // 2
    assert ys.shape == (2, t_out, 32)
    assert np.all(np.isfinite(np.asarray(ys)))
    # reduced-then-recovered output length matches the subsampled input
    assert masks.shape == (2, 1, t_out)
    # gradient flows through reduction/recovery
    g = jax.grad(lambda p: model.apply(p, feats, feat_lens)[0].sum())(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))


def test_efficient_conformer_encoder(rng):
    from tpuasr.nn.efficient_conformer import (
        EfficientConformerConfig, EfficientConformerEncoder,
    )

    cfg = EfficientConformerConfig(
        output_size=32, attention_heads=2, linear_units=64, num_blocks=4,
        stride_layer_idx=(1,), group_size=2, cnn_module_kernel=7, dropout_rate=0.0,
    )
    model = EfficientConformerEncoder(cfg)
    feats = rng.standard_normal((2, 67, 80)).astype(np.float32)
    feat_lens = np.array([67, 50], np.int32)
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens)
    ys, masks = model.apply(params, feats, feat_lens)
    t_sub = (((67 - 1) // 2) - 1) // 2
    t_out = (t_sub + 1) // 2  # one stride-2 layer
    assert ys.shape == (2, t_out, 32)
    assert masks.shape[-1] == t_out
    assert np.all(np.isfinite(np.asarray(ys)))
    g = jax.grad(lambda p: model.apply(p, feats, feat_lens)[0].sum())(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))


def test_ctc_greedy_details():
    """DecodeResult fields (wenet search.py:30-59): emission times + confidence."""
    path = [BLANK, 1, 1, BLANK, 2, BLANK, 3]
    lp = np.full((1, len(path), VOCAB), -10.0, np.float32)
    for t, p in enumerate(path):
        lp[0, t, p] = 0.0
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(lp), -1))
    toks, lens, times, conf = ctc_greedy_decode(
        jnp.asarray(lp), np.array([7], np.int32), BLANK, with_details=True
    )
    assert list(np.asarray(toks[0, :3])) == [1, 2, 3]
    assert list(np.asarray(times[0, :3])) == [1, 4, 6]
    assert 0.0 < float(conf[0]) <= 1.0


@pytest.mark.parametrize("etype", ["squeezeformer", "efficient_conformer"])
def test_transducer_with_encoder_families(etype, rng):
    """Squeezeformer / EfficientConformer wired through the Transducer:
    loss forward, grads, and offline greedy decode."""
    cfg = small_model_cfg()
    cfg.encoder.encoder_type = etype
    cfg.encoder.reduce_idx = (0,)
    cfg.encoder.recover_idx = (1,)
    cfg.encoder.stride_layer_idx = (0,)
    model = Transducer(cfg)
    feats = rng.standard_normal((2, 131, 80)).astype(np.float32)
    feat_lens = np.array([131, 99], np.int32)
    texts = rng.integers(6, VOCAB, size=(2, 5)).astype(np.int32)
    text_lens = np.array([5, 3], np.int32)
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens, texts, text_lens)
    out = model.apply(params, feats, feat_lens, texts, text_lens)
    assert np.isfinite(float(out["loss"])), etype
    g = jax.grad(lambda p: model.apply(p, feats, feat_lens, texts, text_lens)["loss"])(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))

    enc, enc_lens = model.apply(params, feats, feat_lens, method="encode")
    assert enc.shape[1] >= int(np.max(np.asarray(enc_lens)))
    toks, lens = rnnt_greedy_decode(model, params, enc, enc_lens, BLANK,
                                    n_steps=2, max_tokens=20)
    assert toks.shape == (2, 20)


def test_subsampling_longtail_variants():
    """conv1d2 (Whisper 1D front-end, subsampling.py:116-160) and stack2
    (stack-n-frames, subsampling.py:338-394): shapes, output_len arithmetic,
    and a full encoder forward through each."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuasr.config import EncoderConfig
    from tpuasr.nn.conformer import ConformerEncoder
    from tpuasr.nn.subsampling import SUBSAMPLE_CLASSES

    for name in ("conv1d2", "stack2"):
        cls = SUBSAMPLE_CLASSES[name]
        sub = cls(16)
        x = np.random.default_rng(0).standard_normal((2, 37, 80)).astype(np.float32)
        params = sub.init(jax.random.PRNGKey(0), x)
        y = sub.apply(params, x)
        assert y.shape == (2, cls.output_len(37), 16), (name, y.shape)

        enc_cfg = EncoderConfig(
            output_size=16, attention_heads=2, linear_units=32, num_blocks=1,
            cnn_module_kernel=7, dropout_rate=0.0, positional_dropout_rate=0.0,
            input_layer=name,
        )
        enc = ConformerEncoder(enc_cfg)
        lens = np.array([37, 25], np.int32)
        ep = enc.init(jax.random.PRNGKey(1), x, lens)
        ys, masks = enc.apply(ep, x, lens)
        assert ys.shape[1] == cls.output_len(37)
        assert masks.shape[-1] == ys.shape[1]
        # per-row mask lengths track output_len of each true length
        got = np.asarray(masks[:, 0].sum(-1))
        want = [cls.output_len(37), cls.output_len(25)]
        np.testing.assert_array_equal(got, want)
