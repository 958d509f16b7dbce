"""End-to-end: overfit a tiny streaming transducer on a synthetic corpus and
verify the whole pipeline — device-side fbank, hybrid loss training, offline
CTC/RNN-T decode, streaming decode, CER evaluation, RTF harness."""

import jax
import numpy as np
import pytest

from tpuasr.config import Config, EncoderConfig, FeatureConfig, ModelConfig, PredictorConfig, StreamingConfig
from tpuasr.data.pipeline import BatchSpec, device_view, make_batch
from tpuasr.data.synthetic import synth_corpus
from tpuasr.eval import evaluate_offline, evaluate_streaming, measure_rtf
from tpuasr.models import Transducer
from tpuasr.text import Tokenizer
from tpuasr.train import TrainState, make_optimizer, make_train_step

VOCAB = 40
BLANK = 5


@pytest.fixture(scope="module")
def trained():
    cfg = Config()
    cfg.feature = FeatureConfig(sample_rate=16000, use_pallas=False)
    cfg.model = ModelConfig(
        vocab_size=VOCAB,
        blank_id=BLANK,
        encoder=EncoderConfig(
            output_size=48, attention_heads=2, linear_units=96, num_blocks=2,
            cnn_module_kernel=7, dropout_rate=0.0, positional_dropout_rate=0.0,
            attention_dropout_rate=0.0, causal=True, use_dynamic_chunk=False,
            static_chunk_size=4, max_chunk_size=8,
        ),
        predictor=PredictorConfig(embed_size=32, hidden_size=32, output_size=48),
    )
    cfg.streaming = StreamingConfig(chunk_size=4, num_left_chunks=3, n_steps=3)
    cfg.optim.warmup_steps = 20
    cfg.optim.lr = 3e-3

    # 8 utterances, ~2 s each (tokens mapped to distinct pure tones)
    utts = synth_corpus(8, VOCAB, seed=3, min_tokens=3, max_tokens=5,
                        samples_per_token=4096, add_sos_eos=False)
    batch = make_batch(utts, BatchSpec(8, 40 * 512, 8))

    model = Transducer(cfg.model)
    db = device_view(batch)
    feats_t = 1 + db["waves"].shape[1] // 512
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((8, feats_t, 80), np.float32),
        np.full((8,), feats_t, np.int32),
        db["texts"], db["text_lens"],
    )
    tx = make_optimizer(cfg.optim)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, cfg, donate=False)
    rng = jax.random.PRNGKey(1)
    first = last = None
    for i in range(150):
        state, metrics = step(state, db, rng)
        if first is None:
            first = float(metrics["loss"])
        last = float(metrics["loss"])
    assert last < first * 0.5, (first, last)
    return cfg, model, state.params, batch


def test_offline_ctc_cer_low(trained):
    cfg, model, params, batch = trained
    tok = Tokenizer(tokens=[f"syl{i}" for i in range(VOCAB - 6)])
    res = evaluate_offline(model, params, [batch], cfg, tok, mode="ctc_greedy")
    assert res.counts.ref_len > 0
    assert res.cer < 0.3, res.cer


def test_offline_rnnt_greedy_cer_low(trained):
    cfg, model, params, batch = trained
    tok = Tokenizer(tokens=[f"syl{i}" for i in range(VOCAB - 6)])
    res = evaluate_offline(model, params, [batch], cfg, tok, mode="rnnt_greedy",
                           n_steps=3, max_tokens=20)
    assert res.cer < 0.3, res.cer


def test_offline_rnnt_beam_cer_not_worse_much(trained):
    cfg, model, params, batch = trained
    tok = Tokenizer(tokens=[f"syl{i}" for i in range(VOCAB - 6)])
    greedy = evaluate_offline(model, params, [batch], cfg, tok, mode="rnnt_greedy",
                              n_steps=1, max_tokens=20)
    beam = evaluate_offline(model, params, [batch], cfg, tok, mode="rnnt_beam",
                            beam_size=4, max_tokens=20)
    assert beam.cer <= greedy.cer + 0.05, (beam.cer, greedy.cer)


def test_streaming_eval_and_rtf(trained):
    cfg, model, params, batch = trained
    tok = Tokenizer(tokens=[f"syl{i}" for i in range(VOCAB - 6)])
    res = evaluate_streaming(model, params, [batch], cfg, tok, beam_size=2,
                             n_steps=3, max_tokens=20)
    # streaming greedy should roughly match offline chunked decode quality
    assert res.greedy.cer < 0.5, res.greedy.cer
    assert res.beam.ref_len == res.greedy.ref_len

    from tpuasr.audio import fbank_batch

    db = device_view(batch)
    feats, feat_lens = fbank_batch(db["waves"][:1], db["wave_lens"][:1], cfg.feature)
    stats = measure_rtf(model, params, feats, cfg, mode="greedy", n_steps=3)
    assert stats.n_chunks >= 3
    assert stats.rtf_mean > 0
    assert stats.rtf_p95 >= stats.rtf_p50


def test_transducer_rescoring(trained, rng):
    from tpuasr.decode.ctc_prefix_beam import ctc_prefix_beam_search
    from tpuasr.decode.rnnt_rescoring import transducer_rescoring
    from tpuasr.audio import fbank_batch
    from tpuasr.data.pipeline import device_view

    cfg, model, params, batch = trained
    db = device_view(batch)
    feats, feat_lens = fbank_batch(db["waves"], db["wave_lens"], cfg.feature)
    enc, enc_lens = model.apply(params, feats, feat_lens, method="encode")
    import jax.numpy as jnp
    import jax as _jax

    ctc_logits = model.apply(params, enc, method="ctc_logits")
    lp = _jax.nn.log_softmax(ctc_logits.astype(jnp.float32), -1)
    _, _, (nb_tok, nb_len, nb_score) = ctc_prefix_beam_search(
        lp, enc_lens, BLANK, beam_size=4, max_tokens=12
    )
    tok, lens, total = transducer_rescoring(
        model, params, enc, enc_lens, nb_tok, nb_len, nb_score, BLANK
    )
    assert tok.shape[0] == 8
    best = np.argmax(np.asarray(total), axis=1)
    for b in range(8):
        np.testing.assert_array_equal(np.asarray(tok[b]), np.asarray(nb_tok[b, best[b]]))


def test_first_token_delay(trained):
    from tpuasr.audio import fbank_batch
    from tpuasr.data.pipeline import device_view
    from tpuasr.eval.rtf import measure_first_token_delay

    cfg, model, params, batch = trained
    db = device_view(batch)
    feats, feat_lens = fbank_batch(db["waves"][:2], db["wave_lens"][:2], cfg.feature)
    stats = measure_first_token_delay(model, params, feats, feat_lens, cfg, n_steps=3)
    assert 0.0 <= stats["emitted_fraction"] <= 1.0
    if stats["emitted_fraction"] > 0:
        assert stats["p50_first_token_delay_s"] > 0


def test_beam_ctc_shallow_fusion(trained):
    """Per-frame CTC shallow fusion (prefix_beam_search.py:99-101 parity):
    the fusion flag works end-to-end and does not hurt accuracy on the
    overfit corpus; zero ctc weight reproduces the pure beam exactly."""
    from tpuasr.audio import fbank_batch
    from tpuasr.decode.rnnt_beam import rnnt_beam_decode
    from tpuasr.text.cer import corpus_cer

    cfg, model, params, batch = trained
    db = device_view(batch)
    feats, feat_lens = fbank_batch(db["waves"], db["wave_lens"], cfg.feature)
    enc, enc_lens = model.apply(params, feats, feat_lens, method="encode")

    pure_tok, pure_len, *_ = rnnt_beam_decode(
        model, params, enc, enc_lens, BLANK, beam_size=4, max_tokens=20)
    fused_tok, fused_len, *_ = rnnt_beam_decode(
        model, params, enc, enc_lens, BLANK, beam_size=4, max_tokens=20,
        ctc_weight=0.3, transducer_weight=0.7)

    def cer_of(toks, lens):
        pairs = []
        for b in range(toks.shape[0]):
            hyp = [int(x) for x in np.asarray(toks[b][: int(lens[b])])]
            ref = [int(x) for x in np.asarray(db["texts"][b][: int(db["text_lens"][b])])]
            pairs.append((ref, hyp))
        counts = corpus_cer(pairs)
        return counts.errors / counts.ref_len

    fused_cer, pure_cer = cer_of(fused_tok, fused_len), cer_of(pure_tok, pure_len)
    assert fused_cer <= pure_cer + 0.05, (fused_cer, pure_cer)

    # ctc_weight=0 keeps the pure-beam path bit-identical
    zero_tok, zero_len, *_ = rnnt_beam_decode(
        model, params, enc, enc_lens, BLANK, beam_size=4, max_tokens=20,
        ctc_weight=0.0)
    np.testing.assert_array_equal(np.asarray(zero_tok), np.asarray(pure_tok))
