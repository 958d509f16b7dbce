"""End-to-end: overfit a tiny streaming transducer on a synthetic corpus and
verify the whole pipeline — device-side fbank, hybrid loss training, offline
CTC/RNN-T decode, streaming decode, CER evaluation, RTF harness."""

import jax
import numpy as np
import pytest

from tpuasr.config import Config, EncoderConfig, FeatureConfig, ModelConfig, PredictorConfig, StreamingConfig
from tpuasr.data.pipeline import device_view
from tpuasr.eval import evaluate_offline, evaluate_streaming, measure_rtf
from tpuasr.models import Transducer
from tpuasr.text import Tokenizer
from tpuasr.train import TrainState, make_optimizer

VOCAB = 40
BLANK = 5


@pytest.fixture(scope="module")
def trained():
    """Train a tiny streaming transducer through the REAL epoch loop
    (`train_loop`: epoch CV, plateau tracker, checkpoint plumbing) on a
    64-utterance chord corpus until it has actually learned — held-in CER
    must hit ~0 and a held-out 16-utterance dev set must decode well — and
    verify the plateau scheduler fires and scales the update when dev loss
    stops improving (reference run.py:29-181 protocol in miniature)."""
    from tpuasr.data.corpus import synthetic_pipeline
    from tpuasr.eval import evaluate_offline
    from tpuasr.train.loop import train_loop

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
    cfg.data.batch_size = 8
    cfg.data.synth_min_tokens = 3
    cfg.data.synth_max_tokens = 5
    cfg.data.synth_frames_per_token = 8
    cfg.train.epochs = 40
    cfg.train.save_dir = ""
    cfg.train.log_dir = ""
    cfg.train.log_every = 1000  # silent
    cfg.train.dtype = "float32"

    train_pipe = synthetic_pipeline(cfg, 64, seed=3)
    dev_pipe = synthetic_pipeline(cfg, 16, seed=11)  # held-out sequences

    model = Transducer(cfg.model)
    first = next(iter(train_pipe.batches(0)))
    feats_t = 1 + first["waves"].shape[1] // cfg.feature.hop_length
    b = first["waves"].shape[0]
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((b, feats_t, 80), np.float32),
        np.full((b,), feats_t, np.int32),
        first["texts"], first["text_lens"],
    )
    tx = make_optimizer(cfg.optim)
    state = TrainState.create(params, tx)
    res = train_loop(cfg, model, state, train_pipe, dev_pipe)
    assert res.train_losses[-1] < res.train_losses[0] * 0.05, (
        res.train_losses[0], res.train_losses[-1])

    # learning bar: held-in CER ~0, held-out dev CER low (the chord corpus
    # makes every token acoustically unique, so a model that has learned the
    # token acoustics — not just memorized sequences — decodes unseen orders)
    tok = Tokenizer(tokens=[f"syl{i}" for i in range(VOCAB - 6)])
    r_train = evaluate_offline(model, res.state.params, list(train_pipe.batches(0)),
                               cfg, tok, mode="rnnt_greedy", n_steps=3, max_tokens=20)
    assert r_train.cer <= 0.02, r_train.cer
    r_dev = evaluate_offline(model, res.state.params, list(dev_pipe.batches(0)),
                             cfg, tok, mode="rnnt_greedy", n_steps=3, max_tokens=20)
    assert r_dev.cer <= 0.15, r_dev.cer

    # plateau actually fires: resume with the tracker pinned to an
    # unbeatable best, patience 1 -> the second non-improving epoch decays
    # lr_scale by factor 0.5 and the loop writes it into the train state
    cfg.optim.plateau_patience = 1
    res2 = train_loop(cfg, model, res.state, train_pipe, dev_pipe, epochs=3,
                      plateau_init={"best": 0.0, "bad_epochs": 0, "scale": 1.0})
    assert float(res2.state.lr_scale) == pytest.approx(0.5), float(res2.state.lr_scale)

    batch = first
    # res.state was donated into the plateau-check loop; res2 holds the live
    # buffers (3 extra epochs at decayed lr on the already-converged model)
    return cfg, model, res2.state.params, batch


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
