"""Hybrid CTC+AED model tests: loss forward, label smoothing parity with
torch KLDivLoss semantics, attention rescoring selects the reference-scored
hypothesis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tpuasr.config import EncoderConfig
from tpuasr.decode.ctc_prefix_beam import ctc_prefix_beam_search
from tpuasr.models.asr_model import AEDConfig, ASRModel, attention_rescoring
from tpuasr.nn.decoder import label_smoothing_loss

VOCAB = 24


def _cfg():
    return AEDConfig(
        vocab_size=VOCAB,
        encoder=EncoderConfig(
            output_size=32, attention_heads=2, linear_units=64, num_blocks=2,
            cnn_module_kernel=7, dropout_rate=0.0, positional_dropout_rate=0.0,
        ),
        decoder_blocks=2, decoder_heads=2, decoder_ffn=64,
    )


@pytest.fixture(scope="module")
def aed():
    cfg = _cfg()
    model = ASRModel(cfg)
    feats = np.zeros((2, 67, 80), np.float32)
    params = model.init(
        jax.random.PRNGKey(0), feats, np.array([67, 50], np.int32),
        np.full((2, 5), 7, np.int32), np.array([5, 3], np.int32),
    )
    return model, params, cfg


def test_aed_loss_forward(aed, rng):
    model, params, cfg = aed
    feats = rng.standard_normal((2, 67, 80)).astype(np.float32)
    out = model.apply(params, feats, np.array([67, 50], np.int32),
                      rng.integers(6, VOCAB, (2, 5)).astype(np.int32),
                      np.array([5, 3], np.int32))
    assert np.isfinite(float(out["loss"]))
    np.testing.assert_allclose(
        float(out["loss"]),
        0.3 * float(out["loss_ctc"]) + 0.7 * float(out["loss_att"]),
        rtol=1e-6,
    )


def test_label_smoothing_matches_torch(rng):
    b, l, v = 2, 6, 10
    logits = rng.standard_normal((b, l, v)).astype(np.float32)
    targets = rng.integers(0, v, (b, l)).astype(np.int32)
    lengths = np.array([6, 4], np.int32)

    got = float(label_smoothing_loss(jnp.asarray(logits), targets, lengths, 0.1))

    # torch reference: KLDiv(log_softmax, smoothed one-hot), sum over valid,
    # normalized by batch (wenet normalize_length=False)
    lp = torch.log_softmax(torch.from_numpy(logits), dim=-1)
    conf, low = 0.9, 0.1 / (v - 1)
    true = torch.full((b, l, v), low)
    true.scatter_(2, torch.from_numpy(targets)[..., None].long(), conf)
    kl = torch.nn.functional.kl_div(lp, true, reduction="none").sum(-1)
    mask = torch.arange(l)[None, :] < torch.from_numpy(lengths)[:, None]
    ref = float((kl * mask).sum() / b)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_attention_rescoring_runs(aed, rng):
    model, params, cfg = aed
    feats = rng.standard_normal((2, 67, 80)).astype(np.float32)
    enc, enc_lens = model.apply(params, feats, np.array([67, 50], np.int32),
                                method="encode")
    ctc_logits = model.apply(params, enc, method="ctc_logits")
    lp = jax.nn.log_softmax(ctc_logits.astype(jnp.float32), axis=-1)
    _, _, (nb_tok, nb_len, nb_score) = ctc_prefix_beam_search(
        lp, enc_lens, cfg.blank_id, beam_size=4, max_tokens=16
    )
    tokens, lens, total = attention_rescoring(
        model, params, enc, enc_lens, nb_tok, nb_len, nb_score, ctc_weight=0.5
    )
    assert tokens.shape == (2, 16)
    best = np.argmax(np.asarray(total), axis=1)
    for b in range(2):
        np.testing.assert_array_equal(
            np.asarray(tokens[b]), np.asarray(nb_tok[b, best[b]])
        )


def test_one_step_matches_teacher_forced(aed, rng):
    """Chained forward_one_step must reproduce the teacher-forced logits."""
    model, params, cfg = aed
    feats = rng.standard_normal((2, 67, 80)).astype(np.float32)
    enc, enc_lens = model.apply(params, feats, np.array([67, 50], np.int32),
                                method="encode")
    ys_in = rng.integers(2, VOCAB, (2, 5)).astype(np.int32)
    ys_lens = np.array([5, 5], np.int32)
    full = model.apply(params, enc, enc_lens, ys_in, ys_lens,
                       method="decoder_scores")
    full_lp = np.asarray(jax.nn.log_softmax(np.asarray(full, np.float32), -1))

    mem_k, mem_v = model.apply(params, enc, method="decoder_project_memory")
    kc, vc = model.apply(params, 2, 8, method="decoder_init_cache")
    t = enc.shape[1]
    mem_mask = (np.arange(t)[None, :] < np.asarray(enc_lens)[:, None])[:, None, :]
    for pos in range(5):
        lp, kc, vc = model.apply(params, ys_in[:, pos], jnp.int32(pos), kc, vc,
                                 mem_k, mem_v, mem_mask, method="decoder_one_step")
        np.testing.assert_allclose(np.asarray(lp), full_lp[:, pos], rtol=1e-4,
                                   atol=1e-4)


def test_attention_beam_search_runs(aed, rng):
    from tpuasr.decode.attention_beam import attention_beam_search

    model, params, cfg = aed
    feats = rng.standard_normal((2, 67, 80)).astype(np.float32)
    enc, enc_lens = model.apply(params, feats, np.array([67, 50], np.int32),
                                method="encode")
    toks, lens, scores = attention_beam_search(
        model, params, enc, enc_lens, cfg.sos_id, cfg.eos_id,
        beam_size=3, max_len=10,
    )
    assert toks.shape == (2, 10)
    assert np.all(np.asarray(lens) <= 10)
    assert np.all(np.isfinite(np.asarray(scores)[:, 0]))
    for b in range(2):
        hyp = np.asarray(toks[b, : int(lens[b])])
        assert cfg.eos_id not in hyp and cfg.sos_id not in hyp


def test_decode_dispatch_all_methods(aed, rng):
    from tpuasr.decode.dispatch import decode_aed

    model, params, cfg = aed
    feats = rng.standard_normal((2, 67, 80)).astype(np.float32)
    feat_lens = np.array([67, 50], np.int32)
    res = decode_aed(
        model, params, feats, feat_lens,
        methods=["ctc_greedy_search", "ctc_prefix_beam_search", "attention",
                 "attention_rescoring"],
        beam_size=3, max_tokens=12,
    )
    assert set(res) == {"ctc_greedy_search", "ctc_prefix_beam_search",
                        "attention", "attention_rescoring"}
    for method, (tok, lens) in res.items():
        assert tok.shape[0] == 2, method
        assert np.all(np.asarray(lens) >= 0), method


def test_bidirectional_decoder_and_rescoring(rng):
    import dataclasses

    cfg = dataclasses.replace(_cfg(), r_decoder_blocks=2, reverse_weight=0.3)
    model = ASRModel(cfg)
    feats = rng.standard_normal((2, 67, 80)).astype(np.float32)
    feat_lens = np.array([67, 50], np.int32)
    texts = rng.integers(6, VOCAB, (2, 5)).astype(np.int32)
    text_lens = np.array([5, 3], np.int32)
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens, texts, text_lens)
    out = model.apply(params, feats, feat_lens, texts, text_lens)
    assert np.isfinite(float(out["loss"]))

    enc, enc_lens = model.apply(params, feats, feat_lens, method="encode")
    lp = jax.nn.log_softmax(model.apply(params, enc, method="ctc_logits").astype(np.float32), -1)
    _, _, (nb_tok, nb_len, nb_score) = ctc_prefix_beam_search(lp, enc_lens, cfg.blank_id, 3, 12)
    tok, lens, total = attention_rescoring(
        model, params, enc, enc_lens, nb_tok, nb_len, nb_score,
        ctc_weight=0.5, reverse_weight=0.3,
    )
    assert tok.shape == (2, 12)
    assert np.all(np.isfinite(np.asarray(total)[:, 0]))


def test_filter_blank_embedding_matches_loop(rng):
    """Stable-partition gather must equal the reference's per-utterance
    index-select + re-pad (wenet asr_model.py:149-175)."""
    from tpuasr.models.asr_model import filter_blank_embedding

    b, t, d, v, blank = 3, 11, 4, 7, 5
    lp = rng.standard_normal((b, t, v)).astype(np.float32)
    enc = rng.standard_normal((b, t, d)).astype(np.float32)
    lens = np.array([11, 8, 5], np.int32)

    out, out_lens = filter_blank_embedding(
        jnp.asarray(lp), jnp.asarray(enc), jnp.asarray(lens), blank
    )
    out, out_lens = np.asarray(out), np.asarray(out_lens)

    top1 = lp.argmax(-1)
    for i in range(b):
        keep = [j for j in range(lens[i]) if top1[i, j] != blank]
        assert out_lens[i] == len(keep)
        np.testing.assert_array_equal(out[i, : len(keep)], enc[i, keep])
        np.testing.assert_array_equal(out[i, len(keep):], 0.0)


def test_th_accuracy_value():
    from tpuasr.models.asr_model import th_accuracy

    logits = np.full((2, 3, 4), -1.0, np.float32)
    logits[0, 0, 2] = 1.0  # correct
    logits[0, 1, 0] = 1.0  # wrong
    logits[1, 0, 1] = 1.0  # correct
    logits[1, 1, 3] = 1.0  # beyond lens[1]=1: ignored
    targets = np.array([[2, 3, 0], [1, 0, 0]], np.int32)
    lens = np.array([2, 1], np.int32)
    acc = float(th_accuracy(jnp.asarray(logits), targets, lens))
    np.testing.assert_allclose(acc, 2.0 / 3.0, rtol=1e-6)


def test_apply_non_blank_embedding_trains_and_decodes(rng):
    import dataclasses

    from tpuasr.decode.dispatch import decode_aed

    cfg = dataclasses.replace(_cfg(), apply_non_blank_embedding=True)
    model = ASRModel(cfg)
    feats = rng.standard_normal((2, 67, 80)).astype(np.float32)
    feat_lens = np.array([67, 50], np.int32)
    texts = rng.integers(6, VOCAB, (2, 5)).astype(np.int32)
    text_lens = np.array([5, 3], np.int32)
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens, texts, text_lens)

    def loss_fn(p):
        return model.apply(p, feats, feat_lens, texts, text_lens)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree.reduce(
        lambda a, x: a + float(np.sum(np.square(x))), grads, 0.0
    )
    assert np.isfinite(gnorm) and gnorm > 0.0
    out = model.apply(params, feats, feat_lens, texts, text_lens)
    assert 0.0 <= float(out["th_accuracy"]) <= 1.0

    res = decode_aed(model, params, feats, feat_lens,
                     methods=["attention_rescoring"], beam_size=3, max_tokens=12)
    tok, lens = res["attention_rescoring"]
    assert tok.shape[0] == 2 and np.all(np.asarray(lens) >= 0)


def test_reverse_padded():
    from tpuasr.models.asr_model import _reverse_padded

    t = np.array([[1, 2, 3, 0, 0], [7, 8, 9, 9, 0]], np.int32)
    lens = np.array([3, 4], np.int32)
    out = np.asarray(_reverse_padded(jnp.asarray(t), jnp.asarray(lens)))
    assert out[0].tolist() == [3, 2, 1, 0, 0]
    assert out[1].tolist() == [9, 9, 8, 7, 0]


def test_decode_dispatch_return_times(aed, rng):
    """return_times adds per-token frame indices to the CTC-derived methods
    (greedy emission frames; beam/rescoring viterbi peak frames)."""
    from tpuasr.decode.dispatch import decode_aed

    model, params, cfg = aed
    feats = rng.standard_normal((2, 67, 80)).astype(np.float32)
    feat_lens = np.array([67, 50], np.int32)
    res = decode_aed(
        model, params, feats, feat_lens,
        methods=["ctc_greedy_search", "ctc_prefix_beam_search",
                 "attention_rescoring"],
        beam_size=3, max_tokens=12, return_times=True,
    )
    for method, out in res.items():
        tok, lens, times = out
        tok, lens, times = np.asarray(tok), np.asarray(lens), np.asarray(times)
        for b in range(2):
            tt = times[b, : lens[b]]
            assert np.all(tt >= 0) and np.all(tt < 67), (method, tt)
            assert np.all(np.diff(tt) >= 0), (method, tt)  # monotone frames


def test_attention_rescoring_confidence(aed, rng):
    """return_confidence yields exp(att/(len+1)) in (0,1] and per-token
    probabilities over the valid positions (wenet search.py:420-440)."""
    model, params, cfg = aed
    feats = rng.standard_normal((2, 67, 80)).astype(np.float32)
    enc, enc_lens = model.apply(params, feats, np.array([67, 50], np.int32),
                                method="encode")
    lp = jax.nn.log_softmax(
        model.apply(params, enc, method="ctc_logits").astype(np.float32), -1)
    _, _, (nb_tok, nb_len, nb_score) = ctc_prefix_beam_search(
        lp, enc_lens, cfg.blank_id, 3, 12)
    tok, lens, total, conf, tok_conf = attention_rescoring(
        model, params, enc, enc_lens, nb_tok, nb_len, nb_score,
        ctc_weight=0.5, return_confidence=True)
    conf, tok_conf = np.asarray(conf), np.asarray(tok_conf)
    assert np.all(conf > 0.0) and np.all(conf <= 1.0 + 1e-6)
    for b in range(2):
        L = int(lens[b])
        assert np.all(tok_conf[b, :L] > 0.0) and np.all(tok_conf[b, :L] <= 1.0 + 1e-6)
        np.testing.assert_array_equal(tok_conf[b, L:], 0.0)
