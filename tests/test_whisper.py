"""Whisper-style AED: prompt grammar, teacher-forced loss, prompt-conditioned
greedy decode (wenet/whisper/whisper.py:28-93 + common.py:159-230 parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.config import EncoderConfig
from tpuasr.models.whisper import (
    PROMPT_LEN,
    TASK_TRANSCRIBE,
    TASK_TRANSLATE,
    TASK_VAD,
    WhisperConfig,
    WhisperModel,
    whisper_greedy_decode,
)

VOCAB = 40


def tiny_cfg():
    return WhisperConfig(
        vocab_size=VOCAB,
        decoder_blocks=2,
        decoder_heads=2,
        decoder_ffn=64,
        encoder=EncoderConfig(
            output_size=32, attention_heads=2, linear_units=64, num_blocks=2,
            cnn_module_kernel=7, dropout_rate=0.0, positional_dropout_rate=0.0,
        ),
    )


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_cfg()
    model = WhisperModel(cfg)
    b, t, u = 2, 67, 5
    feats = np.zeros((b, t, 80), np.float32)
    params = model.init(
        jax.random.PRNGKey(0), feats, np.full((b,), t, np.int32),
        np.full((b, u), 12, np.int32), np.full((b,), u, np.int32),
    )
    return cfg, model, params


def test_prompt_grammar(model_and_params):
    cfg, model, params = model_and_params
    sp = cfg.special
    langs = jnp.array([0, 1, 0], jnp.int32)
    tasks = jnp.array([TASK_TRANSCRIBE, TASK_TRANSLATE, TASK_VAD], jnp.int32)
    prompt = np.asarray(model.apply(params, langs, tasks, method="prompt_tokens"))
    np.testing.assert_array_equal(
        prompt[0], [sp.sot, sp.lang_base + 0, sp.transcribe, sp.no_timestamps])
    np.testing.assert_array_equal(
        prompt[1], [sp.sot, sp.lang_base + 1, sp.translate, sp.no_timestamps])
    np.testing.assert_array_equal(
        prompt[2], [sp.sot, sp.lang_base + 0, sp.no_speech, sp.no_speech])


def test_loss_and_grads(model_and_params):
    cfg, model, params = model_and_params
    b, t, u = 2, 67, 5
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((b, t, 80)).astype(np.float32)
    feat_lens = np.full((b,), t, np.int32)
    texts = rng.integers(12, 30, (b, u)).astype(np.int32)
    text_lens = np.array([5, 3], np.int32)
    langs = np.array([0, 1], np.int32)
    tasks = np.array([TASK_TRANSCRIBE, TASK_TRANSLATE], np.int32)

    def loss_fn(p):
        return model.apply(p, feats, feat_lens, texts, text_lens,
                           langs=langs, tasks=tasks)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = float(jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads))))
    assert gnorm > 0


def test_task_conditioning_changes_loss(model_and_params):
    """Different task prompts must change the teacher-forced distribution."""
    cfg, model, params = model_and_params
    b, t, u = 2, 67, 5
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((b, t, 80)).astype(np.float32)
    feat_lens = np.full((b,), t, np.int32)
    texts = rng.integers(12, 30, (b, u)).astype(np.int32)
    text_lens = np.full((b,), u, np.int32)

    def loss_for(task):
        return float(model.apply(
            params, feats, feat_lens, texts, text_lens,
            tasks=np.full((b,), task, np.int32))["loss"])

    assert loss_for(TASK_TRANSCRIBE) != loss_for(TASK_TRANSLATE)


def test_greedy_decode_runs_and_conditions(model_and_params):
    cfg, model, params = model_and_params
    b, t = 2, 67
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((b, t, 80)).astype(np.float32)
    feat_lens = np.full((b,), t, np.int32)
    enc, enc_lens = model.apply(params, feats, feat_lens, method="encode")

    langs = jnp.zeros((b,), jnp.int32)
    toks_a, lens_a = whisper_greedy_decode(
        model, params, enc, enc_lens, langs,
        jnp.full((b,), TASK_TRANSCRIBE, jnp.int32), max_tokens=8)
    assert toks_a.shape == (b, 8)
    assert np.all(np.asarray(lens_a) <= 8)
    # decode is deterministic given the same prompt
    toks_b, lens_b = whisper_greedy_decode(
        model, params, enc, enc_lens, langs,
        jnp.full((b,), TASK_TRANSCRIBE, jnp.int32), max_tokens=8)
    np.testing.assert_array_equal(np.asarray(toks_a), np.asarray(toks_b))


def test_overfit_one_batch():
    """A few steps of Adam on one batch reduce the whisper loss."""
    import optax

    cfg = tiny_cfg()
    model = WhisperModel(cfg)
    b, t, u = 2, 67, 4
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((b, t, 80)).astype(np.float32)
    feat_lens = np.full((b,), t, np.int32)
    texts = rng.integers(12, 30, (b, u)).astype(np.int32)
    text_lens = np.full((b,), u, np.int32)
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens, texts, text_lens)

    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            return model.apply(p, feats, feat_lens, texts, text_lens)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    first = last = None
    for _ in range(30):
        params, opt, loss = step(params, opt)
        first = float(loss) if first is None else first
        last = float(loss)
    assert last < first * 0.8, (first, last)


def test_beam_decode_prompt_conditioned(model_and_params):
    """whisper_beam_decode runs; beam-1 equals greedy (same argmax chain)."""
    from tpuasr.models.whisper import whisper_beam_decode

    cfg, model, params = model_and_params
    b, t = 2, 67
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((b, t, 80)).astype(np.float32)
    feat_lens = np.full((b,), t, np.int32)
    enc, enc_lens = model.apply(params, feats, feat_lens, method="encode")
    langs = jnp.zeros((b,), jnp.int32)
    tasks = jnp.full((b,), TASK_TRANSCRIBE, jnp.int32)

    g_tok, g_len = whisper_greedy_decode(
        model, params, enc, enc_lens, langs, tasks, max_tokens=8)
    b_tok, b_len, scores = whisper_beam_decode(
        model, params, enc, enc_lens, langs, tasks, beam_size=1, max_tokens=8)
    np.testing.assert_array_equal(np.asarray(g_len), np.asarray(b_len))
    for i in range(b):
        np.testing.assert_array_equal(
            np.asarray(g_tok[i, : int(g_len[i])]),
            np.asarray(b_tok[i, : int(b_len[i])]),
        )

    # wider beam: runs, finite scores, task conditioning changes the result
    b4_tok, b4_len, scores4 = whisper_beam_decode(
        model, params, enc, enc_lens, langs, tasks, beam_size=4, max_tokens=8,
        length_penalty=0.5)
    assert np.all(np.isfinite(np.asarray(scores4)[:, 0]))
