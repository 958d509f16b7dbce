"""CLI workload coverage: the aed (hybrid CTC+attention) and paraformer
(NAR/CIF) model families train through the shared jit train step and decode
through evaluate_offline's mode dispatch — the tools/train.py +
tools/evaluate.py surfaces beyond the three course transducer workloads."""

import jax
import numpy as np
import pytest

from tools.train import build_model
from tpuasr.config import Config, EncoderConfig, FeatureConfig
from tpuasr.data.pipeline import BatchSpec, device_view, make_batch
from tpuasr.data.synthetic import synth_corpus
from tpuasr.eval.cer_eval import evaluate_offline
from tpuasr.text import Tokenizer
from tpuasr.train import TrainState, make_optimizer, make_train_step

VOCAB = 30


def tiny_cfg():
    cfg = Config()
    cfg.feature = FeatureConfig(sample_rate=16000, use_pallas=False)
    cfg.model.vocab_size = VOCAB
    cfg.model.encoder = EncoderConfig(
        output_size=32, attention_heads=2, linear_units=64, num_blocks=2,
        cnn_module_kernel=7, dropout_rate=0.1, positional_dropout_rate=0.0,
    )
    cfg.model.att_decoder.blocks = 2
    cfg.model.att_decoder.heads = 2
    cfg.model.att_decoder.ffn = 64
    cfg.optim.warmup_steps = 5
    return cfg


def synth(cfg, n=4):
    utts = synth_corpus(n, VOCAB, seed=3, min_tokens=2, max_tokens=4,
                        samples_per_token=4096,
                        sample_rate=cfg.feature.sample_rate)
    return device_view(make_batch(utts, BatchSpec(n, 24 * 512, 6)))


@pytest.mark.parametrize("workload", ["aed", "paraformer"])
def test_workload_trains_through_shared_step(workload):
    cfg = tiny_cfg()
    model = build_model(cfg, workload)
    batch = synth(cfg)
    feats_t = 1 + batch["waves"].shape[1] // cfg.feature.hop_length
    b = batch["waves"].shape[0]
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((b, feats_t, 80), np.float32), np.full((b,), feats_t, np.int32),
        batch["texts"], batch["text_lens"],
    )
    tx = make_optimizer(cfg.optim)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, cfg, donate=False)
    losses = []
    for _ in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert int(state.step) == 2 and int(state.skipped) == 0
    if workload == "aed":
        assert 0.0 <= float(metrics["th_accuracy"]) <= 1.0


def _tok():
    return Tokenizer(tokens=[f"syl{i}" for i in range(VOCAB - 6)])


def test_evaluate_offline_aed_modes():
    cfg = tiny_cfg()
    model = build_model(cfg, "aed")
    batch = synth(cfg)
    feats_t = 1 + batch["waves"].shape[1] // cfg.feature.hop_length
    b = batch["waves"].shape[0]
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((b, feats_t, 80), np.float32), np.full((b,), feats_t, np.int32),
        batch["texts"], batch["text_lens"],
    )
    for mode in ("ctc_greedy", "ctc_prefix_beam", "attention",
                 "attention_rescoring"):
        res = evaluate_offline(model, params, [batch], cfg, _tok(),
                               mode=mode, beam_size=2, max_tokens=8)
        assert res.counts.ref_len > 0, mode
        assert 0.0 <= res.cer, mode


def test_evaluate_offline_paraformer_modes():
    cfg = tiny_cfg()
    model = build_model(cfg, "paraformer")
    batch = synth(cfg)
    feats_t = 1 + batch["waves"].shape[1] // cfg.feature.hop_length
    b = batch["waves"].shape[0]
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((b, feats_t, 80), np.float32), np.full((b,), feats_t, np.int32),
        batch["texts"], batch["text_lens"],
    )
    for mode in ("paraformer_greedy", "paraformer_beam"):
        res = evaluate_offline(model, params, [batch], cfg, _tok(),
                               mode=mode, beam_size=2)
        assert res.counts.ref_len > 0, mode
