"""Decode-quality regression gates pinned to the round-4 campaign checkpoint.

VERDICT r3 #6: freeze the converged flagship checkpoint's held-out CER into
slow-marked tests so kernel/optimizer/layout changes that silently hurt
quality fail CI rather than only perf. The checkpoint
(exp/campaign/epoch_0049 — 50-epoch causal streaming RNN-T campaign,
docs/RESULTS.md "Training campaign") lives on the build machine, not in git
(309 MB with optimizer state); the gates skip where it is absent.

Pinned sweep numbers (512 held-out utterances, exp/campaign/eval_sweep.log):
ctc_greedy 0.02% CER. The gates decode a 32-utterance subset of the same
seed-1 held-out generator on the CPU mesh, so bands are set well above the
sweep values but far below any broken-model regime (a damaged checkpoint or
decode path lands at >50% CER).
"""

import os

import numpy as np
import pytest

CKPT = "exp/campaign/epoch_0049"
N_UTTS = 32


def _load():
    if not os.path.isdir(CKPT):
        pytest.skip(f"{CKPT} not on this machine (campaign artifacts are "
                    "not in git)")
    import jax

    from tools.train import build_model
    from tpuasr.config import load_yaml, override
    from tpuasr.data.corpus import synthetic_pipeline
    from tpuasr.text import Tokenizer
    from tpuasr.train import TrainState, make_optimizer
    from tpuasr.train.checkpoint import (
        find_effective_config, restore_checkpoint_migrating,
    )

    cfg_path = find_effective_config(CKPT)
    assert cfg_path, "campaign train.yaml missing next to the checkpoint"
    cfg = load_yaml(cfg_path)
    # CPU CI: fp32 + unfused (Pallas interpret mode would dominate runtime;
    # fused-vs-unfused exactness is pinned in test_fused_attention /
    # test_rnnt_fused). scan_layers stays as trained — the checkpoint is in
    # the scanned layout.
    cfg = override(cfg, {
        "model.compute_dtype": "float32",
        "model.fused_joint_loss": False,
        "model.encoder.fused_attention": False,
    })

    tokenizer = Tokenizer(tokens=[f"syl{i}" for i in range(cfg.model.vocab_size - 6)])
    pipe = synthetic_pipeline(cfg, N_UTTS, seed=1)  # held-out split generator

    model = build_model(cfg, "online_rnnt")
    first = next(iter(pipe.batches(0)))
    feats_t = 1 + first["waves"].shape[1] // cfg.feature.hop_length
    b = first["waves"].shape[0]
    params0 = model.init(
        jax.random.PRNGKey(0),
        np.zeros((b, feats_t, 80), np.float32), np.full((b,), feats_t, np.int32),
        first["texts"], first["text_lens"])
    tx = make_optimizer(cfg.optim)
    state = restore_checkpoint_migrating(
        CKPT, TrainState.create(params0, tx), cfg.model.encoder.num_blocks)
    return cfg, model, state, pipe, tokenizer


@pytest.mark.slow
@pytest.mark.parametrize("mode,band", [
    ("ctc_greedy", 0.01),   # sweep: 0.02% on 512 utts
    ("rnnt_greedy", 0.02),  # sweep: see eval_sweep.log
])
def test_campaign_ckpt_dev_cer(mode, band):
    from tpuasr.eval import evaluate_offline

    cfg, model, state, pipe, tokenizer = _load()
    res = evaluate_offline(model, state.params, pipe.batches(0), cfg, tokenizer,
                           mode=mode)
    assert res.counts.cer <= band, (
        f"{mode} held-out CER {100 * res.counts.cer:.2f}% exceeds the "
        f"campaign gate {100 * band:.1f}% — a decode/kernel/optimizer change "
        f"has regressed model quality (docs/RESULTS.md campaign table)")
