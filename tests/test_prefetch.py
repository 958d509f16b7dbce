"""Device prefetch + wire-format + per-bucket batch sizing + RSS watchdog.

These are the round-5 end-to-end throughput mechanisms (VERDICT r4 next#1/#7):
the train loop's batches arrive via a background-thread prefetcher, waves may
travel as int16, short buckets get audio-frame-budgeted batch sizes, and long
runs survive the tunnel client's host leak by checkpoint-and-exec-restart.
"""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from tpuasr.config import Config, FeatureConfig
from tpuasr.data.pipeline import LengthBucketPipeline, Utterance
from tpuasr.data.prefetch import prefetch_to_device, wire_waves

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _utts(n, rng, min_len=1000, max_len=9000):
    out = []
    for i in range(n):
        ln = int(rng.integers(min_len, max_len))
        ntok = int(rng.integers(2, 9))
        out.append(Utterance.from_arrays(
            f"u{i:04d}", rng.standard_normal(ln).astype(np.float32) * 0.3,
            rng.integers(1, 50, ntok).tolist(),
        ))
    return out


def test_wire_int16_round_trip(rng):
    w = (rng.standard_normal(4096).astype(np.float32) * 0.5).clip(-1, 1)
    enc = wire_waves(w[None], "int16")
    assert enc.dtype == np.int16
    dec = enc.astype(np.float32) / 32768.0
    # 0.5 LSB rounding, except +1.0 which clips to 32767 (1 LSB)
    assert np.max(np.abs(dec - w[None])) <= 1.0 / 32768.0 + 1e-7
    # float32 passes through untouched
    w2 = w[None]
    assert wire_waves(w2, "float32") is w2
    with pytest.raises(ValueError):
        wire_waves(w[None], "int8")


def test_fbank_batch_accepts_int16(rng):
    from tpuasr.audio import fbank_batch

    cfg = FeatureConfig()
    w = (rng.standard_normal((2, 4096)).astype(np.float32) * 0.5).clip(-1, 1)
    lens = np.array([4096, 3000], np.int32)
    ref, ref_lens = fbank_batch(w, lens, cfg)
    got, got_lens = fbank_batch(wire_waves(w, "int16"), lens, cfg)
    assert np.array_equal(np.asarray(ref_lens), np.asarray(got_lens))
    # -90 dB quantization noise -> log-mel features match closely
    assert np.max(np.abs(np.asarray(ref) - np.asarray(got))) < 0.2


def test_prefetch_matches_sync_order(rng):
    pipe = LengthBucketPipeline(
        _utts(24, rng), batch_size=4, frame_buckets=(8, 12, 16, 20),
        token_buckets=(4, 8, 12), hop_length=512, seed=3,
    )
    sync = [(a, {k: np.asarray(v) for k, v in d.items()})
            for a, d in prefetch_to_device(pipe.batches(0), depth=0,
                                           sample_rate=16000)]
    pre = [(a, {k: np.asarray(v) for k, v in d.items()})
           for a, d in prefetch_to_device(pipe.batches(0), depth=3,
                                          sample_rate=16000)]
    assert len(sync) == len(pre) > 0
    for (a1, d1), (a2, d2) in zip(sync, pre):
        assert a1 == a2
        for k in d1:
            assert np.array_equal(d1[k], d2[k]), k


def test_prefetch_propagates_producer_error():
    def bad_iter():
        yield {"waves": np.zeros((1, 100), np.float32),
               "wave_lens": np.array([100], np.int32)}
        raise RuntimeError("boom")

    it = prefetch_to_device(bad_iter(), depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_batch_audio_frames_sizing(rng):
    pipe = LengthBucketPipeline(
        _utts(64, rng), batch_size=4, frame_buckets=(8, 16), token_buckets=(12,),
        hop_length=512, seed=3, batch_audio_frames=64, batch_multiple=2,
    )
    # 8-frame bucket -> 64//8 = 8 per batch; 16-frame -> 64//16 = 4
    assert pipe.batch_size_for((8 - 1) * 512) == 8
    assert pipe.batch_size_for((16 - 1) * 512) == 4
    for batch in pipe.batches(0):
        frames = 1 + batch["waves"].shape[1] // 512
        assert batch["waves"].shape[0] == {8: 8, 16: 4}[frames]
    # multiple rounding: budget 60 over 16-frame bucket = 3 -> rounds to 2
    pipe.batch_audio_frames = 60
    assert pipe.batch_size_for((16 - 1) * 512) == 2


def test_watchdog_restart_hook_called(rng, tmp_path):
    """train_loop calls the restart hook when RSS crosses max_rss_gb at an
    epoch boundary (any real process exceeds a 1 MB cap) and stops cleanly
    when the hook returns."""
    from tpuasr.data.corpus import synthetic_pipeline
    from tpuasr.models import Transducer
    from tpuasr.train import TrainState, make_optimizer
    from tpuasr.train.loop import train_loop

    cfg = Config()
    cfg.model.vocab_size = 32
    cfg.model.encoder.num_blocks = 1
    cfg.model.encoder.output_size = 16
    cfg.model.encoder.attention_heads = 2
    cfg.model.encoder.linear_units = 32
    cfg.model.predictor.embed_size = 16
    cfg.model.predictor.hidden_size = 16
    cfg.model.predictor.output_size = 16
    cfg.model.joint.join_dim = 16
    cfg.feature.sample_rate = 16000
    cfg.data.batch_size = 4
    cfg.data.synth_max_tokens = 5
    cfg.train.save_dir = str(tmp_path / "run")
    cfg.train.log_dir = ""
    cfg.train.max_rss_gb = 0.001
    cfg.train.epochs = 3

    pipe = synthetic_pipeline(cfg, 8, seed=0)
    model = Transducer(cfg.model)
    first = next(iter(pipe.batches(0)))
    feats_t = 1 + first["waves"].shape[1] // cfg.feature.hop_length
    b = first["waves"].shape[0]
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((b, feats_t, 80), np.float32),
        np.full((b,), feats_t, np.int32), first["texts"], first["text_lens"],
    )
    state = TrainState.create(params, make_optimizer(cfg.optim))

    fired = []
    res = train_loop(cfg, model, state, pipe, dev_pipeline=pipe,
                     restart_hook=lambda epoch: fired.append(epoch))
    assert fired == [0]          # fired at the first epoch boundary ...
    assert len(res.train_losses) == 1  # ... and the loop stopped there
    log = open(os.path.join(cfg.train.save_dir, "log.txt")).read()
    assert "max_rss_gb" in log and "restarting" in log


@pytest.mark.slow
def test_watchdog_exec_restart_subprocess(tmp_path):
    """Full self-restart through tools/train.py: a 1 MB RSS cap trips the
    watchdog after epoch 0; the process exec-restarts itself with --resume
    and finishes the remaining epoch (VERDICT r4 next#7 done-criterion)."""
    save = tmp_path / "run"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("TPUASR_RESTART_EPOCH", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "--workload", "rnnt", "--synthetic", "8", "--epochs", "2",
         "--set", "data.batch_size=4", f"train.save_dir={save}",
         "train.log_dir=", "train.max_rss_gb=0.001",
         "model.encoder.num_blocks=1", "model.encoder.output_size=16",
         "model.encoder.attention_heads=2", "model.encoder.linear_units=32",
         "model.predictor.embed_size=16", "model.predictor.hidden_size=16",
         "model.predictor.output_size=16", "model.joint.join_dim=16",
         "model.vocab_size=32", "data.synth_max_tokens=5",
         "feature.sample_rate=16000"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    log = open(os.path.join(save, "log.txt")).read()
    assert "restarting" in log                      # watchdog fired
    assert "epoch 1 train_loss" in log              # finished after restart
    assert "resumed from" in out.stdout             # exec went through --resume
